"""S10 AIDA-YAGO CoNLL scan: hand-computed parity with the reference's
sequential parser semantics (ClusteringHelper.py:13-114), including its
quirks (char spans cover only the B token; word counter advances on I rows;
--NME-- clears mention/entity/tag)."""

import pytest

from incremental_entity_extraction_spark.operators.conll import (
    conll_to_transcripts,
    read_aida_yago_conll,
    reconstruct_texts,
)

SAMPLE = """-DOCSTART- (1 testa)
EU\tB\tEU\t--NME--
rejects
German\tB\tGerman\tGermany\thttp://en.wikipedia.org/wiki/Germany\t11867\t/m/0345h
call
to
boycott
British\tB\tBritish\tUnited_Kingdom\thttp://en.wikipedia.org/wiki/United_Kingdom\t31717\t/m/07ssc
lamb
.
-DOCSTART- (2 testa)
Peter\tB\tPeter Blackburn\t--NME--
Blackburn\tI
BRUSSELS\tB\tBRUSSELS\tBrussels\thttp://en.wikipedia.org/wiki/Brussels\t3708\t/m/0177z
1996-08-22
"""


@pytest.fixture(scope="module")
def spans(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("conll") / "aida.conll"
    p.write_text(SAMPLE)
    return (
        read_aida_yago_conll(spark, str(p))
        .toPandas()
        .sort_values(["doc_id", "word_index"])
        .reset_index(drop=True)
    )


def test_span_merge_and_counters(spans):
    d1 = spans[spans.doc_id == 1].reset_index(drop=True)
    # B/I merge: "Peter" + "Blackburn" -> one span with the merged token
    assert list(d1["token"]) == ["Peter Blackburn", "BRUSSELS", "1996-08-22"]
    # reference quirk: char span covers only the B token ("Peter" = 5 chars),
    # and the char counter advances by len(B token)+1, not the merged length
    assert list(d1["start"]) == [0, 6, 15]
    assert list(d1["end"]) == [5, 14, 25]
    # word counter advances on the I row too: BRUSSELS is word 2, not 1
    assert list(d1["word_index"]) == [0, 2, 3]


def test_annotations_and_nme_clearing(spans):
    d0 = spans[spans.doc_id == 0].reset_index(drop=True)
    assert list(d0["token"]) == [
        "EU", "rejects", "German", "call", "to", "boycott", "British", "lamb", ".",
    ]
    german = d0[d0.token == "German"].iloc[0]
    assert german["entity"] == "Germany"
    assert german["numeric_code"] == "11867"
    assert german["tag"] == "B"
    assert german["start"] == 11 and german["end"] == 17
    # --NME-- spans keep the row but lose mention/entity/tag
    eu = d0[d0.token == "EU"].iloc[0]
    assert eu["mention"] == "" and eu["entity"] == "" and eu["tag"] == ""
    # bare tokens carry no annotations
    rejects = d0[d0.token == "rejects"].iloc[0]
    assert rejects["mention"] == "" and rejects["start"] == 3 and rejects["end"] == 10


def test_text_reconstruction_and_bridge(spark, spans, tmp_path_factory):
    p = tmp_path_factory.mktemp("conll2") / "aida.conll"
    p.write_text(SAMPLE)
    sdf = read_aida_yago_conll(spark, str(p))
    texts = {
        r["doc_id"]: r["text"] for r in reconstruct_texts(sdf).collect()
    }
    assert texts[0] == "EU rejects German call to boycott British lamb ."
    assert texts[1] == "Peter Blackburn BRUSSELS 1996-08-22"
    t = conll_to_transcripts(sdf).toPandas().sort_values("conv_id")
    assert list(t["conv_id"]) == ["doc_0", "doc_1"]
    assert set(t.columns) >= {"conv_id", "turn_idx", "role", "text", "batch_id"}

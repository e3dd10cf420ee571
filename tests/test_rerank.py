"""M14 crossencoder-style rerank."""

from pyspark.sql import functions as F

from incremental_entity_extraction_spark.operators.fused import detect_encode_retrieve
from incremental_entity_extraction_spark.operators.rerank import rerank_crossencoder
from incremental_entity_extraction_spark.operators.retrieval import build_kb_shards


def test_rerank_keeps_gold_top1_and_is_deterministic(spark, spark_world, world, cfg):
    shards = build_kb_shards(spark_world["entities_kb"], 1)
    enriched = detect_encode_retrieve(spark_world["transcripts"], cfg, shards)
    r1 = rerank_crossencoder(enriched, cfg).toPandas().sort_values("mention_id")
    r2 = rerank_crossencoder(enriched, cfg).toPandas().sort_values("mention_id")

    # determinism: identical candidate id order across runs
    for a, b in zip(r1["candidates"], r2["candidates"]):
        assert [c["id"] for c in a] == [c["id"] for c in b]

    # every candidate gained a cross_score; list sorted by it desc
    for cands in r1["candidates"]:
        scores = [c["cross_score"] for c in cands]
        assert scores == sorted(scores, reverse=True)

    # in-KB gold mentions still rank their gold entity first after rerank
    gold = world.gold_mentions
    gold_map = {
        (r.conv_id, r.turn_idx, r.start_tok): (r.Wikipedia_ID, r.NIL)
        for r in gold.itertuples(index=False)
    }
    checked = hit = 0
    for row in r1.itertuples(index=False):
        key = (row.conv_id, row.turn_idx, row.start_tok)
        if key not in gold_map or len(row.candidates) == 0:
            continue
        wid, is_nil = gold_map[key]
        if is_nil:
            continue
        checked += 1
        hit += int(row.candidates[0]["wikipedia_id"] == wid)
    assert checked > 0
    assert hit / checked >= 0.99

"""Deterministic mention detection kernel (M1) shared by oracle and Spark.

The reference detects mentions with a Flair NER model
(pipeline/biencoder/blink/ner.py:29-42); weights are an external download,
so this engine's detector contract is: given a turn's token stream, emit
``(start_tok, n_tokens, surface)`` spans.  The shipped implementation marks
maximal runs of out-of-vocabulary tokens (tokens absent from the known
filler/stopword vocabulary) and splits runs into 2-token mentions — the
same output contract (mention + offsets) as the reference NER.
"""

from __future__ import annotations

from incremental_entity_extraction_spark.fixtures.generator import FILLER_WORDS

FILLER_SET = frozenset(FILLER_WORDS)


def detect_mentions_in_tokens(tokens: list[str], known: frozenset[str] = FILLER_SET):
    """Return [(start_tok, n_tokens, surface)] for maximal OOV runs, split
    into 2-token mentions (a trailing odd token becomes a 1-token mention)."""
    out = []
    i, n = 0, len(tokens)
    while i < n:
        if tokens[i] in known or not tokens[i]:
            i += 1
            continue
        j = i
        while j < n and tokens[j] not in known and tokens[j]:
            j += 1
        k = i
        while k < j:
            width = 2 if k + 1 < j else 1
            out.append((k, width, " ".join(tokens[k : k + width])))
            k += width
        i = j
    return out

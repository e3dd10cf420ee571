"""E8 — oracle modes: per-stage isolation harness.

Reference: ``--correct-steps`` forces each upstream stage to be perfect so
the downstream stage can be evaluated in isolation (scripts/eval_kbp.py:
438-471,541-542,609-623), and ``--prepare-for-nil-pred`` dumps NIL features
for model training (eval_kbp.py:417-425).

Spark equivalents (column transforms over the enriched mention table +
gold):

* ``correct_candidates``  — reorder each candidate list so the gold entity
  (when retrieved at any rank) is first; mentions whose gold was not
  retrieved keep their list.  Evaluating NIL/clustering downstream of this
  isolates them from retrieval errors.
* ``correct_nil``         — overwrite ``is_nil`` with the adjusted gold
  flag.  Evaluating clustering downstream isolates it from NIL errors.
* ``nil_feature_dump``    — the training-features projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.config import PipelineConfig


def correct_candidates(with_gold: DataFrame) -> DataFrame:
    """Force the gold candidate (if present anywhere in the list) to rank 1,
    preserving the relative order of the rest (eval_kbp.py:438-471)."""
    gold_first = F.filter(
        "candidates", lambda c: c["wikipedia_id"] == F.col("gold_wikipedia_id")
    )
    rest = F.filter(
        "candidates", lambda c: c["wikipedia_id"] != F.col("gold_wikipedia_id")
    )
    return with_gold.withColumn(
        "candidates",
        F.when(F.size(gold_first) > 0, F.concat(gold_first, rest)).otherwise(
            F.col("candidates")
        ),
    )


def correct_nil(with_gold: DataFrame, prev_added: DataFrame | None = None) -> DataFrame:
    """Overwrite the NIL decision with adjusted gold (a gold-NIL entity
    already added to the RW KB in an earlier batch should be linked —
    eval_kbp.py:500)."""
    df = with_gold
    if prev_added is not None:
        pa = prev_added.select(
            F.col("batch_id").alias("pa_batch"),
            F.col("gold_wikipedia_id").alias("pa_wid"),
        )
        df = (
            df.join(
                pa,
                (df.gold_wikipedia_id == pa.pa_wid) & (pa.pa_batch < df.batch_id),
                "left",
            )
            .withColumn("is_nil", F.col("gold_nil") & F.col("pa_wid").isNull())
            .drop("pa_batch", "pa_wid")
            .dropDuplicates(["mention_id"])
        )
    else:
        df = df.withColumn("is_nil", F.col("gold_nil"))
    return df


def nil_feature_dump(nil_scored: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """``--prepare-for-nil-pred`` analogue: the feature table a NIL-model
    trainer consumes (deployed features + the string-similarity features
    the ablation study evaluates, eval_kbp.py:417-425 + M6)."""
    top_title = F.lower(F.coalesce(F.col("top_title"), F.lit("")))
    mention = F.lower(F.col("mention"))
    lev_sim = F.lit(1.0) - F.levenshtein(mention, top_title) / F.greatest(
        F.length(mention), F.length(top_title), F.lit(1)
    )
    toks = lambda c: F.filter(  # noqa: E731
        F.split(c, "[^a-z0-9]+"), lambda t: F.length(t) > 0
    )
    jac = F.size(F.array_intersect(toks(mention), toks(top_title))) / F.greatest(
        F.size(F.array_union(toks(mention), toks(top_title))), F.lit(1)
    )
    return nil_scored.select(
        "mention_id",
        "batch_id",
        "max_bi",
        "secondiff",
        lev_sim.alias("levenshtein_sim"),
        jac.cast("double").alias("jaccard_sim"),
        "nil_score",
        "is_nil",
    )

"""E1-E7 — evaluation operators (scripts/eval_kbp.py:396-415,498-539,569-718).

These reproduce the reference's per-batch report columns (README.md:236-277):
linking recall@k over not-NIL mentions, NIL confusion matrices (raw,
row-normalized, "mitigated"), clustering B³ precision/recall plus the
coreference triple MUC/B³/CEAF-e, and the overall accuracy decomposition.

Design: recall@k, the confusion matrices and B³ are distributed DataFrame
ops (joins + conditional aggregation — they must scale with the mention
count); MUC/CEAF-e run driver-side on the *collected cluster sets* (small
by construction — the reference computes them on in-memory dicts too,
eval_kbp.py:44-226), with Hungarian assignment from evaluation.assignment.

Gold input contract (fixtures §2): gold_mentions(conv_id, turn_idx,
start_tok, mention, Wikipedia_ID, NIL, batch_id); joined to pipeline output
on (conv_id, turn_idx, start_tok).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.config import PipelineConfig


def join_gold(nil_scored: DataFrame, gold: DataFrame) -> DataFrame:
    """Attach gold labels to pipeline mentions (inner: detector recall is
    evaluated separately in tests)."""
    g = gold.select(
        "conv_id", "turn_idx", "start_tok",
        F.col("Wikipedia_ID").alias("gold_wikipedia_id"),
        F.col("NIL").alias("gold_nil"),
    )
    return nil_scored.join(g, ["conv_id", "turn_idx", "start_tok"], "inner")


# --------------------------------------------------------------------------
# E1 — linking recall@k over not-NIL gold mentions (eval_kbp.py:396-415)
# --------------------------------------------------------------------------
def linking_recall_at_k(with_gold: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """One row per batch: recall@k columns (k in cfg.recall_ks) + support.

    rank-of-gold (W7) = 1-based position of the gold id in the candidate
    list; 0 when absent (eval_kbp.py:401-410)."""
    ranked = with_gold.filter(~F.col("gold_nil")).withColumn(
        "linking_found_at",
        F.array_position(
            F.col("candidates.wikipedia_id"), F.col("gold_wikipedia_id")
        ),
    )
    aggs = [
        F.avg(
            F.when(
                (F.col("linking_found_at") > 0) & (F.col("linking_found_at") <= k),
                F.lit(1.0),
            ).otherwise(F.lit(0.0))
        ).alias(f"recall_at_{k}")
        for k in cfg.recall_ks
    ]
    return ranked.groupBy("batch_id").agg(
        F.count("*").alias("n_not_nil"), *aggs
    ).orderBy("batch_id")


# --------------------------------------------------------------------------
# E2/E3 — NIL confusion matrices (eval_kbp.py:498-539)
# --------------------------------------------------------------------------
def nil_confusion(with_gold: DataFrame, prev_added: DataFrame | None = None) -> DataFrame:
    """Counts per (batch_id, gold, pred) cell.

    Gold is adjusted as in the reference (eval_kbp.py:500): a gold-NIL
    mention whose entity was already added to the RW KB in a *previous*
    batch should be linked, not NIL — ``prev_added`` is (batch_id,
    gold_wikipedia_id) pairs marking ids added before that batch."""
    df = with_gold
    if prev_added is not None:
        pa = prev_added.select(
            F.col("batch_id").alias("pa_batch"),
            F.col("gold_wikipedia_id").alias("pa_wid"),
        )
        df = df.join(
            pa,
            (df.gold_wikipedia_id == pa.pa_wid) & (pa.pa_batch < df.batch_id),
            "left",
        ).withColumn(
            "gold_nil_adj", F.col("gold_nil") & F.col("pa_wid").isNull()
        ).drop("pa_batch", "pa_wid").dropDuplicates(["mention_id"])
    else:
        df = df.withColumn("gold_nil_adj", F.col("gold_nil"))
    return (
        df.groupBy("batch_id", F.col("gold_nil_adj").alias("gold"), F.col("is_nil").alias("pred"))
        .agg(F.count("*").alias("n"))
        .orderBy("batch_id", "gold", "pred")
    )


def nil_confusion_mitigated(with_gold: DataFrame) -> DataFrame:
    """E3: predicting NIL on a mention the linker got wrong counts as
    correct (eval_kbp.py:507-508,524-538)."""
    df = with_gold.withColumn(
        "link_correct",
        (~F.col("gold_nil"))
        & (F.col("top_wikipedia_id") == F.col("gold_wikipedia_id")),
    ).withColumn(
        "mitigated_correct",
        F.when(F.col("gold_nil"), F.col("is_nil")).otherwise(
            F.when(F.col("is_nil"), ~F.col("link_correct")).otherwise(
                F.col("link_correct")
            )
        ),
    )
    return df.groupBy("batch_id").agg(
        F.avg(F.col("mitigated_correct").cast("double")).alias("mitigated_accuracy"),
        F.count("*").alias("n"),
    ).orderBy("batch_id")


# --------------------------------------------------------------------------
# E4 — B³ precision/recall, join-based (eval_kbp.py:578-587)
# --------------------------------------------------------------------------
def b3_scores(assignments: DataFrame) -> DataFrame:
    """assignments: (batch_id, mention_id, pred_cluster, gold_cluster).

    B³ precision for mention m = |pred(m) ∩ gold(m)| / |pred(m)|; recall
    symmetric.  Computed with two self-joins + aggregations — fully
    distributed, no collect."""
    a = assignments.select("batch_id", "mention_id", "pred_cluster", "gold_cluster")
    b = a.select(
        F.col("batch_id").alias("b_batch"),
        F.col("mention_id").alias("b_mention"),
        F.col("pred_cluster").alias("b_pred"),
        F.col("gold_cluster").alias("b_gold"),
    )
    pairs = a.join(
        b,
        (a.batch_id == b.b_batch) & (a.pred_cluster == b.b_pred),
        "inner",
    )
    per_mention_p = pairs.groupBy("batch_id", "mention_id").agg(
        (
            F.sum(F.when(F.col("gold_cluster") == F.col("b_gold"), 1).otherwise(0))
            / F.count("*")
        ).alias("p_m")
    )
    pairs_r = a.join(
        b,
        (a.batch_id == b.b_batch) & (a.gold_cluster == b.b_gold),
        "inner",
    )
    per_mention_r = pairs_r.groupBy("batch_id", "mention_id").agg(
        (
            F.sum(F.when(F.col("pred_cluster") == F.col("b_pred"), 1).otherwise(0))
            / F.count("*")
        ).alias("r_m")
    )
    return (
        per_mention_p.join(per_mention_r, ["batch_id", "mention_id"])
        .groupBy("batch_id")
        .agg(
            F.avg("p_m").alias("b3_precision"),
            F.avg("r_m").alias("b3_recall"),
            F.count("*").alias("n_mentions"),
        )
        .withColumn(
            "b3_f1",
            2 * F.col("b3_precision") * F.col("b3_recall")
            / (F.col("b3_precision") + F.col("b3_recall")),
        )
        .orderBy("batch_id")
    )


# --------------------------------------------------------------------------
# E5 — MUC / CEAF-e on collected (small) cluster sets (eval_kbp.py:44-226)
# --------------------------------------------------------------------------
def _as_cluster_sets(assign_pdf: pd.DataFrame, col: str) -> list[set]:
    return [set(g["mention_id"]) for _, g in assign_pdf.groupby(col)]


def muc_score(pred: list[set], gold: list[set]) -> tuple[float, float, float]:
    """MUC link-based P/R/F1 (Vilain et al. 1995 partition formula)."""

    def _side(resp: list[set], key: list[set]) -> float:
        num = den = 0
        for s in key:
            if len(s) <= 0:
                continue
            # partitions of s induced by resp (+ singletons for unresponded)
            covered = set()
            parts = 0
            for r in resp:
                inter = s & r
                if inter:
                    parts += 1
                    covered |= inter
            parts += len(s - covered)
            num += len(s) - parts
            den += len(s) - 1
        return num / den if den else 0.0

    recall = _side(pred, gold)
    precision = _side(gold, pred)
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return precision, recall, f1


def ceaf_e_score(pred: list[set], gold: list[set]) -> tuple[float, float, float]:
    """CEAF-e with φ4(g, p) = 2|g∩p| / (|g|+|p|), optimal 1:1 alignment via
    Hungarian assignment (eval_kbp.py:172-189 semantics)."""
    from incremental_entity_extraction_spark.evaluation.assignment import (
        linear_sum_assignment_max,
    )

    if not pred or not gold:
        return 0.0, 0.0, 0.0
    phi = np.zeros((len(gold), len(pred)))
    for i, g in enumerate(gold):
        for j, p in enumerate(pred):
            inter = len(g & p)
            if inter:
                phi[i, j] = 2.0 * inter / (len(g) + len(p))
    rows, cols = linear_sum_assignment_max(phi)
    total = float(phi[rows, cols].sum())
    precision = total / len(pred)
    recall = total / len(gold)
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return precision, recall, f1


def coref_metrics_per_batch(assignments: DataFrame) -> pd.DataFrame:
    """MUC + CEAF-e per batch, driver-side on the collected assignment table
    (cluster sets are small; the reference also computes these in memory)."""
    pdf = assignments.select(
        "batch_id", "mention_id", "pred_cluster", "gold_cluster"
    ).toPandas()
    rows = []
    for b, g in pdf.groupby("batch_id"):
        pred = _as_cluster_sets(g, "pred_cluster")
        gold = _as_cluster_sets(g, "gold_cluster")
        mp, mr, mf = muc_score(pred, gold)
        cp, cr, cf = ceaf_e_score(pred, gold)
        rows.append(
            {
                "batch_id": int(b),
                "muc_precision": mp, "muc_recall": mr, "muc_f1": mf,
                "ceaf_e_precision": cp, "ceaf_e_recall": cr, "ceaf_e_f1": cf,
            }
        )
    return pd.DataFrame(rows).sort_values("batch_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# E6 — overall accuracy decomposition (eval_kbp.py:663-718)
# --------------------------------------------------------------------------
def overall_accuracy(
    with_gold: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Per batch: fraction correct, decomposed into
    (a) to-link mentions linked to the right KB entity,
    (b) should-be-NIL mentions predicted NIL,
    (c) gold-NIL mentions linked to a previously-added RW entity
        (counted correct — the incremental loop working as intended)."""
    from incremental_entity_extraction_spark.config import DEFAULT_CONFIG

    rw_indexer = (cfg or DEFAULT_CONFIG).rw_indexer_id
    df = with_gold.withColumn(
        "cat",
        F.when(
            (~F.col("gold_nil"))
            & (~F.col("is_nil"))
            & (F.col("top_wikipedia_id") == F.col("gold_wikipedia_id")),
            F.lit("link_correct"),
        )
        .when(F.col("gold_nil") & F.col("is_nil"), F.lit("nil_correct"))
        .when(
            F.col("gold_nil")
            & (~F.col("is_nil"))
            & (F.col("top_indexer") == F.lit(rw_indexer)),
            F.lit("linked_prev_added"),
        )
        .otherwise(F.lit("wrong")),
    )
    per_cat = df.groupBy("batch_id").pivot(
        "cat", ["link_correct", "nil_correct", "linked_prev_added", "wrong"]
    ).count().na.fill(0)
    total = sum(
        F.col(c) for c in ["link_correct", "nil_correct", "linked_prev_added", "wrong"]
    )
    return per_cat.withColumn(
        "overall_accuracy",
        (F.col("link_correct") + F.col("nil_correct") + F.col("linked_prev_added"))
        / total,
    ).orderBy("batch_id")


# --------------------------------------------------------------------------
# E7 — report assembly (eval_kbp.py:787-805)
# --------------------------------------------------------------------------
def assemble_report(per_batch: pd.DataFrame) -> pd.DataFrame:
    """Append the mean row (numeric columns) like the reference CSV report."""
    mean_row = per_batch.mean(numeric_only=True).to_dict()
    mean_row["batch_id"] = -1  # reference uses a 'mean' label row
    return pd.concat([per_batch, pd.DataFrame([mean_row])], ignore_index=True)

"""W1/J5 — exact dense top-k retrieval against a broadcast entity index.

Reference: FAISS ``IndexFlatIP.search`` over one RO + one RW index with
Postgres metadata hydration (pipeline/biencoder/blink/indexer/
faiss_indexer.py:65-67; pipeline/indexer/main.py:81-169).

Spark design (SURVEY.md §4): the entity matrix is broadcast as one or more
NumPy shards; each mention partition computes ``scores = enc @ shard.Tᵀ``
(chunked so the score block stays bounded), takes per-shard top-k with
``argpartition``, merges across shards, and hydrates metadata from the same
broadcast — zero shuffles end-to-end.  The reference's 5.9M × 1024 float32
index is ~24 GB: at cluster scale it ships as ~8-16 shards (a few GB each)
and the per-shard top-k results merge in the same pass; mention partitions
scale out freely, so the scan parallelism is (mention partitions × 1) with
no exchange.

Candidate ordering is deterministic: score desc, then (indexer, id) asc —
matching the oracle and the reference's score-desc sort across indexes
(pipeline/indexer/main.py:167-169).

Hydration parity note: the reference's per-request ``SELECT ... WHERE id IN``
(S4) is a broadcast-hash join in relational terms; here metadata rides the
same broadcast as the vectors, so hydration is a local array gather.  A
standalone join-based hydrator is in ``hydrate_candidates`` for the general
case where metadata is too wide to broadcast with the vectors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incremental_entity_extraction_spark.config import PipelineConfig

CANDIDATE_STRUCT = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("indexer", T.IntegerType(), False),
        T.StructField("wikipedia_id", T.LongType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("score", T.FloatType(), False),
        T.StructField("norm_score", T.FloatType(), False),
    ]
)

_SCORE_CHUNK_ROWS = 1024  # mention rows scored per matmul block
_ENT_TILE = 2048          # entity columns per score tile (cache-resident)


class KBShard:
    """Driver-side container for one broadcastable entity-index shard."""

    __slots__ = ("E", "ids", "indexer", "wikipedia_id", "title")

    def __init__(self, pdf: pd.DataFrame):
        self.E = np.stack(
            [np.asarray(e, dtype=np.float32) for e in pdf["embedding"]]
        ) if len(pdf) else np.zeros((0, 1), dtype=np.float32)
        self.ids = pdf["id"].to_numpy(dtype=np.int64)
        self.indexer = pdf["indexer"].to_numpy(dtype=np.int32)
        self.wikipedia_id = pdf["wikipedia_id"].fillna(-1).to_numpy(dtype=np.int64)
        # fillna BEFORE astype: a bare astype(str) renders None as "None"
        # and pd.NA as "<NA>", so the same null title would read differently
        # between a live driver-gated delta (pd.NA) and a lake-resumed shard
        # (None) — normalize both to "" (the entity encode tower does the
        # same, operators/encode.py)
        self.title = pdf["title"].fillna("").astype(str).to_numpy()


def build_kb_shards(kb_df: DataFrame, n_shards: int = 1) -> list[KBShard]:
    """Collect the KB dimension table into ``n_shards`` driver-side shards.

    Deterministic shard assignment: ``id % n_shards`` within each indexer.
    (At 100 TB scale this is the one deliberate collect: the KB is a
    dimension table — 5.9M rows in the reference — that must be broadcast
    for the scan-side matmul; shard count bounds per-executor memory.)
    """
    pdf = kb_df.select(
        "id", "indexer", "wikipedia_id", "title", "embedding"
    ).toPandas()
    pdf = pdf.sort_values(["indexer", "id"]).reset_index(drop=True)
    if len(pdf) == 0:
        return []
    return [
        KBShard(pdf[(pdf["id"] % n_shards) == s].reset_index(drop=True))
        for s in range(n_shards)
    ]


def retrieve_topk(
    mentions: DataFrame,
    cfg: PipelineConfig,
    shards: list[KBShard],
) -> DataFrame:
    """Adds ``candidates array<struct>`` (sorted, top_k) to mention rows."""
    spark = mentions.sparkSession
    bc = spark.sparkContext.broadcast(shards)
    k_cfg = cfg.top_k
    norm2 = float(cfg.vector_norm) ** 2
    out_schema = T.StructType(
        mentions.schema.fields
        + [T.StructField("candidates", T.ArrayType(CANDIDATE_STRUCT), False)]
    )
    in_cols = [f.name for f in mentions.schema.fields]

    def _topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shard_list = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            enc = np.stack(
                [np.asarray(e, dtype=np.float32) for e in pdf["encoding"]]
            )
            out = pdf[in_cols].copy()
            out["candidates"] = topk_candidates_kernel(
                enc, shard_list, k_cfg, norm2
            )
            yield out

    return mentions.mapInPandas(_topk, schema=out_schema)


def topk_candidates_columnar(
    enc: np.ndarray, shard_list: list[KBShard], k: int, norm2: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Exact top-k candidates for an encoding matrix vs broadcast shards, as
    COLUMNAR flat arrays: ``(counts, ids, indexer, wikipedia_id, title,
    score)`` where row ``r``'s candidates are the slice
    ``[counts[:r].sum() : counts[:r+1].sum())`` in global rank order
    (score desc, indexer asc, id asc).

    Per-shard, per-tile top-k, then merge (two-level top-k, SURVEY.md W1).
    Entity tiles keep the score block cache-resident (chunk × _ENT_TILE
    floats ≈ 8 MB) — a full chunk × n_entities block is DRAM-bandwidth-bound
    and collapses under concurrent workers.  No per-row Python: the flat
    arrays feed Arrow struct/list builders directly (operators/fused.py).
    """
    n = len(enc)
    counts = np.zeros(n, dtype=np.int32)
    f_ids, f_idxr, f_wids, f_titles, f_sc = [], [], [], [], []
    for lo in range(0, n, _SCORE_CHUNK_ROWS):
        chunk = enc[lo : lo + _SCORE_CHUNK_ROWS]
        parts = []
        for shard in shard_list:
            n_shard = shard.E.shape[0]
            if n_shard == 0:
                continue
            rows = np.arange(len(chunk))[:, None]
            for t0 in range(0, n_shard, _ENT_TILE):
                tile = shard.E[t0 : t0 + _ENT_TILE]
                scores = chunk @ tile.T  # [c, tile]
                kk = min(k, scores.shape[1])
                idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
                gidx = idx + t0
                parts.append(
                    (
                        scores[rows, idx],
                        shard.ids[gidx],
                        shard.indexer[gidx],
                        shard.wikipedia_id[gidx],
                        shard.title[gidx],
                    )
                )
        if not parts:
            continue
        sc = np.concatenate([p[0] for p in parts], axis=1)
        ids = np.concatenate([p[1] for p in parts], axis=1)
        idxr = np.concatenate([p[2] for p in parts], axis=1)
        wids = np.concatenate([p[3] for p in parts], axis=1)
        titles = np.concatenate([p[4] for p in parts], axis=1)
        kk = min(k, sc.shape[1])
        # deterministic global order: score desc, indexer asc, id asc
        order = np.lexsort((ids, idxr, -sc), axis=1)[:, :kk]
        rows = np.arange(len(chunk))[:, None]
        counts[lo : lo + len(chunk)] = kk
        f_sc.append(sc[rows, order].ravel())
        f_ids.append(ids[rows, order].ravel())
        f_idxr.append(idxr[rows, order].ravel())
        f_wids.append(wids[rows, order].ravel())
        f_titles.append(titles[rows, order].ravel())

    def _cat(parts, dtype):
        return (
            np.concatenate(parts)
            if parts
            else np.empty(0, dtype=dtype)
        )

    return (
        counts,
        _cat(f_ids, np.int64),
        _cat(f_idxr, np.int32),
        _cat(f_wids, np.int64),
        _cat(f_titles, object),
        _cat(f_sc, np.float32),
    )


def topk_candidates_kernel(
    enc: np.ndarray, shard_list: list[KBShard], k: int, norm2: float
) -> list[list[dict]]:
    """Row-major list-of-dicts view of ``topk_candidates_columnar`` — kept
    for the composable ``retrieve_topk`` operator and the NumPy-oracle
    tests; the fused hot path consumes the columnar form directly."""
    counts, ids, idxr, wids, titles, sc = topk_candidates_columnar(
        enc, shard_list, k, norm2
    )
    cands_col: list[list[dict]] = []
    pos = 0
    for c in counts:
        cands_col.append(
            [
                {
                    "id": int(ids[j]),
                    "indexer": int(idxr[j]),
                    "wikipedia_id": int(wids[j]),
                    "title": str(titles[j]),
                    "score": float(sc[j]),
                    "norm_score": float(sc[j] / norm2),
                }
                for j in range(pos, pos + int(c))
            ]
        )
        pos += int(c)
    return cands_col


def hydrate_candidates(candidates: DataFrame, entities: DataFrame) -> DataFrame:
    """S4/J5 as a standalone relational operator: explode candidate ids,
    broadcast-hash join entity metadata on (id, indexer), re-assemble the
    sorted candidate array.

    The reference's single ``SELECT ... WHERE id IN (...) AND indexer=%s``
    round trip (pipeline/indexer/main.py:98-109).  Used when metadata is too
    wide to ride the vector broadcast.
    """
    exploded = candidates.select(
        "mention_id", F.posexplode("candidates").alias("pos", "cand")
    ).select("mention_id", "pos", F.col("cand.id").alias("id"),
             F.col("cand.indexer").alias("indexer"),
             F.col("cand.score").alias("score"),
             F.col("cand.norm_score").alias("norm_score"))
    meta = F.broadcast(
        entities.select("id", "indexer", "wikipedia_id", "title")
    )
    joined = exploded.join(meta, ["id", "indexer"], "left")
    reassembled = (
        joined.groupBy("mention_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", "id", "indexer", "wikipedia_id", "title",
                             "score", "norm_score")
                )
            ).alias("sorted_cands")
        )
        .select(
            "mention_id",
            F.transform(
                "sorted_cands",
                lambda c: F.struct(
                    c["id"].alias("id"),
                    c["indexer"].alias("indexer"),
                    c["wikipedia_id"].alias("wikipedia_id"),
                    c["title"].alias("title"),
                    c["score"].alias("score"),
                    c["norm_score"].alias("norm_score"),
                ),
            ).alias("candidates"),
        )
    )
    return reassembled

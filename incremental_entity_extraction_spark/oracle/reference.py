"""NumPy/pandas oracle: the reference pipeline, single-node, verbatim math.

Stage-by-stage mirror of scripts/eval_kbp.py:330-718 in the reference repo
(rpo19/Incremental-Entity-Extraction), with the external model replaced by
the deterministic featurizer (same one the Spark side uses):

1. mention detection        — reference: Flair NER (blink/ner.py:29-42);
   ours: OOV-token-run detector with identical output contract.
2. encode                   — biencoder (pipeline/biencoder/main.py:41-52).
3. exact top-k retrieval    — FAISS IndexFlatIP.search (faiss_indexer.py:65-67)
   + metadata hydration (pipeline/indexer/main.py:98-169).
4. NIL features + logistic  — eval_kbp.py:242-328 + nilpredictor/__main__.py:
   42-103; deployed features (max_bi, secondiff), threshold 0.5.
5. greedy NN clustering     — the *sequential, order-dependent* loop of
   pipeline/greedyclustering/__main__.py:30-34: for each row i,
   ``clusters[scores[i] > th] = clusters[i]``.
6. cluster summary          — modal mention title + medoid center + size
   (greedyclustering/__main__.py:63-78, TimeEvolving.py:107-131).
7. KB augmentation          — contiguous new ids appended to the RW index
   (pipeline/indexer/main.py:178-214).
8. triple materialization   — relational rendering of the linking/cluster
   outputs (SURVEY.md §1.4, §7.1).

This module is pure NumPy/pandas so tests run it without Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from incremental_entity_extraction_spark.config import DEFAULT_CONFIG, PipelineConfig
from incremental_entity_extraction_spark.functions.cluster_math import (
    greedy_cluster_labels,
    medoid_index,
    modal_value,
)
from incremental_entity_extraction_spark.functions.detection import (
    detect_mentions_in_tokens,
)
from incremental_entity_extraction_spark.functions.featurizer import (
    encode_mentions,
    encode_token_lists,
    tokenize,
)


def oracle_detect_mentions(transcripts: pd.DataFrame) -> pd.DataFrame:
    """transcripts -> mention rows with token-based contexts.

    Output contract mirrors the reference mention record (create_dataset.Rmd:
    669-705): mention, context_left, context_right + provenance columns.
    """
    rows = []
    for rec in transcripts.itertuples(index=False):
        toks = tokenize(rec.text)
        for start, width, surface in detect_mentions_in_tokens(toks):
            rows.append(
                {
                    "mention_id": f"{rec.conv_id}:{rec.turn_idx}:{start}",
                    "conv_id": rec.conv_id,
                    "turn_idx": int(rec.turn_idx),
                    "batch_id": int(rec.batch_id),
                    "start_tok": start,
                    "mention": surface,
                    "context_left": " ".join(toks[:start]),
                    "context_right": " ".join(toks[start + width :]),
                }
            )
    df = pd.DataFrame(
        rows,
        columns=[
            "mention_id", "conv_id", "turn_idx", "batch_id", "start_tok",
            "mention", "context_left", "context_right",
        ],
    )
    return df.sort_values(["conv_id", "turn_idx", "start_tok"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# stage 3: exact top-k retrieval (W1) + hydration (J5)
# --------------------------------------------------------------------------
def oracle_topk(
    enc: np.ndarray,
    kb: pd.DataFrame,
    cfg: PipelineConfig,
) -> list[list[dict]]:
    """Exact max-dot-product top-k per mention over the KB table
    (columns id, indexer, wikipedia_id, title, embedding).

    Sort: score desc, then (indexer, id) asc — deterministic tie-break
    (the reference sorts candidates by score desc across all indexes,
    pipeline/indexer/main.py:167-169).
    """
    if len(kb) == 0 or len(enc) == 0:
        return [[] for _ in range(len(enc))]
    E = np.stack([np.asarray(e, dtype=np.float32) for e in kb["embedding"]])
    scores = enc.astype(np.float32) @ E.T  # [n_mentions, n_entities]
    k = min(cfg.top_k, len(kb))
    ids = kb["id"].to_numpy()
    idxr = kb["indexer"].to_numpy()
    wids = kb["wikipedia_id"].to_numpy()
    titles = kb["title"].to_numpy()
    out = []
    norm2 = np.float32(cfg.vector_norm) ** 2
    for i in range(len(enc)):
        row = scores[i]
        part = np.argpartition(-row, k - 1)[:k]
        # stable deterministic order: score desc, indexer asc, id asc
        order = sorted(part, key=lambda j: (-float(row[j]), int(idxr[j]), int(ids[j])))
        out.append(
            [
                {
                    "id": int(ids[j]),
                    "indexer": int(idxr[j]),
                    "wikipedia_id": int(wids[j]),
                    "title": str(titles[j]),
                    "score": float(row[j]),
                    "norm_score": float(row[j] / norm2),  # indexer/main.py:148-152
                }
                for j in order
            ]
        )
    return out


# --------------------------------------------------------------------------
# stage 4: NIL features + closed-form logistic (M6/M7/F14)
# --------------------------------------------------------------------------
def nil_score_from_features(max_bi: float, secondiff: float, cfg: PipelineConfig) -> float:
    z1 = (max_bi - cfg.nil_mu_max_bi) / cfg.nil_sigma_max_bi
    z2 = (secondiff - cfg.nil_mu_secondiff) / cfg.nil_sigma_secondiff
    x = cfg.nil_bias + cfg.nil_w_max_bi * z1 + cfg.nil_w_secondiff * z2
    return float(1.0 / (1.0 + np.exp(-x)))


def oracle_nil(mentions: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """Adds max_bi, secondiff, nil_score, is_nil, top_* columns."""
    max_bi, secondiff, nil_scores, is_nil = [], [], [], []
    top_id, top_indexer, top_wid, top_title = [], [], [], []
    for cands in mentions["candidates"]:
        if not cands:  # 0 candidates => NIL by construction (eval_kbp.py:306-310)
            max_bi.append(None); secondiff.append(None)
            nil_scores.append(0.0); is_nil.append(True)
            top_id.append(None); top_indexer.append(None)
            top_wid.append(None); top_title.append(None)
            continue
        s0 = cands[0]["score"]
        s1 = cands[1]["score"] if len(cands) > 1 else 0.0
        mb, sd = float(s0), float(s0 - s1)
        ns = nil_score_from_features(mb, sd, cfg)
        max_bi.append(mb); secondiff.append(sd)
        nil_scores.append(ns); is_nil.append(ns < cfg.nil_threshold)
        top_id.append(cands[0]["id"]); top_indexer.append(cands[0]["indexer"])
        top_wid.append(cands[0]["wikipedia_id"]); top_title.append(cands[0]["title"])
    out = mentions.copy()
    out["max_bi"] = max_bi
    out["secondiff"] = secondiff
    out["nil_score"] = nil_scores
    out["is_nil"] = is_nil
    out["top_id"] = top_id
    out["top_indexer"] = top_indexer
    out["top_wikipedia_id"] = top_wid
    out["top_title"] = top_title
    return out


# --------------------------------------------------------------------------
# stage 5/6 kernels shared with Spark: functions.cluster_math
# --------------------------------------------------------------------------
def summarize_clusters(nil_df: pd.DataFrame, enc: np.ndarray, labels: np.ndarray) -> pd.DataFrame:
    """One row per cluster: title (modal mention), nelements, members, medoid
    center. Cluster order: nelements desc, title asc (deterministic)."""
    rows = []
    for lab in sorted(set(labels.tolist())):
        idx = np.where(labels == lab)[0]
        members = nil_df.iloc[idx]
        title = modal_value(list(members["mention"]))
        med = medoid_index(enc[idx])
        rows.append(
            {
                "title": title,
                "nelements": int(len(idx)),
                "mentions_id": list(members["mention_id"]),
                "mentions": list(members["mention"]),
                "center": enc[idx][med].astype(np.float32).tolist(),
            }
        )
    out = pd.DataFrame(
        rows, columns=["title", "nelements", "mentions_id", "mentions", "center"]
    )
    # canonical cluster order (matches operators/kb.py id assignment):
    # nelements desc, title asc, first-member mention_id asc
    out["_first"] = [m[0] for m in out["mentions_id"]]
    out = out.sort_values(
        ["nelements", "title", "_first"], ascending=[False, True, True]
    ).drop(columns="_first")
    return out.reset_index(drop=True)


# --------------------------------------------------------------------------
# stage 7+8: KB augmentation + triples; incremental driver loop
# --------------------------------------------------------------------------
@dataclass
class OracleState:
    """Cross-batch state (reference: RW FAISS index + Postgres rows +
    driver globals added_entities/prev_clusters, eval_kbp.py:39-41)."""

    rw_entities: pd.DataFrame = field(default_factory=pd.DataFrame)
    next_rw_id: int = 0


def oracle_run_batch(
    transcripts_batch: pd.DataFrame,
    kb_ro: pd.DataFrame,
    state: OracleState,
    cfg: PipelineConfig,
):
    """One incremental batch -> (enriched mentions, clusters, triples, state)."""
    mentions = oracle_detect_mentions(transcripts_batch)
    enc = encode_mentions(
        mentions["context_left"], mentions["mention"], mentions["context_right"],
        cfg.dim, cfg.vector_norm, cfg.max_context_tokens,
    )
    kb = kb_ro
    if len(state.rw_entities):
        kb = pd.concat([kb_ro, state.rw_entities], ignore_index=True)
    mentions = mentions.copy()
    mentions["candidates"] = oracle_topk(enc, kb, cfg)
    mentions = oracle_nil(mentions, cfg)

    nil_mask = mentions["is_nil"].to_numpy()
    nil_df = mentions[nil_mask].reset_index(drop=True)
    nil_enc = enc[nil_mask]
    labels = greedy_cluster_labels(nil_enc, cfg.greedy_threshold)
    clusters = summarize_clusters(nil_df, nil_enc, labels)

    # KB augmentation: contiguous ids (indexer/main.py:198 semantics)
    new_rows = []
    cluster_rw_ids = []
    for _, c in clusters.iterrows():
        rw_id = state.next_rw_id
        cluster_rw_ids.append(rw_id)
        new_rows.append(
            {
                "id": rw_id,
                "indexer": cfg.rw_indexer_id,
                "wikipedia_id": -1,
                "title": c["title"][: cfg.max_title_len],
                "descr": "",
                "type_": None,
                "embedding": c["center"],
            }
        )
        state.next_rw_id += 1
    clusters = clusters.copy()
    clusters["index_id"] = cluster_rw_ids
    clusters["index_indexer"] = cfg.rw_indexer_id
    if new_rows:
        add = pd.DataFrame(new_rows)
        state.rw_entities = (
            pd.concat([state.rw_entities, add], ignore_index=True)
            if len(state.rw_entities)
            else add
        )

    # triples (SURVEY.md §7.1)
    trip = []
    for rec in mentions.itertuples(index=False):
        turn_uri = f"{rec.conv_id}#{rec.turn_idx}"
        trip.append((turn_uri, "mentions", rec.mention_id, rec.conv_id, rec.batch_id))
        if not rec.is_nil:
            obj = (
                f"wiki:{rec.top_wikipedia_id}"
                if rec.top_indexer == cfg.ro_indexer_id
                else f"new:{rec.top_id}"
            )
            trip.append((rec.mention_id, "linked_to", obj, rec.conv_id, rec.batch_id))
    mid_to_cluster = {}
    for rw_id, (_, c) in zip(cluster_rw_ids, clusters.iterrows()):
        for mid in c["mentions_id"]:
            mid_to_cluster[mid] = rw_id
    for rec in nil_df.itertuples(index=False):
        rw = mid_to_cluster[rec.mention_id]
        trip.append((rec.mention_id, "member_of", f"new:{rw}", rec.conv_id, rec.batch_id))
    for rw_id, (_, c) in zip(cluster_rw_ids, clusters.iterrows()):
        trip.append((f"new:{rw_id}", "canonical_name", c["title"], None, int(transcripts_batch["batch_id"].iloc[0])))
    triples = pd.DataFrame(
        trip, columns=["subj", "pred", "obj", "conv_id", "batch_id"]
    )
    return mentions, clusters, triples, state


def oracle_run_incremental(
    transcripts: pd.DataFrame, kb_ro: pd.DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
):
    """Loop over batch_id in order (eval_kbp.py:781-785), threading state."""
    state = OracleState()
    all_mentions, all_clusters, all_triples = [], [], []
    for b in sorted(transcripts["batch_id"].unique()):
        tb = transcripts[transcripts["batch_id"] == b]
        m, c, t, state = oracle_run_batch(tb, kb_ro, state, cfg)
        c = c.copy()
        c["batch_id"] = int(b)
        all_mentions.append(m)
        all_clusters.append(c)
        all_triples.append(t)
    return (
        pd.concat(all_mentions, ignore_index=True),
        pd.concat(all_clusters, ignore_index=True),
        pd.concat(all_triples, ignore_index=True),
        state,
    )

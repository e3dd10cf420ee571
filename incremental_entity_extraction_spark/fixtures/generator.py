"""Seeded synthetic world: transcripts + entity KB + gold mentions.

Mirrors the reference's dataset construction (notebooks/create_dataset.Rmd):
~10% of gold entities are "NIL" — present in text but deleted from the KB
(create_dataset.Rmd:902-932 deletes NIL entities from Postgres), so their
mentions must be detected as out-of-KB and clustered into new entities.

The transcript table matches BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)``, with Zipf-skewed turns per conversation (hot-conversation
skew knob) and batches assigned by global timestamp order (batch order is
the time axis, as in the reference where batch files are processed in CLI
order, eval_kbp.py:781).

Everything is generated with ``numpy.random.default_rng(seed)`` — no wall
clock, no external data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from incremental_entity_extraction_spark.config import DEFAULT_CONFIG, PipelineConfig
from incremental_entity_extraction_spark.functions.featurizer import (
    build_entity_window,
    encode_token_lists,
)

# fixed filler vocabulary (overlaps /root/testdata documents vocab + stopwords)
FILLER_WORDS = (
    "the a an of to and in on for with from by at is was were be as it this "
    "that key agg row scan slow fast table value part hash batch window spark "
    "order data column join small line customer query filter plan stage shuffle "
    "broadcast merge sort group count sum read write file disk memory node task "
    "core time day week user event click view error page cart items total price "
    "report chart metric graph model score label train test split sample seed"
).split()

_SYL_A = [
    "zor", "mar", "vel", "tak", "rin", "sol", "ben", "cul", "dor", "fen",
    "gal", "hob", "jun", "kel", "lim", "nop", "pra", "qua", "sib", "tum",
    "urv", "wex", "yol", "zen", "abr", "bli", "cro", "dru", "eph", "fro",
]
_SYL_B = [
    "vex", "nel", "dar", "mir", "tol", "gan", "rup", "lin", "bos", "kar",
    "fex", "mon", "tis", "val", "zed", "hur", "pim", "lor", "nax", "wyn",
]
_TYPES = ["person", "place", "org", "work", "event"]
_TOOLS = ["search", "browser", "calculator", "code", "files"]
_ROLES = ["user", "assistant", "tool"]

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _entity_titles(n: int) -> list[str]:
    """n two-token titles with pairwise-distinct token *sets*.

    The bag-of-words featurizer is order-invariant, so two titles with the
    same token set would alias.  The first 300 titles use fully disjoint
    tokens (600 distinct tokens, 2 each — zero cross-entity similarity);
    beyond that, titles may share ONE token with another entity (cosine
    ~0.45 — far below both the linking and clustering regimes) but never
    both.  Capacity: C(600, 2) = 179,700 entities.
    """
    toks = [a + b for a in _SYL_A for b in _SYL_B]  # 600 unique tokens
    m = len(toks)
    titles = [f"{toks[2 * i]} {toks[2 * i + 1]}" for i in range(min(n, m // 2))]
    if n > m // 2:
        used = {(2 * i, 2 * i + 1) for i in range(m // 2)}
        for a in range(m):
            for b in range(a + 1, m):
                if len(titles) >= n:
                    return titles
                if (a, b) in used:
                    continue
                titles.append(f"{toks[a]} {toks[b]}")
        if len(titles) < n:
            raise ValueError(f"title capacity exceeded: {n} > {m * (m - 1) // 2}")
    return titles


@dataclass
class World:
    transcripts: pd.DataFrame      # conv_id, turn_idx, role, text, tool, ts, batch_id
    entities_kb: pd.DataFrame      # id, indexer, wikipedia_id, title, descr, type_, embedding
    entities_all: pd.DataFrame     # + NIL gold entities (nil flag) — gold labels only
    gold_mentions: pd.DataFrame    # conv_id, turn_idx, start_tok, mention, Wikipedia_ID, NIL, batch_id
    n_batches: int
    cfg: PipelineConfig


def make_world(
    cfg: PipelineConfig = DEFAULT_CONFIG,
    n_convs: int = 30,
    n_entities: int = 120,
    nil_frac: float = 0.1,
    n_batches: int = 4,
    base_turns: int = 12,
    mention_rate: float = 0.9,
    seed: int | None = None,
) -> World:
    rng = np.random.default_rng(cfg.seed if seed is None else seed)

    # ---- entities --------------------------------------------------------
    titles = _entity_titles(n_entities)
    n_nil = max(1, int(n_entities * nil_frac))
    nil_flags = np.zeros(n_entities, dtype=bool)
    nil_flags[rng.choice(n_entities, size=n_nil, replace=False)] = True
    ent_rows = []
    for i, title in enumerate(titles):
        typ = _TYPES[i % len(_TYPES)]
        descr_words = rng.choice(FILLER_WORDS, size=6, replace=True)
        descr = f"a {typ} concerning " + " ".join(descr_words)
        ent_rows.append(
            {
                "wikipedia_id": 1000 + i,
                "title": title[: cfg.max_title_len],
                "descr": descr,
                "type_": typ,
                "nil": bool(nil_flags[i]),
            }
        )
    entities_all = pd.DataFrame(ent_rows)

    kb = entities_all[~entities_all["nil"]].reset_index(drop=True).copy()
    kb["id"] = np.arange(len(kb), dtype=np.int64)          # contiguous per indexer
    kb["indexer"] = np.int32(cfg.ro_indexer_id)
    windows = [
        build_entity_window(t, d, cfg.max_entity_tokens)
        for t, d in zip(kb["title"], kb["descr"])
    ]
    emb = encode_token_lists(
        [w[0] for w in windows], cfg.dim, cfg.vector_norm, [w[1] for w in windows]
    )
    kb["embedding"] = [row.tolist() for row in emb]
    entities_kb = kb[
        ["id", "indexer", "wikipedia_id", "title", "descr", "type_", "embedding"]
    ]

    # ---- transcripts with embedded mentions ------------------------------
    # Zipf-skewed turns per conversation: conv 0 is hot.
    conv_turns = np.maximum(
        2, (base_turns * 4 / np.arange(1, n_convs + 1) ** 0.8).astype(int)
    )
    t_rows, m_rows = [], []
    global_turn = 0
    for ci in range(n_convs):
        conv_id = f"conv_{ci:08d}"
        for ti in range(int(conv_turns[ci])):
            role = _ROLES[ti % 3]
            tool = _TOOLS[int(rng.integers(len(_TOOLS)))] if role == "tool" else None
            n_fill = int(rng.integers(6, 18))
            toks = list(rng.choice(FILLER_WORDS, size=n_fill, replace=True))
            n_mentions = int(rng.random() < mention_rate) + int(rng.random() < 0.35)
            positions = sorted(rng.choice(n_fill, size=n_mentions, replace=False))
            # insert mention token-pairs right-to-left so earlier offsets hold
            turn_mentions = []
            for pos in reversed(positions):
                eidx = int(rng.integers(n_entities))
                surface = entities_all.loc[eidx, "title"]  # two tokens
                toks[pos:pos] = surface.split()
                turn_mentions.append((pos, eidx, surface))
            # fix start offsets after all insertions (each earlier insert shifts by 2)
            turn_mentions.sort(key=lambda x: x[0])
            for k, (pos, eidx, surface) in enumerate(turn_mentions):
                start_tok = pos + 2 * k
                m_rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": ti,
                        "start_tok": start_tok,
                        "mention": surface,
                        "Wikipedia_ID": int(entities_all.loc[eidx, "wikipedia_id"]),
                        "NIL": bool(entities_all.loc[eidx, "nil"]),
                    }
                )
            ts = _EPOCH + timedelta(seconds=global_turn * 13 + ci)
            t_rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": np.int32(ti),
                    "role": role,
                    "text": " ".join(toks),
                    "tool": tool,
                    "ts": ts,
                }
            )
            global_turn += 1

    transcripts = pd.DataFrame(t_rows)
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")

    # batch = global ts-order slice (batch order IS the time axis)
    order = transcripts.sort_values(["ts", "conv_id", "turn_idx"]).index
    batch_id = np.empty(len(transcripts), dtype=np.int32)
    batch_id[order.to_numpy()] = (
        np.arange(len(transcripts)) * n_batches // len(transcripts)
    ).astype(np.int32)
    transcripts["batch_id"] = batch_id

    gold = pd.DataFrame(m_rows)
    gold = gold.merge(
        transcripts[["conv_id", "turn_idx", "batch_id"]],
        on=["conv_id", "turn_idx"],
        how="left",
    )

    return World(
        transcripts=transcripts,
        entities_kb=entities_kb,
        entities_all=entities_all,
        gold_mentions=gold,
        n_batches=n_batches,
        cfg=cfg,
    )


def write_world(world: World, path: str) -> dict[str, str]:
    """Write fixture tables as parquet (pyarrow, no Spark needed)."""
    os.makedirs(path, exist_ok=True)
    out = {}
    for name, df in [
        ("transcripts", world.transcripts),
        ("entities_kb", world.entities_kb),
        ("entities_all", world.entities_all),
        ("gold_mentions", world.gold_mentions),
    ]:
        p = os.path.join(path, f"{name}.parquet")
        # microsecond timestamps — Spark cannot read pandas' default NANOS
        df.to_parquet(
            p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        out[name] = p
    return out

"""Deterministic hash featurizer — the pluggable encoder contract.

The reference encodes mentions/entities with a 2.5 GB BLINK BERT bi-encoder
(pipeline/biencoder/main.py:41-52) into 1024-d float32.  Model weights are an
external download, so this engine defines the encoder as a *contract*:

    encode_token_lists(list[list[str]]) -> np.ndarray [n, dim] float32

and ships a deterministic, dependency-free implementation: every token maps
to a pseudo-random vector derived from its BLAKE2b digest; a text window is
the L2-normalized sum of its token vectors scaled to ``vector_norm``.  The
same function runs inside the NumPy oracle and inside Spark pandas UDFs, so
parity tests measure pipeline semantics, not model quality (SURVEY.md §7.4).

Tokenization-window semantics mirror the reference's context quota logic
(blink/biencoder/data_process.py:26-69): the mention is kept whole and the
left/right contexts each get half of the remaining budget, with spillover
rebalancing when one side is short.
"""

from __future__ import annotations

import re
from hashlib import blake2b

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# per-process token-vector cache (executor-local singleton, like the
# reference's per-service model singleton)
_CACHE: dict[tuple[str, int], np.ndarray] = {}
_CACHE_MAX = 500_000


def tokenize(text: str) -> list[str]:
    """Lowercase word tokenizer (reference lowercases mentions/contexts,
    blink/main_dense.py:89-96)."""
    if text is None:
        return []
    return _TOKEN_RE.findall(text.lower())


def token_vector(token: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-random float32 vector in [-1, 1)^dim for a token.

    Bytes come from chained BLAKE2b digests of ``token#<block>`` so any dim
    is supported; interpretation as little-endian int32 is platform-stable.
    """
    key = (token, dim)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    need = dim * 4
    chunks = []
    block = 0
    while need > 0:
        h = blake2b(f"{token}#{block}".encode("utf-8"), digest_size=64)
        chunks.append(h.digest())
        need -= 64
        block += 1
    raw = b"".join(chunks)[: dim * 4]
    vec = np.frombuffer(raw, dtype="<i4").astype(np.float32) / np.float32(2**31)
    if len(_CACHE) < _CACHE_MAX:
        _CACHE[key] = vec
    return vec


def encode_token_lists(
    token_lists: list[list[str]], dim: int, norm: float, weights: list[list[float]] | None = None
) -> np.ndarray:
    """Encode a batch of token windows -> [n, dim] float32, each row scaled to
    L2 norm ``norm`` (zero vector for empty windows).

    ``weights`` (parallel to ``token_lists``) lets focus tokens (the mention
    surface / the entity title) dominate the window — the deterministic
    analogue of BLINK's ``[unused0]`` mention markers steering attention
    (data_process.py:26-69).
    """
    n = len(token_lists)
    out = np.zeros((n, dim), dtype=np.float32)
    # vectorized accumulation: hash each *unique* token once, then one
    # scatter-add over (row, token) incidences — the encode hot path is
    # O(unique tokens) hashing + O(incidences) float adds
    vocab: dict[str, int] = {}
    rows: list[int] = []
    cols: list[int] = []
    wts: list[float] = []
    for i, toks in enumerate(token_lists):
        ws = weights[i] if weights is not None else None
        for j, t in enumerate(toks):
            cols.append(vocab.setdefault(t, len(vocab)))
            rows.append(i)
            wts.append(1.0 if ws is None else ws[j])
    if vocab:
        V = np.stack([token_vector(t, dim) for t in vocab])
        contrib = V[np.asarray(cols)] * np.asarray(wts, dtype=np.float32)[:, None]
        np.add.at(out, np.asarray(rows), contrib)
    lens = np.linalg.norm(out, axis=1)
    nz = lens > 0
    out[nz] = out[nz] * (np.float32(norm) / lens[nz, None]).astype(np.float32)
    return out


FOCUS_WEIGHT = 8.0  # weight of mention/title tokens vs context/descr tokens


def build_mention_window(
    context_left: str, mention: str, context_right: str, max_tokens: int
) -> tuple[list[str], list[float]]:
    """Context-window (tokens, weights) for a mention (data_process.py:26-69
    analogue).

    Keeps the whole mention at FOCUS_WEIGHT; splits the remaining budget
    between the nearest-left and nearest-right context tokens (weight 1),
    spilling unused quota to the other side.
    """
    return window_from_tokens(
        tokenize(context_left), tokenize(mention), tokenize(context_right),
        max_tokens,
    )


def window_from_tokens(
    lt: list[str], m: list[str], rt: list[str], max_tokens: int
) -> tuple[list[str], list[float]]:
    """Token-list core of ``build_mention_window`` — callers that already
    hold token lists (the fused detector, which tokenized the turn once)
    skip the join+retokenize round trip.  Bit-identical: tokens are
    ``[a-z0-9]+`` so ``tokenize(" ".join(toks)) == toks`` exactly."""
    budget = max(0, max_tokens - len(m))
    left_quota = budget // 2
    right_quota = budget - left_quota
    if len(lt) < left_quota:
        right_quota += left_quota - len(lt)
        left_quota = len(lt)
    if len(rt) < right_quota:
        left_quota = min(len(lt), left_quota + (right_quota - len(rt)))
        right_quota = len(rt)
    left = lt[len(lt) - left_quota :] if left_quota else []
    right = rt[:right_quota]
    toks = left + m + right
    weights = [1.0] * len(left) + [FOCUS_WEIGHT] * len(m) + [1.0] * len(right)
    return toks, weights


def build_entity_window(title: str, descr: str, max_tokens: int) -> tuple[list[str], list[float]]:
    """Entity token window: title (FOCUS_WEIGHT) + description (weight 1),
    truncated to budget (data_process.py:72-97 analogue)."""
    t = tokenize(title)
    d = tokenize(descr)
    toks = (t + d)[:max_tokens]
    weights = ([FOCUS_WEIGHT] * len(t) + [1.0] * len(d))[:max_tokens]
    return toks, weights


def encode_mentions(
    context_left: list[str] | np.ndarray,
    mention: list[str] | np.ndarray,
    context_right: list[str] | np.ndarray,
    dim: int,
    norm: float,
    max_tokens: int,
) -> np.ndarray:
    windows = [
        build_mention_window(l, m, r, max_tokens)
        for l, m, r in zip(context_left, mention, context_right)
    ]
    return encode_token_lists(
        [w[0] for w in windows], dim, norm, [w[1] for w in windows]
    )


def encode_entities(
    title: list[str] | np.ndarray,
    descr: list[str] | np.ndarray,
    dim: int,
    norm: float,
    max_tokens: int,
) -> np.ndarray:
    windows = [build_entity_window(t, d, max_tokens) for t, d in zip(title, descr)]
    return encode_token_lists(
        [w[0] for w in windows], dim, norm, [w[1] for w in windows]
    )

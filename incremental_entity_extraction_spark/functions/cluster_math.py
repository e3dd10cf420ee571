"""Clustering math kernels shared by the oracle and Spark applyInPandas.

* ``greedy_cluster_labels`` — the reference's sequential last-writer-wins
  label loop (semantics of pipeline/greedyclustering/__main__.py:30-34).
* ``modal_value`` — most-frequent value with deterministic ties (A3).
* ``medoid_index`` — KMedoids-k=1 center (TimeEvolving.py:123-131; A10).
"""

from __future__ import annotations

import numpy as np


def greedy_cluster_labels(enc: np.ndarray, threshold: float) -> np.ndarray:
    """Sequential label propagation over the dot-product matrix: for each row
    i in order, every j with ``scores[i, j] > threshold`` takes i's current
    label (last writer wins).  Order-dependent by design — callers must feed
    rows in the canonical (conv_id, turn_idx, start_tok) order."""
    n = len(enc)
    labels = np.arange(n)
    if n == 0:
        return labels
    scores = enc @ enc.T
    for i in range(n):
        labels[scores[i] > threshold] = labels[i]
    return labels


def modal_value(values) -> str:
    """Most frequent value; ties -> lexicographically smallest (deterministic
    stand-in for the reference's Counter.most_common insertion order,
    greedyclustering/__main__.py:72-78)."""
    counts: dict = {}
    for v in values:
        counts[v] = counts.get(v, 0) + 1
    best_count = max(counts.values())
    return min(v for v, c in counts.items() if c == best_count)


def medoid_index(enc: np.ndarray) -> int:
    """Member minimizing total Euclidean distance to the others; ties ->
    lowest index."""
    if len(enc) == 1:
        return 0
    d2 = ((enc[:, None, :] - enc[None, :, :]) ** 2).sum(-1)
    tot = np.sqrt(np.maximum(d2, 0)).sum(1)
    return int(np.argmin(tot))


def _union_find_components(n: int, edges) -> np.ndarray:
    """Union-find connected components; returns min-index root labels."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in edges:
        ri, rj = find(i), find(j)
        if ri != rj:
            # keep the smaller index as root => deterministic labels
            if ri < rj:
                parent[rj] = ri
            else:
                parent[ri] = rj
    return np.array([find(i) for i in range(n)])


def single_link_labels(dist: np.ndarray, threshold: float) -> np.ndarray:
    """Single-link agglomerative clustering with a distance cutoff ≡
    connected components on the dist <= threshold graph (exact equivalence)."""
    n = len(dist)
    ii, jj = np.where(np.triu(dist <= threshold, k=1))
    return _union_find_components(n, zip(ii.tolist(), jj.tolist()))


def three_step_cluster_labels(
    mentions: list[str],
    enc: np.ndarray,
    string_threshold: float = 0.2,
    cosine_threshold: float = 0.036,
    centroid_threshold: float = 0.05,
    merge_dot_gate: float = 80.0,
    max_unique_mentions: int = 25,
) -> np.ndarray:
    """M9 — the reference's 3-step clustering
    (pipeline/threestepclustering/__main__.py:87-189, TimeEvolving.py:134-143):

    1. single-link on normalized Damerau-Levenshtein distance over mention
       strings (<= string_threshold);
    2. within each string cluster, single-link on cosine *distance* over
       encodings (<= cosine_threshold);
    3. merge sub-clusters whose mean-vector cosine distance is
       <= centroid_threshold, gated on at least one cross-pair dot product
       > merge_dot_gate; clusters accumulating more than
       ``max_unique_mentions`` unique surfaces are broken back up by
       re-running step 1 on their members at half the string threshold.
    """
    from incremental_entity_extraction_spark.functions.string_metrics import (
        dl_distance_normalized,
        pairwise_matrix,
    )

    n = len(mentions)
    if n == 0:
        return np.arange(0)
    # --- step 1: string single-link
    d_str = pairwise_matrix(list(mentions), dl_distance_normalized)
    lab1 = single_link_labels(d_str, string_threshold)

    # --- step 2: per string-cluster cosine single-link
    norms = np.linalg.norm(enc, axis=1)
    norms[norms == 0] = 1.0
    unit = enc / norms[:, None]
    sub_labels = np.empty(n, dtype=np.int64)
    next_label = 0
    sub_groups: list[np.ndarray] = []
    for root in np.unique(lab1):
        idx = np.where(lab1 == root)[0]
        cos_dist = 1.0 - unit[idx] @ unit[idx].T
        ll = single_link_labels(cos_dist, cosine_threshold)
        for r in np.unique(ll):
            members = idx[ll == r]
            sub_labels[members] = next_label
            sub_groups.append(members)
            next_label += 1

    # --- step 3: merge sub-clusters on centroid cosine, gated on raw dot
    k = len(sub_groups)
    centroids = np.stack([unit[g].mean(0) for g in sub_groups])
    cn = np.linalg.norm(centroids, axis=1)
    cn[cn == 0] = 1.0
    centroids = centroids / cn[:, None]
    edges = []
    for i in range(k):
        for j in range(i + 1, k):
            if 1.0 - float(centroids[i] @ centroids[j]) <= centroid_threshold:
                cross = enc[sub_groups[i]] @ enc[sub_groups[j]].T
                if cross.max(initial=-np.inf) > merge_dot_gate:
                    edges.append((i, j))
    group_root = _union_find_components(k, edges)
    labels = np.empty(n, dtype=np.int64)
    for gi, members in enumerate(sub_groups):
        labels[members] = group_root[gi]

    # --- break oversized clusters (re-run step 1 tighter)
    for root in np.unique(labels):
        idx = np.where(labels == root)[0]
        uniq = {mentions[i] for i in idx}
        if len(uniq) > max_unique_mentions:
            d_sub = pairwise_matrix([mentions[i] for i in idx], dl_distance_normalized)
            ll = single_link_labels(d_sub, string_threshold / 2)
            base = int(labels.max()) + 1
            for r_i, member in zip(ll, idx):
                labels[member] = base + int(r_i)
    # relabel to min member index per cluster (deterministic)
    out = np.empty(n, dtype=np.int64)
    for root in np.unique(labels):
        idx = np.where(labels == root)[0]
        out[idx] = idx.min()
    return out


def _char_bigrams(s: str) -> list[str]:
    s = f" {s} "
    return [s[i : i + 2] for i in range(len(s) - 1)]


def tfidf_cluster_labels(
    mentions: list[str],
    contexts: list[str],
    threshold: float = 0.984375,
    bigram_weight: float = 0.8,
    context_weight: float = 0.2,
) -> np.ndarray:
    """M10 — TF-IDF feature clustering (pipeline/featureclustering/
    __main__.py:42-139): blended kernel of l2-normalized char-bigram term
    counts over mention surfaces (idf off) and l2-normalized TF-IDF over
    contexts, then the greedy sequential loop at ``threshold``.
    """
    n = len(mentions)
    if n == 0:
        return np.arange(0)

    def _tf_matrix(docs: list[list[str]], use_idf: bool) -> np.ndarray:
        vocab: dict[str, int] = {}
        for d in docs:
            for t in d:
                vocab.setdefault(t, len(vocab))
        m = np.zeros((n, max(len(vocab), 1)), dtype=np.float64)
        for i, d in enumerate(docs):
            for t in d:
                m[i, vocab[t]] += 1.0
        if use_idf and len(vocab):
            df = (m > 0).sum(0)
            idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
            m = m * idf[None, :]
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        return m / norms[:, None]

    bi = _tf_matrix([_char_bigrams(s) for s in mentions], use_idf=False)
    ctx = _tf_matrix([c.split() for c in contexts], use_idf=True)
    kernel = bigram_weight * (bi @ bi.T) + context_weight * (ctx @ ctx.T)
    labels = np.arange(n)
    for i in range(n):
        labels[kernel[i] > threshold] = labels[i]
    return labels

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

"""Hungarian (Kuhn-Munkres) assignment on a cost matrix — NumPy only.

Needed for CEAF-e (the reference uses scipy.optimize.linear_sum_assignment
via its streaming-cdc port, scripts/eval_kbp.py:172-189); scipy is not in
this environment, so this is the standard O(n³) potentials formulation of
the algorithm (public-domain textbook algorithm).
"""

from __future__ import annotations

import numpy as np


def linear_sum_assignment_min(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimum-cost assignment. Returns (row_idx, col_idx) like scipy.
    Handles rectangular matrices by padding to square with zeros."""
    cost = np.asarray(cost, dtype=np.float64)
    n_rows, n_cols = cost.shape
    n = max(n_rows, n_cols)
    a = np.zeros((n + 1, n + 1), dtype=np.float64)
    a[1 : n_rows + 1, 1 : n_cols + 1] = cost

    INF = float("inf")
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=np.int64)   # p[j] = row assigned to column j
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            for j in range(1, n + 1):
                if used[j]:
                    continue
                cur = a[i0, j] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1

    rows, cols = [], []
    for j in range(1, n + 1):
        if 1 <= p[j] <= n_rows and 1 <= j <= n_cols:
            rows.append(p[j] - 1)
            cols.append(j - 1)
    order = np.argsort(rows)
    return np.asarray(rows)[order], np.asarray(cols)[order]


def linear_sum_assignment_max(score: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Maximum-score assignment (negate and minimize)."""
    score = np.asarray(score, dtype=np.float64)
    return linear_sum_assignment_min(-score)

"""Linear sum assignment (Hungarian / Jonker-Volgenant style), numpy.

Replaces ``scipy.optimize.linear_sum_assignment`` (used by the
reference's CEAF-e, ``scripts/eval_kbp.py:145-189``), which is not
available in this environment. Implements the O(n³) shortest
augmenting path algorithm on dense matrices; handles rectangular
inputs and ``maximize=True`` like scipy.
"""

from __future__ import annotations

import numpy as np


def linear_sum_assignment(cost: np.ndarray, maximize: bool = False):
    cost = np.asarray(cost, dtype=np.float64)
    if maximize:
        cost = -cost
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape  # n <= m

    INF = np.inf
    # potentials; v over columns (1-indexed with 0 as virtual column)
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row matched to column j
    p[:] = 0
    way = np.zeros(m + 1, dtype=np.int64)

    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            cur = cost[i0 - 1, :] - u[i0] - v[1:]
            for j in range(1, m + 1):
                if not used[j]:
                    if cur[j - 1] < minv[j]:
                        minv[j] = cur[j - 1]
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(m + 1):
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

    rows = np.zeros(n, dtype=np.int64)
    for j in range(1, m + 1):
        if p[j] > 0:
            rows[p[j] - 1] = j - 1
    row_ind = np.arange(n)
    col_ind = rows
    if transposed:
        order = np.argsort(col_ind)
        return col_ind[order], row_ind[order]
    return row_ind, col_ind

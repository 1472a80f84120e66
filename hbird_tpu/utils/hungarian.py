"""Pure-numpy Hungarian (linear sum assignment) solver.

Fallback for scipy.optimize.linear_sum_assignment (reference depends on
scipy, hbird/utils/eval_metrics.py:7). Shortest-augmenting-path
(Jonker-Volgenant) formulation, O(n^3); the assignment problems here are at
most ~151x151 (ADE20K classes) so no native kernel is warranted.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def hungarian(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Minimum-cost assignment; mirrors scipy's interface.

    Args:
        cost: (R, C) cost matrix (any finite floats).

    Returns:
        (row_ind, col_ind): arrays of length min(R, C); the assignment
        row_ind[i] -> col_ind[i] minimizes total cost. Rows are returned in
        sorted order like scipy.
    """
    cost = np.asarray(cost, dtype=np.float64)
    r, c = cost.shape
    transposed = r > c
    if transposed:
        cost = cost.T
        r, c = c, r
    # Now r <= c. Solve with shortest augmenting paths, one row at a time.
    INF = np.inf
    u = np.zeros(r + 1)  # row potentials
    v = np.zeros(c + 1)  # col potentials
    match = np.full(c + 1, -1, dtype=np.int64)  # col -> row (c is virtual col)

    for cur_row in range(r):
        # Dijkstra-like search from cur_row over columns.
        j_cur = c  # virtual column holding the unassigned row
        match[j_cur] = cur_row
        min_to = np.full(c + 1, INF)
        prev = np.full(c + 1, -1, dtype=np.int64)
        used = np.zeros(c + 1, dtype=bool)
        while match[j_cur] != -1:
            used[j_cur] = True
            i = match[j_cur]
            free = ~used[:c]
            cur = cost[i, :] - u[i] - v[:c]
            improve = free & (cur < min_to[:c])
            min_to[:c][improve] = cur[improve]
            prev[:c][improve] = j_cur
            masked = np.where(free, min_to[:c], INF)
            j_next = int(np.argmin(masked))
            delta = masked[j_next]
            used_all = used
            u[match[used_all]] += delta
            v[used_all] -= delta
            min_to[~used_all] -= delta
            j_cur = j_next
        # Augment along the path.
        while j_cur != c:
            j_prev = prev[j_cur]
            match[j_cur] = match[j_prev]
            j_cur = j_prev

    row_of_col = match[:c]
    row_ind = []
    col_ind = []
    for j in range(c):
        if row_of_col[j] != -1:
            row_ind.append(int(row_of_col[j]))
            col_ind.append(j)
    row_ind = np.asarray(row_ind, dtype=np.int64)
    col_ind = np.asarray(col_ind, dtype=np.int64)
    order = np.argsort(row_ind)
    row_ind, col_ind = row_ind[order], col_ind[order]
    if transposed:
        row_ind, col_ind = col_ind, row_ind
        order = np.argsort(row_ind)
        row_ind, col_ind = row_ind[order], col_ind[order]
    return row_ind, col_ind

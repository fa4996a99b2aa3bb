"""NumPy oracles for graph algorithms (re-derived, SURVEY.md §5).

The fixed-point oracle implements exactly the reference recurrence of
SURVEY.md §2a; the damped oracle is the standard PageRank power iteration
with dangling-mass redistribution.
"""

from __future__ import annotations

import numpy as np


def fixed_point_oracle(v: int, edges: np.ndarray, n_rounds: int, prec: int = 16) -> np.ndarray:
    """Reference-exact y_k (int64) after ``n_rounds`` compute rounds."""
    outdeg = np.zeros(v, dtype=np.int64)
    np.add.at(outdeg, edges[:, 0], 1)
    assert (outdeg > 0).all(), "oracle requires outdeg >= 1"
    indeg = np.zeros(v, dtype=np.int64)
    np.add.at(indeg, edges[:, 1], 1)

    init_val = (1 << prec) // v
    y = (indeg * init_val) // outdeg
    for _ in range(n_rounds - 1):
        s = np.zeros(v, dtype=np.int64)
        np.add.at(s, edges[:, 1], y[edges[:, 0]])
        y = s // outdeg
    return y


def damped_oracle(v: int, edges: np.ndarray, damping: float = 0.85, tol: float = 1e-9, max_iters: int = 100):
    """Damped PageRank with dangling-mass redistribution; returns (ranks, iters)."""
    outdeg = np.zeros(v, dtype=np.int64)
    np.add.at(outdeg, edges[:, 0], 1)
    r = np.full(v, 1.0 / v)
    for it in range(1, max_iters + 1):
        contrib = np.zeros(v)
        nonzero = outdeg[edges[:, 0]]
        np.add.at(contrib, edges[:, 1], r[edges[:, 0]] / nonzero)
        dangling = r[outdeg == 0].sum()
        new = (1 - damping) / v + damping * (contrib + dangling / v)
        l1 = np.abs(new - r).sum()
        r = new
        if l1 < tol:
            return r, it
    return r, max_iters


def weighted_damped_oracle(
    v: int, edges: np.ndarray, weights: np.ndarray,
    damping: float = 0.85, tol: float = 1e-9, max_iters: int = 100,
):
    """Edge-weighted damped PageRank: contributions rank*w/total_out_weight;
    vertices with no out-edges dangle. Returns (ranks, iters)."""
    wout = np.zeros(v)
    np.add.at(wout, edges[:, 0], weights)
    has_out = np.zeros(v, dtype=bool)
    has_out[edges[:, 0]] = True
    r = np.full(v, 1.0 / v)
    for it in range(1, max_iters + 1):
        contrib = np.zeros(v)
        np.add.at(contrib, edges[:, 1], r[edges[:, 0]] * weights / wout[edges[:, 0]])
        dangling = r[~has_out].sum()
        new = (1 - damping) / v + damping * (contrib + dangling / v)
        l1 = np.abs(new - r).sum()
        r = new
        if l1 < tol:
            return r, it
    return r, max_iters


def personalized_oracle(
    v: int, edges: np.ndarray, seeds: np.ndarray,
    damping: float = 0.85, tol: float = 1e-9, max_iters: int = 100,
):
    """Personalized PageRank: teleport + dangling mass land on the seed
    distribution; ranks start as the seed distribution. Returns (ranks, iters)."""
    outdeg = np.zeros(v, dtype=np.int64)
    np.add.at(outdeg, edges[:, 0], 1)
    t = np.zeros(v)
    t[seeds] = 1.0 / len(seeds)
    r = t.copy()
    for it in range(1, max_iters + 1):
        contrib = np.zeros(v)
        np.add.at(contrib, edges[:, 1], r[edges[:, 0]] / outdeg[edges[:, 0]])
        dangling = r[outdeg == 0].sum()
        new = (1 - damping) * t + damping * (contrib + dangling * t)
        l1 = np.abs(new - r).sum()
        r = new
        if l1 < tol:
            return r, it
    return r, max_iters


def weighted_personalized_oracle(
    v: int, edges: np.ndarray, weights: np.ndarray, seeds: np.ndarray,
    damping: float = 0.85, tol: float = 1e-9, max_iters: int = 100,
):
    """Weighted AND personalized PageRank composed: contributions are
    rank*w/total_out_weight, teleport + dangling mass land on the seed
    distribution, ranks start as the seed distribution."""
    wout = np.zeros(v)
    np.add.at(wout, edges[:, 0], weights)
    has_out = np.zeros(v, dtype=bool)
    has_out[edges[:, 0]] = True
    t = np.zeros(v)
    t[seeds] = 1.0 / len(seeds)
    r = t.copy()
    for it in range(1, max_iters + 1):
        contrib = np.zeros(v)
        np.add.at(contrib, edges[:, 1], r[edges[:, 0]] * weights / wout[edges[:, 0]])
        dangling = r[~has_out].sum()
        new = (1 - damping) * t + damping * (contrib + dangling * t)
        l1 = np.abs(new - r).sum()
        r = new
        if l1 < tol:
            return r, it
    return r, max_iters


def triangle_oracle(v: int, edges: np.ndarray) -> int:
    """Brute-force triangle count of the undirected simple projection."""
    adj = np.zeros((v, v), dtype=bool)
    for s, d in edges:
        if s != d:
            adj[s, d] = adj[d, s] = True
    count = 0
    for a in range(v):
        for b in range(a + 1, v):
            if adj[a, b]:
                for c in range(b + 1, v):
                    if adj[a, c] and adj[b, c]:
                        count += 1
    return count


def kcore_oracle(edges: np.ndarray, k: int, rounds: int | None = None) -> set[int]:
    """Synchronized-peel k-core: survivors after ``rounds`` peels (or the
    fixed point). Mirrors algos/kcore.py exactly."""
    sym = {(int(s), int(d)) for s, d in edges if s != d}
    sym |= {(d, s) for s, d in sym}
    cur = sym
    alive: set[int] = set()
    it = 0
    while True:
        it += 1
        deg: dict[int, int] = {}
        for s, _ in cur:
            deg[s] = deg.get(s, 0) + 1
        alive = {x for x, c in deg.items() if c >= k}
        nxt = {(s, d) for s, d in cur if s in alive and d in alive}
        done = nxt == cur
        cur = nxt
        if rounds is not None:
            if it >= rounds:
                return alive
        elif done:
            return alive


def components_oracle(v: int, edges: np.ndarray) -> np.ndarray:
    """Min-reachable-id labels via union-find."""
    parent = list(range(v))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return np.array([find(i) for i in range(v)], dtype=np.int64)

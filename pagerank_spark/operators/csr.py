"""CSR block encode/decode — parity with the reference memory layout.

The reference stores the graph as CSR over in-edges: a vertex array of
``(ie_offset, out_degree)`` u64 pairs plus a flat in-edge array of source
ids grouped by destination (README:1-10, graphgen.cpp:42-66). The kernel
recovers in-degrees by differencing consecutive offsets (pagerank.v:1031)
with first/last special cases (pagerank.v:1011-1029).

The engine never persists this layout (Parquet replaces bespoke binary
images — SURVEY.md S3), but the same structure is built *in memory, per
partition* as NumPy arrays for the Arrow gather-scatter kernel. This module
is that builder plus a decoder used by layout round-trip tests against the
decoded ``graphgen 6 10`` fixture (FIXTURES.md §4).
"""

from __future__ import annotations

import numpy as np


def build_csr_inedges(edges: np.ndarray, n_vertices: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the reference CSR-over-in-edges layout from an (E,2) edge array.

    Returns ``(ie_offsets, out_degrees, in_edge_srcs)``:
      - ``ie_offsets[v]``: prefix-sum offset of v's in-edge list (the
        reference's vertex word 0 — an offset, NOT a count; SURVEY.md §1)
      - ``out_degrees[v]``: precomputed out-degree (vertex word 1)
      - ``in_edge_srcs``: source ids grouped by destination, destinations in
        ascending order, sources in ascending order within a group (the
        generator emits insertion order; ordering within a group does not
        affect any computed result — integer sums commute)
    """
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    out_degrees = np.bincount(src, minlength=n_vertices).astype(np.int64)
    in_degrees = np.bincount(dst, minlength=n_vertices).astype(np.int64)
    ie_offsets = np.concatenate([[0], np.cumsum(in_degrees)[:-1]]).astype(np.int64)
    order = np.lexsort((src, dst))
    return ie_offsets, out_degrees, src[order]


def decode_csr_inedges(ie_offsets: np.ndarray, in_edge_srcs: np.ndarray) -> np.ndarray:
    """Recover the (E,2) edge array from the CSR layout — the engine-side
    equivalent of the kernel's offset-differencing in-degree recovery
    (pagerank.v:1011-1033: indeg[v] = offsets[v+1] - offsets[v], last vertex
    uses n_inedges)."""
    n = len(ie_offsets)
    total = len(in_edge_srcs)
    bounds = np.concatenate([ie_offsets, [total]])
    out = []
    for v in range(n):
        for s in in_edge_srcs[bounds[v]: bounds[v + 1]]:
            out.append((s, v))
    return np.asarray(out, dtype=np.int64).reshape(-1, 2)

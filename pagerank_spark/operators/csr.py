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


def encode_hex_image(edges: np.ndarray, n_vertices: int) -> str:
    """Emit the reference's hex memory image (graphgen.cpp:9-17, 42-77).

    Format (verified against the compiled reference tool's output for
    ``graphgen 6 10``): 16-hex-digit uppercase words, 8 words per
    newline-terminated 128-char line (= one 512-bit memory line); sequence is
    the vertex array of (ie_offset, out_degree) pairs, zero-padding to a
    64-byte boundary, the in-edge source array grouped by destination,
    2*V zero words (the two rank buffers), and final zero-padding WITHOUT a
    trailing newline (a reference quirk, mirrored). Values are truncated to
    their low 32 bits exactly like the reference's ``(uint32_t)`` cast
    (graphgen.cpp:16; latent-overflow behavior documented in SURVEY.md §8).

    Within an in-edge group the reference iterates an unordered_set
    (platform-dependent order); this encoder uses ascending source order —
    a semantically identical image (group membership, not order, defines
    the graph; integer sums commute).
    """
    ie_offsets, out_degrees, srcs = build_csr_inedges(edges, n_vertices)
    words: list[int] = []
    for v in range(n_vertices):
        words.append(int(ie_offsets[v]))
        words.append(int(out_degrees[v]))
    while len(words) % 8:
        words.append(0)
    words.extend(int(s) for s in srcs)
    words.extend([0] * (2 * n_vertices))
    n_final_pad = (-len(words)) % 8
    out = []
    for i, w in enumerate(words):
        out.append(f"{w & 0xFFFFFFFF:016X}")
        if i % 8 == 7:
            out.append("\n")
    out.extend(["0" * 16] * n_final_pad)  # final pad: bare words, no newline
    return "".join(out)


def decode_hex_image(text: str, n_vertices: int, n_inedges: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a reference hex image back to ``(ie_offsets, out_degrees,
    in_edge_srcs)`` — accepts images from the reference tool or from
    :func:`encode_hex_image`."""
    flat = text.replace("\n", "")
    if len(flat) % 16:
        raise ValueError("hex image length not a multiple of 16-hex words")
    words = np.array([int(flat[i : i + 16], 16) for i in range(0, len(flat), 16)], dtype=np.int64)
    vert = words[: 2 * n_vertices]
    ie_offsets = vert[0::2].copy()
    out_degrees = vert[1::2].copy()
    ie_start = 2 * n_vertices + ((-2 * n_vertices) % 8)
    srcs = words[ie_start : ie_start + n_inedges].copy()
    return ie_offsets, out_degrees, srcs


def reference_params(n_vertices: int, n_inedges: int) -> dict[str, int]:
    """The reference's params.txt address map (graphgen.cpp:80-93), with its
    waddr1 bug reproduced verbatim for parity plus the corrected value:
    ``waddr1`` as emitted is ``ieaddr + 8*V`` which overlaps the in-edge
    array whenever E > V (SURVEY.md §8 [verified]); ``waddr1_correct``
    is ``waddr0 + 8*V`` (what input_data.json and pr_top.v actually use).
    """
    vbytes = 16 * n_vertices
    ieaddr = vbytes if vbytes % 64 == 0 else vbytes + (64 - vbytes % 64)
    waddr0 = ieaddr + 8 * n_inedges
    return {
        "n_vert": n_vertices,
        "n_inedges": n_inedges,
        "vaddr": 0,
        "ieaddr": ieaddr,
        "waddr0": waddr0,
        "waddr1": ieaddr + 8 * n_vertices,
        "waddr1_correct": waddr0 + 8 * n_vertices,
    }


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

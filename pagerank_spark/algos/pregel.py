"""Generic vertex-centric superstep engine (Pregel) + aggregateMessages.

The specialized kernels in this package (:mod:`.pagerank`,
:mod:`.components`, :mod:`.labelprop`, ...) are hand-tuned instances of one
pattern: *gather messages along edges, aggregate per vertex, update state,
repeat*. This module exposes that pattern as a first-class API — the Spark
analogue of Pregel (Malewicz et al., SIGMOD'10) / GraphX ``aggregateMessages``
/ GraphFrames ``Pregel`` — so users can express a new iterative graph
algorithm declaratively without writing a superstep loop. The engine parity
is gated: ``pregel_pagerank_events_k3`` / ``pregel_cc_copurchase`` reproduce
the specialized kernels' oracle outputs exactly.

Expression namespace (all plain Catalyst columns — no Python in the loop):

* :func:`src` / :func:`dst` / :func:`edge` — attribute accessors inside
  message expressions (like GraphFrames ``Pregel.src/dst/edge``).
* :func:`msg` — the aggregated inbound message inside ``update``
  expressions (NULL for vertices that received nothing).
* :func:`global_agg` — a named one-row aggregate over the *previous* state
  (Pregel's global aggregators): computed lazily and cross-joined into the
  plan as a one-row broadcast, never a driver action — the same in-plan
  scalar trick the PageRank kernel uses for dangling mass.

Scale shape (the 100-TB story, inherited from the tuned kernels):

* edges are hash-partitioned ONCE per flow direction and persisted; every
  superstep's gather join reuses that layout,
* state is ``(id, <cols>)`` repartitioned by id; both hot joins carry
  ``shuffle_hash`` hints (iterated joins must not SMJ-sort per superstep),
* lineage is truncated with a lazy ``localCheckpoint`` every
  ``check_every`` supersteps — exactly ONE action per block (the
  convergence check), per SCALING_NOTES discipline,
* convergence = "no vertex changed in the last superstep of the block",
  evaluated as a null-safe comparison between each updated column and its
  in-state previous copy — no extra join, no second action.

Reference parity: the reference accelerator hard-wires one Pregel instance
(rank gather/sum/divide, pagerank.v:1039-1095); this is the general form.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "src", "dst", "edge", "msg", "global_agg",
    "aggregate_messages", "pregel", "PregelResult",
]

_SRC = "__pregel_src__"
_DST = "__pregel_dst__"
_EDGE = "__pregel_edge__"
_AGG = "__pregel_agg__"


def src(name: str) -> Column:
    """Attribute of the edge's source vertex, inside a message expression."""
    return F.col(_SRC + name)


def dst(name: str) -> Column:
    """Attribute of the edge's destination vertex, inside a message expression."""
    return F.col(_DST + name)


def edge(name: str) -> Column:
    """Attribute of the edge itself, inside a message expression."""
    return F.col(_EDGE + name)


def msg() -> Column:
    """The aggregated inbound message, inside ``agg``/``update`` expressions
    (NULL for vertices that received nothing). A function, not a module
    constant: building a Column needs an active SparkContext."""
    return F.col("__pregel_msg__")


def global_agg(name: str) -> Column:
    """The value of the named ``global_aggs`` entry (over the previous
    state), inside an update expression."""
    return F.col(_AGG + name)


def _refs(expr: Column, prefix: str) -> bool:
    return prefix in str(expr._jc)  # noqa: SLF001 — Catalyst expr string


def _triplet_msgs(
    edges_p: DataFrame, state: DataFrame, m: Column, to: str, state_cols: list[str]
) -> DataFrame:
    """One message leg: join the referenced vertex side(s) onto the edge
    layout, emit ``(__to, __m)``. Joins ONLY the sides the expression
    actually references — the common src-only gather stays single-join."""
    t = edges_p
    if _refs(m, _SRC):
        s = state.select(
            F.col("id").alias("__sid"), *[F.col(c).alias(_SRC + c) for c in state_cols]
        )
        t = t.join(s.hint("shuffle_hash"), t["src"] == F.col("__sid"), "inner")
    if _refs(m, _DST):
        s = state.select(
            F.col("id").alias("__did"), *[F.col(c).alias(_DST + c) for c in state_cols]
        )
        t = t.join(s.hint("shuffle_hash"), t["dst"] == F.col("__did"), "inner")
    # the raw message carries the same name the aggregate references
    return t.select(F.col(to).alias("__to"), m.alias("__pregel_msg__"))


def aggregate_messages(
    vertices: DataFrame,
    edges: DataFrame,
    agg: Column,
    msg_to_dst: Column | None = None,
    msg_to_src: Column | None = None,
) -> DataFrame:
    """One round of gather: returns ``(id, __pregel_msg__)`` for every vertex
    that received at least one message (GraphX ``aggregateMessages``).

    ``agg`` aggregates :func:`msg` (e.g. ``F.sum(msg())``); message
    expressions use :func:`src`/:func:`dst`/:func:`edge` accessors. Edge
    attribute columns are read as-is off ``edges`` — reference them with
    :func:`edge` for clarity (it resolves post-rename) or plain names.
    """
    if msg_to_dst is None and msg_to_src is None:
        raise ValueError("at least one of msg_to_dst / msg_to_src is required")
    state_cols = [c for c in vertices.columns if c != "id"]
    ecols = [c for c in edges.columns]
    e = edges.select(
        "src", "dst", *[F.col(c).alias(_EDGE + c) for c in ecols if c not in ("src", "dst")]
    )
    legs = []
    if msg_to_dst is not None:
        legs.append(_triplet_msgs(e, vertices, msg_to_dst, "dst", state_cols))
    if msg_to_src is not None:
        legs.append(_triplet_msgs(e, vertices, msg_to_src, "src", state_cols))
    msgs = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
    return msgs.groupBy("__to").agg(agg.alias("__pregel_msg__")).select(
        F.col("__to").alias("id"), "__pregel_msg__"
    )


@dataclass
class PregelResult:
    vertices: DataFrame
    iterations: int
    converged: bool
    metrics: list = field(default_factory=list)


def pregel(
    vertices: DataFrame,
    edges: DataFrame,
    init: dict[str, Column],
    update: dict[str, Column],
    agg: Column,
    msg_to_dst: Column | None = None,
    msg_to_src: Column | None = None,
    max_iters: int = 20,
    check_every: int = 4,
    until_converged: bool = False,
    global_aggs: dict[str, Column] | None = None,
    num_partitions: int | None = None,
) -> PregelResult:
    """Run a synchronous vertex program to ``max_iters`` supersteps (or to
    the all-vertices-unchanged fixpoint when ``until_converged``).

    ``init`` defines the state columns from the ``vertices`` frame's
    columns; ``update`` redefines any subset of them per superstep from the
    previous state plus :func:`msg` (aggregated inbound message, NULL when
    none) plus :func:`global_agg` scalars; columns not in ``update`` are
    carried unchanged (static attributes ride along free).
    """
    if not init or not update:
        raise ValueError("init and update must be non-empty")
    if any(k not in init for k in update):
        raise ValueError("update keys must be a subset of init keys")
    spark = vertices.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    ecols = [c for c in edges.columns if c not in ("src", "dst")]
    e = edges.select("src", "dst", *[F.col(c).alias(_EDGE + c) for c in ecols])
    # one persisted layout per flow direction; the gather join below keys on
    # the message-SENDING side, so partition by it
    e_by_src = e_by_dst = None
    if msg_to_dst is not None:
        e_by_src = e.repartition(p, "src").localCheckpoint(eager=False)
    if msg_to_src is not None:
        e_by_dst = e.repartition(p, "dst").localCheckpoint(eager=False)

    state_cols = list(init)
    upd_cols = list(update)
    state = (
        vertices.select("id", *[v.alias(k) for k, v in init.items()])
        .repartition(p, "id")
        .localCheckpoint(eager=False)
    )
    state.count()

    def superstep(st: DataFrame) -> DataFrame:
        legs = []
        if msg_to_dst is not None:
            legs.append(_triplet_msgs(e_by_src, st, msg_to_dst, "dst", state_cols))
        if msg_to_src is not None:
            legs.append(_triplet_msgs(e_by_dst, st, msg_to_src, "src", state_cols))
        msgs = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
        inbox = msgs.groupBy("__to").agg(agg.alias("__pregel_msg__"))
        out = st.join(inbox.hint("shuffle_hash"), st["id"] == F.col("__to"), "left")
        for name, gexpr in (global_aggs or {}).items():
            # lazy one-row aggregate over the PREVIOUS state — lands in the
            # plan as a one-row broadcast (the dangling-mass trick)
            out = out.crossJoin(st.agg(gexpr.alias(_AGG + name)))
        cols = [st["id"]]
        for c in state_cols:
            cols.append(update[c].alias(c) if c in update else st[c])
        # previous copies of the updated columns ride in-state so the block
        # action can evaluate "changed?" without a second join
        cols += [st[c].alias("__prev__" + c) for c in upd_cols]
        return out.select(*cols)

    it, converged = 0, False
    result = PregelResult(vertices=state, iterations=0, converged=False)
    changed_expr = F.sum(
        F.when(
            F.lit(False) | F.expr(
                " OR ".join(f"NOT (`{c}` <=> `__prev__{c}`)" for c in upd_cols)
            ),
            1,
        ).otherwise(0)
    ).alias("__chg")
    while it < max_iters:
        block = min(check_every, max_iters - it)
        new_state = state
        intermediates = []
        for i in range(block):
            new_state = superstep(new_state)
            if i < block - 1:
                new_state = new_state.persist()
                intermediates.append(new_state)
        new_state = new_state.localCheckpoint(eager=False)
        row = new_state.agg(changed_expr).first()
        changed = int(row["__chg"] or 0)
        for df in intermediates:
            df.unpersist()
        # the __prev__ columns ride into the next block's state unused
        # (superstep projects only id + state_cols) — no extra checkpoint
        state = new_state
        it += block
        result.metrics.append({"superstep": it, "changed_last": changed})
        if until_converged and changed == 0:
            converged = True
            break
    result.vertices = state.select("id", *state_cols)
    result.iterations = it
    result.converged = converged
    return result

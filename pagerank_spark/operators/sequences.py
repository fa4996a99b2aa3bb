"""Event-sequence analytics: per-key state-transition (Markov) matrices.

A behavioral-modeling / feature-engineering primitive: given an event log
keyed by an entity, estimate the first-order transition probabilities
between event states along each entity's time-ordered sequence. One window
pass (lead over the per-key order) + one grouped count + one row-normalize
window — no UDFs, no iteration.

100-TB shape: both the lead window and the count shuffle on bounded keys
(entity id, then state pair); state vocabularies are tiny, so the
normalization window over ``src`` is a broadcast-sized relation. The order
is made TOTAL with an explicit tiebreak column — relying on timestamp order
alone makes the transition counts nondeterministic under equal timestamps
(retries/repartitioning would flip results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """``(src, dst, n, prob)`` — transition counts and row-normalized
    probabilities over consecutive states per key, ordered by
    ``(ts, tiebreak)``."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    steps = events.select(
        F.col(state_col).alias("src"),
        F.lead(state_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = steps.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy("src")
    return counts.select(
        "src", "dst", "n",
        F.round(F.col("n") / F.sum("n").over(total), 6).alias("prob"),
    )


def context_windows(
    events: DataFrame,
    n: int = 3,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    min_context: int = 1,
    sep: str = " ",
) -> DataFrame:
    """Supervised next-item example extraction: for every element of each
    key's time-ordered sequence, emit the previous ``n`` items joined as
    the context and the element itself as the target — the
    (context, response) pair shape an SFT/next-event-prediction dataset is
    built from. On transcripts, ``key_col='conv_id', state_col='text',
    ts_col='turn_idx'`` turns each conversation into per-turn training
    examples with bounded context.

    Returns ``(key_col, tiebreak_col, n_context, context, target)``; rows
    with fewer than ``min_context`` predecessors are dropped (the
    conversation opener predicts from nothing).

    Determinism + scale: ONE window pass, partitioned by the conversation
    key with a total order (``ts, tiebreak``) — ``collect_list`` over an
    ordered frame is processed in frame order, so the context string is
    deterministic under any partitioning. Context width is capped at ``n``
    items, so row size is bounded no matter how long a conversation runs;
    the only shuffle is the per-key window sort.
    """
    if n < 1:
        raise ValueError(f"context width n must be >= 1, got {n}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(-n, -1)
    )
    ctx = F.collect_list(F.col(state_col).cast("string")).over(w)
    return (
        events.select(
            F.col(key_col),
            F.col(tiebreak_col),
            ctx.alias("_ctx"),
            F.col(state_col).cast("string").alias("target"),
        )
        .filter(F.size("_ctx") >= min_context)
        .select(
            key_col,
            tiebreak_col,
            F.size("_ctx").alias("n_context"),
            F.array_join("_ctx", sep).alias("context"),
            "target",
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel analysis: how many keys performed ``steps[0]``, then
    ``steps[1]`` strictly after it, then ``steps[2]`` after that, ... —
    the product-analytics conversion query.

    Returns ``(step_idx, step, n_keys)`` with ``n_keys`` monotonically
    non-increasing. Order is made TOTAL by ``(ts, tiebreak)`` — each
    event's position is its ``row_number`` in the key's sequence, so equal
    timestamps can't flip a conversion under repartitioning, and all
    comparisons are exact integers.

    Scale shape: ONE window pass assigns positions, then one grouped MIN +
    one same-key join per funnel step — every shuffle is on the key
    column, so AQE collapses the chain onto a single exchange; per-step
    state is one BIGINT per surviving key.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    seq = events.select(
        F.col(key_col).alias("k"),
        F.col(state_col).alias("st"),
        F.row_number().over(w).alias("pos"),
    ).localCheckpoint(eager=False)

    reached = None  # (k, p): position at which the prefix completed
    counts = []
    for i, step in enumerate(steps):
        cand = seq.filter(F.col("st") == step)
        if reached is None:
            cur = cand.groupBy("k").agg(F.min("pos").alias("p"))
        else:
            cur = (
                cand.join(reached.withColumnRenamed("p", "prev"), "k")
                .filter(F.col("pos") > F.col("prev"))
                .groupBy("k")
                .agg(F.min("pos").alias("p"))
            )
        reached = cur
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("n_keys")).select(
                F.lit(i).alias("step_idx"), F.lit(step).alias("step"), "n_keys"
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 604800,
) -> DataFrame:
    """Cohort retention table: keys grouped by the time bucket of their
    FIRST event (the cohort), counted as active per bucket offset since —
    ``(cohort, offset, n_active)``, all exact integers (buckets are
    ``floor(epoch / bucket_seconds)``, default weekly).

    Scale shape: one grouped MIN (first-seen bucket), one same-key join
    back, one distinct count per (cohort, offset) — the first two shuffle
    on the key, the last on the small (cohort, offset) pair; no windows,
    no Python.
    """
    b = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)).cast("long")
    ev = events.select(F.col(key_col).alias("k"), b.alias("bucket"))
    first = ev.groupBy("k").agg(F.min("bucket").alias("cohort"))
    return (
        ev.join(first, "k")
        .groupBy("cohort", (F.col("bucket") - F.col("cohort")).alias("offset"))
        .agg(F.countDistinct("k").alias("n_active"))
    )


def attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_seconds: int = 604800,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Multi-touch conversion attribution: for every conversion event,
    credit the touch events of the same key that strictly precede it
    within the lookback window. Returns one row per channel (touch type,
    plus ``(direct)`` for conversions with no preceding touch):
    ``(channel, conversions_last, linear_micro, n_touchpoints)`` —
    last-touch conversion counts (latest ``(ts, tiebreak)`` touch wins),
    linear credit in exact integer micro-units (``1000000 DIV n`` per
    touch — pure integer division, no float anywhere), and raw touchpoint
    counts. ``sum(conversions_last)`` equals the total conversion count.

    Scale shape: one equi-join on the key with a band predicate (the
    planner prunes by key, the band filters in the join), then windows
    partitioned BY CONVERSION — width bounded by touches-per-lookback,
    never corpus-sized — then a channel-sized aggregate. No Python.
    """
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(key_col).alias("k"),
        F.col(tiebreak_col).alias("conv_id"),
        F.col(ts_col).alias("cts"),
    )
    touch = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(key_col).alias("k"),
        F.col(tiebreak_col).alias("tid"),
        F.col(ts_col).alias("tts"),
        F.col(type_col).alias("channel"),
    )
    pairs = conv.join(
        touch,
        [
            conv["k"] == touch["k"],
            touch["tts"] < conv["cts"],
            touch["tts"] >= conv["cts"] - F.expr(f"INTERVAL {int(lookback_seconds)} SECOND"),
        ],
        "left",
    ).select("conv_id", "tid", "tts", "channel")
    wc = Window.partitionBy("conv_id")
    wr = Window.partitionBy("conv_id").orderBy(
        F.col("tts").desc(), F.col("tid").desc()
    )
    scored = pairs.select(
        F.coalesce(F.col("channel"), F.lit("(direct)")).alias("channel"),
        F.col("tid").isNotNull().alias("touched"),
        (F.row_number().over(wr) == 1).alias("is_last"),
        F.count("tid").over(wc).alias("n"),
    )
    return scored.groupBy("channel").agg(
        F.sum(F.when(F.col("is_last"), 1).otherwise(0)).alias("conversions_last"),
        F.sum(
            F.when(F.col("touched"), F.expr("1000000 DIV n")).otherwise(
                F.lit(1000000)
            )
        ).alias("linear_micro"),
        F.sum(F.col("touched").cast("long")).alias("n_touchpoints"),
    )


def streaks(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Consecutive-run (gaps-and-islands) statistics per (key, type):
    longest streak, number of streaks, total events — the retry-loop /
    repeated-action detector (e.g. an agent stuck re-invoking the same
    tool across consecutive turns).

    Classic islands trick: in the per-key (ts, tiebreak) total order,
    ``row_number over key  -  row_number over (key, type)`` is constant
    exactly within a maximal run of the same type, so one groupBy on that
    difference materializes the runs. Both windows are KEYED (partitioned
    by user) — per-key history bounded, no global window, and the two
    row_numbers share one shuffle + sort of the events scan.

    Returns ``(key_col, type_col, max_streak, n_streaks, n_events)``.
    """
    w_all = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    w_typ = Window.partitionBy(key_col, type_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    runs = (
        events.withColumn("__isl", F.row_number().over(w_all) - F.row_number().over(w_typ))
        .groupBy(key_col, type_col, "__isl")
        .agg(F.count(F.lit(1)).alias("__len"))
    )
    return runs.groupBy(key_col, type_col).agg(
        F.max("__len").alias("max_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("__len").alias("n_events"),
    )


def absorption_steps(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    absorbing: str = "purchase",
    k_iters: int = 25,
) -> DataFrame:
    """k-truncated expected steps to absorption per transient state — the
    absorbing-Markov-chain read of a user journey ("from a 'view', how
    many events until 'purchase'?"), computed as the truncated power
    series ``x_{t+1} = 1 + Q x_t`` (x_0 = 0) instead of the matrix
    inverse so BOTH engines can replay the identical finite double
    sequence (the exact ``(I-Q)^{-1} 1`` is the k -> inf limit; with
    absorption probability 1 the truncation error decays geometrically).

    The distributed work is the ONE scan building transition counts
    (consecutive states per key in (ts, tiebreak) order — same
    convention as :func:`transition_matrix`); the iteration then runs
    over the states-sized table (|states| rows, a metadata-scale frame)
    with per-edge probability ``n / rowtotal`` as the same correctly-
    rounded division on both engines. States whose row never reaches
    absorption simply accumulate toward k (the truncation is the
    documented semantics).

    Returns ``(state, n_out, x_micro)`` — x floor-scaled once;
    ``n_out`` = total outgoing transitions (exact BIGINT).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    steps = events.select(
        F.col(state_col).alias("src"),
        F.lead(state_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = steps.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("src").agg(F.sum("n").alias("rt"))
    q = (
        counts.join(tot, "src")
        .filter(F.col("src") != F.lit(absorbing))
        .select("src", "dst", "n", "rt")
        .localCheckpoint()  # the tiny transient-row table the loop re-reads
    )
    states = q.select(F.col("src").alias("state")).dropDuplicates().localCheckpoint()
    x = states.select("state", F.lit(0.0).alias("x"))
    for _ in range(int(k_iters)):
        gathered = (
            q.join(
                x.select(F.col("state").alias("dst"), F.col("x").alias("__xd")),
                "dst",
                "left",  # edges into the absorbing state (or non-transient dst) gather 0
            )
            .groupBy("src")
            .agg(
                F.sum(
                    F.col("n") / F.col("rt") * F.coalesce(F.col("__xd"), F.lit(0.0))
                ).alias("__g")
            )
        )
        x = (
            states.join(gathered.withColumnRenamed("src", "state"), "state", "left")
            .select(
                "state",
                (F.lit(1.0) + F.coalesce(F.col("__g"), F.lit(0.0))).alias("x"),
            )
            .localCheckpoint()  # states-sized; keeps the 25-deep plan flat
        )
    n_out = q.groupBy(F.col("src").alias("state")).agg(F.max("rt").alias("n_out"))
    return n_out.join(x, "state").select(
        "state",
        F.col("n_out").cast("long").alias("n_out"),
        F.floor(F.col("x") * F.lit(1_000_000) + F.lit(0.5)).cast("long").alias("x_micro"),
    )


def bounded_balance(
    events: DataFrame,
    key_col: str,
    delta_col,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    cap: int = 20000,
    floor_val: int = 0,
) -> DataFrame:
    """Clamped running balance per key — the inventory / credit-ledger /
    token-bucket primitive: fold ``bal' = clamp(bal + delta, floor, cap)``
    over the key's (ts, tiebreak)-ordered integer deltas, counting how
    often each bound clipped. NON-associative (clamping destroys
    reassociativity), so no window/scan can express it — it is the
    canonical per-key sequential fold, same scale shape as ewma/holt: one
    map-side-combined sorted collect per key, a codegen'd aggregate lambda
    over the key's own bounded series, exact BIGINT end-to-end.

    ``delta_col`` may be a Column expression (cast to BIGINT). Returns
    ``(key_col, n_events, balance, n_clip_hi, n_clip_lo)``; the start
    balance is ``floor_val``. Every new-state field reads only the OLD
    accumulator (the repo's expanded-form fold discipline), so the
    recursive-CTE oracle replays it exactly.
    """
    if cap <= floor_val:
        raise ValueError("cap must exceed floor_val")
    d = (delta_col if not isinstance(delta_col, str) else F.col(delta_col)).cast("long")
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rows = events.select(
        F.col(key_col).alias("k"),
        F.struct(
            sec.alias("s"),
            F.col(tiebreak_col).cast("long").alias("tb"),
            d.alias("d"),
        ).alias("o"),
    )
    per_key = rows.groupBy("k").agg(
        F.sort_array(F.collect_list("o")).alias("arr"),
        F.count(F.lit(1)).alias("n_events"),
    )
    raw = "acc.bal + x.d"
    fold = F.expr(
        f"aggregate(arr, "
        f"named_struct('bal', CAST({floor_val} AS BIGINT), "
        f"'hi', CAST(0 AS BIGINT), 'lo', CAST(0 AS BIGINT)), "
        f"(acc, x) -> named_struct("
        f"'bal', greatest(CAST({floor_val} AS BIGINT), least(CAST({cap} AS BIGINT), {raw})), "
        f"'hi', acc.hi + CAST({raw} > {cap} AS BIGINT), "
        f"'lo', acc.lo + CAST({raw} < {floor_val} AS BIGINT)))"
    ).alias("st")
    return per_key.select(F.col("k"), "n_events", fold).select(
        F.col("k").alias(key_col),
        "n_events",
        F.col("st.bal").alias("balance"),
        F.col("st.hi").alias("n_clip_hi"),
        F.col("st.lo").alias("n_clip_lo"),
    )


def sft_pairs(transcripts: DataFrame) -> DataFrame:
    """Extract supervised fine-tuning (prompt, response) examples from a
    transcripts table: every user turn immediately followed (by turn
    order) by an assistant turn in the same conversation — the standard
    instruction-mining step a training-data pipeline runs over agent
    transcripts before packing (operators/packing.py).

    One keyed window (lead) over ``(conv_id) ORDER BY turn_idx`` — a
    single hash shuffle on the conversation key; no joins, no Python.
    Returns ``(conv_id, prompt_turn, prompt, response)``.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.lead("role").over(w).alias("__nr"),
            F.lead("text").over(w).alias("__nt"),
        )
        .filter((F.col("role") == "user") & (F.col("__nr") == "assistant"))
        .select(
            "conv_id",
            F.col("turn_idx").alias("prompt_turn"),
            F.col("text").alias("prompt"),
            F.col("__nt").alias("response"),
        )
    )


def transcript_lint(transcripts: DataFrame) -> DataFrame:
    """Per-conversation structural QA over a transcripts table — the data
    contract a transcript-analytics pipeline checks before deriving edges
    (operators/edges.py): turn-index gaps break reply derivation, orphan
    tool turns break invocation linking, same-role runs flag merge/split
    bugs upstream.

    One keyed window pass (lag over ``(conv_id) ORDER BY turn_idx``) + one
    grouped aggregate; all outputs exact integers. Returns per conversation:
    ``(conv_id, n_turns, n_user, n_assistant, n_tool, n_idx_gaps,
    n_same_role_adjacent, n_orphan_tools)`` where an orphan tool turn is a
    ``role='tool'`` row with no earlier assistant turn carrying the same
    tool name in its conversation.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_tool = (
        Window.partitionBy("conv_id", "tool")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        F.lag("turn_idx").over(w).alias("__pi"),
        F.lag("role").over(w).alias("__pr"),
        F.last(
            F.when(F.col("role") == "assistant", F.lit(1)), ignorenulls=True
        ).over(w_tool).alias("__seen_inv"),
    )
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).cast("long").alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).cast("long").alias("n_assistant"),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).cast("long").alias("n_tool"),
        F.sum(
            F.when(F.col("__pi").isNotNull() & (F.col("turn_idx") != F.col("__pi") + 1), 1).otherwise(0)
        ).cast("long").alias("n_idx_gaps"),
        F.sum(
            F.when(F.col("__pr").isNotNull() & (F.col("role") == F.col("__pr")), 1).otherwise(0)
        ).cast("long").alias("n_same_role_adjacent"),
        F.sum(
            F.when((F.col("role") == "tool") & F.col("__seen_inv").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_orphan_tools"),
    )


def role_mixing(transcripts: DataFrame) -> DataFrame:
    """Newman mixing matrix over the transcript reply relation: counts of
    (replier role -> replied-to role) adjacent-turn pairs — the categorical
    assortativity summary ("who talks after whom") of the conversation
    graph. One lag window + one grouped count, exact integers. Returns
    ``(role_src, role_dst, n_pairs)``.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.select(
            F.col("role").alias("role_src"),
            F.lag("role").over(w).alias("role_dst"),
        )
        .filter(F.col("role_dst").isNotNull())
        .groupBy("role_src", "role_dst")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def tool_latency(transcripts: DataFrame) -> DataFrame:
    """Per-tool response-latency profile over a transcripts table: for every
    tool-result turn (``role='tool'``), latency = its timestamp minus the
    immediately preceding turn's (the invoking assistant). The SLO summary
    an agent-platform pipeline computes before deciding which tool traces
    to keep (slow tools correlate with truncated / retried trajectories).

    One lag window on the conversation key + one grouped aggregate; all
    outputs exact BIGINT microseconds (``unix_micros`` both engines — no
    float seconds anywhere). Returns per tool:
    ``(tool, n_results, total_latency_us, max_latency_us)``.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
        ).alias("__lat"),
    )
    return (
        t.filter((F.col("role") == "tool") & F.col("__lat").isNotNull())
        .groupBy("tool")
        .agg(
            F.count(F.lit(1)).alias("n_results"),
            F.sum("__lat").cast("long").alias("total_latency_us"),
            F.max("__lat").cast("long").alias("max_latency_us"),
        )
    )


def agent_loops(transcripts: DataFrame, min_len: int = 2) -> DataFrame:
    """Stuck-agent detection: maximal runs of CONSECUTIVE tool invocations
    of the same tool within a conversation (assistant turns carrying a tool
    name, ordered by turn). An agent re-invoking the same tool k times in a
    row is the classic retry-loop signature — curation pipelines drop or
    down-weight such trajectories before SFT mining.

    Gaps-and-islands with two row_number windows on the conversation key
    (``rn_all - rn_per_tool`` is constant within a run) + one grouped
    aggregate — no joins, no Python. Returns runs with length >=
    ``min_len``: ``(conv_id, tool, run_len, start_turn)``.
    """
    inv = transcripts.filter((F.col("role") == "assistant") & F.col("tool").isNotNull())
    w_all = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_tool = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    grp = inv.select(
        "conv_id",
        "tool",
        "turn_idx",
        (F.row_number().over(w_all) - F.row_number().over(w_tool)).alias("__g"),
    )
    return (
        grp.groupBy("conv_id", "tool", "__g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.min("turn_idx").alias("start_turn"),
        )
        .filter(F.col("run_len") >= min_len)
        .select("conv_id", "tool", "run_len", "start_turn")
    )


def conv_shapes(transcripts: DataFrame) -> DataFrame:
    """Conversation-shape fingerprinting: the interaction template of a
    conversation is the turn-ordered string of ``role[:tool]`` tokens;
    conversations sharing a template are structurally identical
    trajectories — the conversation-level analogue of exact text dedup
    (operators/dedup.py), used to cap over-represented agent flows before
    sampling.

    One grouped array_sort-of-structs aggregate builds the fingerprint
    (order carried by ``turn_idx`` inside the struct — NOT collect order,
    which is partitioning-dependent), then one count per shape. Returns
    ``(shape, n_convs, rep_conv)`` with the lexicographically smallest
    conversation id as the deterministic group representative.
    """
    tok = F.concat_ws(":", F.col("role"), F.coalesce(F.col("tool"), F.lit("-")))
    shapes = transcripts.groupBy("conv_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("turn_idx"), tok.alias("tok")))),
                lambda s: s["tok"],
            ),
        ).alias("shape")
    )
    return shapes.groupBy("shape").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.min("conv_id").alias("rep_conv"),
    )


def template_prefixes(
    transcripts: DataFrame, min_support: int = 2, max_depth: int = 16
) -> DataFrame:
    """Shared-prefix template mining: for each conversation, the LONGEST
    turn-ordered ``role[:tool]`` prefix that at least ``min_support``
    conversations share — the agent-ops signal behind "these 400
    conversations all start with the same templated greeting/tool dance"
    (boilerplate-flow detection; the prefix analogue of
    :func:`conv_shapes`, which needs the WHOLE trajectory to match).

    Shape: one grouped order-carried aggregate builds each conversation's
    token array (same discipline as conv_shapes — order from ``turn_idx``
    structs, never collect order); one explode emits the conversation's
    prefixes at depths 1..``max_depth``; one map-side-combined count gives
    per-prefix support; one keyed struct-max picks each conversation's
    deepest qualifying prefix. ``max_depth`` bounds the explode at
    O(depth²) chars per conversation — templates are short by nature, and
    an unbounded prefix lattice over million-turn transcripts is exactly
    the quadratic blowup the cap exists to refuse.

    Returns ``(conv_id, n_turns, tpl_len, template)``; conversations whose
    every prefix is rarer than ``min_support`` get ``(0, '')``.
    """
    if min_support < 1 or max_depth < 1:
        raise ValueError("min_support and max_depth must be >= 1")
    tok = F.concat_ws(":", F.col("role"), F.coalesce(F.col("tool"), F.lit("-")))
    arrs = transcripts.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("turn_idx"), tok.alias("tok")))),
            lambda s: s["tok"],
        ).alias("arr"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    pref = arrs.select(
        "conv_id",
        "n_turns",
        F.explode(
            F.expr(
                f"transform(sequence(1, least(size(arr), {int(max_depth)})), "
                f"L -> struct(L AS l, array_join(slice(arr, 1, L), ',') AS p))"
            )
        ).alias("x"),
    ).select("conv_id", "n_turns", F.col("x.l").alias("l"), F.col("x.p").alias("p"))
    support = pref.groupBy("l", "p").agg(F.count(F.lit(1)).alias("sup"))
    best = (
        pref.join(support, ["l", "p"])
        .filter(F.col("sup") >= min_support)
        .groupBy("conv_id")
        .agg(F.max(F.struct(F.col("l"), F.col("p"))).alias("b"))
    )
    return (
        arrs.join(best, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            F.coalesce(F.col("b.l"), F.lit(0)).cast("long").alias("tpl_len"),
            F.coalesce(F.col("b.p"), F.lit("")).alias("template"),
        )
    )


def tool_graph(transcripts: DataFrame) -> DataFrame:
    """Tool-transition graph over agent transcripts: for every conversation,
    take the turn-ordered sequence of tool INVOCATIONS (assistant turns
    carrying a tool name) and emit one directed edge per consecutive pair
    — ``weight`` = how many times the workflow "tool a, then tool b"
    occurs across the corpus. This is the standard workflow-mining view of
    an agent platform's traces: feeding it to PageRank ranks tools by how
    central they are to multi-step trajectories (the reference's
    rank-propagation core, pagerank.v:1045-1140, re-targeted at the tool
    graph exactly like textrank re-targets it at a word graph).

    One lag window on the conversation key + one map-side-combined count —
    no joins, no Python. Self-transitions (retry loops) are excluded: they
    are the ``agent_loops`` signal, and the rank kernel's graph
    conventions are loop-free. Returns ``(src, dst, weight)`` with string
    tool ids; the output is vocabulary-sized (number of distinct tools
    squared at most), so downstream rank supersteps are tiny regardless of
    corpus scale — the cost is the ONE transcript scan.
    """
    inv = transcripts.filter(
        (F.col("role") == "assistant") & F.col("tool").isNotNull()
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = inv.select(
        F.col("tool").alias("dst"),
        F.lag("tool").over(w).alias("src"),
    )
    return (
        seq.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def curate_conversations(
    transcripts: DataFrame,
    min_turns: int = 3,
    max_run_len: int = 2,
    max_latency_us: int = 120_000_000,
) -> DataFrame:
    """End-to-end transcript curation verdicts — the conversation-level
    analogue of trainprep.prepare_corpus: compose the structural lint
    (:func:`transcript_lint`), the stuck-tool-loop detector
    (:func:`agent_loops` semantics, unfiltered max run) and the per-tool
    latency profile (:func:`tool_latency` semantics, per conversation)
    into ONE keep/drop decision per conversation, with every reason
    carried as an exact integer column (never a silent drop — the
    repo-wide curation contract).

    keep = structurally clean (no index gaps, no orphan tool turns)
    AND n_turns >= ``min_turns`` AND longest same-tool invocation run
    <= ``max_run_len`` AND worst tool latency <= ``max_latency_us``.

    Three keyed-window/grouped passes over the one transcript scan,
    joined on the conversation key. Returns ``(conv_id, n_turns,
    n_idx_gaps, n_orphan_tools, max_run, max_latency_us, keep)``.
    """
    lint = transcript_lint(transcripts).select(
        "conv_id", "n_turns", "n_idx_gaps", "n_orphan_tools"
    )
    inv = transcripts.filter(
        (F.col("role") == "assistant") & F.col("tool").isNotNull()
    )
    w_all = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_tool = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    runs = (
        inv.select(
            "conv_id",
            "tool",
            (F.row_number().over(w_all) - F.row_number().over(w_tool)).alias("__g"),
        )
        .groupBy("conv_id", "tool", "__g")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("conv_id")
        .agg(F.max("run_len").cast("long").alias("max_run"))
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lat = (
        transcripts.select(
            "conv_id",
            "role",
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
            ).alias("__lat"),
        )
        .filter((F.col("role") == "tool") & F.col("__lat").isNotNull())
        .groupBy("conv_id")
        .agg(F.max("__lat").cast("long").alias("max_latency_us"))
    )
    j = (
        lint.join(runs, "conv_id", "left")
        .join(lat, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            "n_idx_gaps",
            "n_orphan_tools",
            F.coalesce(F.col("max_run"), F.lit(0)).cast("long").alias("max_run"),
            F.coalesce(F.col("max_latency_us"), F.lit(0)).cast("long").alias("max_latency_us"),
        )
    )
    keep = (
        (F.col("n_idx_gaps") == 0)
        & (F.col("n_orphan_tools") == 0)
        & (F.col("n_turns") >= int(min_turns))
        & (F.col("max_run") <= int(max_run_len))
        & (F.col("max_latency_us") <= int(max_latency_us))
    )
    return j.withColumn("keep", keep.cast("long"))


def turn_depth_profile(transcripts: DataFrame, bucket: int = 5) -> DataFrame:
    """Conversation-depth profile: per turn-index bucket, how many
    conversations are still alive, the role mix, tool-invocation rate and
    text mass — the "what happens deep into a trajectory" diagnostic
    (long-context degradation, tool-loop onset, abandonment) an
    agent-platform pipeline charts before deciding context budgets.

    ONE grouped aggregate over the transcript scan (bucket =
    ``turn_idx DIV bucket``); all outputs exact BIGINTs plus one
    micro-rounded rate. Returns ``(depth_bucket, n_turns, n_convs,
    n_assistant, n_tool_invocations, text_chars, tool_rate_micro)``.
    """
    if bucket < 1:
        raise ValueError("bucket must be >= 1")
    b = (F.col("turn_idx").cast("long") / int(bucket)).cast("long")
    return (
        transcripts.groupBy(b.alias("depth_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
            .cast("long")
            .alias("n_assistant"),
            F.sum(
                F.when(
                    (F.col("role") == "assistant") & F.col("tool").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_tool_invocations"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit(""))))
            .cast("long")
            .alias("text_chars"),
        )
        .withColumn(
            "tool_rate_micro",
            F.expr(
                "CASE WHEN n_assistant > 0 THEN n_tool_invocations * 1000000"
                " DIV n_assistant ELSE CAST(0 AS BIGINT) END"
            ),
        )
    )

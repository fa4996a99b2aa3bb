"""Deterministic synthetic multi-turn transcripts (the engine's source table).

Schema per BASELINE.json.input_hint:
    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

Everything is generated *columnar in Spark* (``spark.range`` + ``xxhash64``),
no driver-side loops, so the same generator scales from the 3-conversation
hand fixture to bench tiers. Determinism comes from hashing, not RNG state —
the same (conv, turn) always produces the same row on any cluster size, which
is what makes two-parallelism benchmark runs comparable.

Generator spec follows FIXTURES.md §1 (seed folded into the hash):
  - conversation c has ``3 + pmod(xxhash64(conv_id, seed), 8)`` turns
  - roles cycle with period 3: user, assistant, then either a tool-result
    turn (iff the assistant turn invoked a tool: ``pmod(xxhash64(conv_id,
    turn_idx, seed), 3) == 0``) or another user turn
  - tool names drawn from {search, python, browser, sql} by hash
  - text = ``t-{conv_id}-{turn_idx}-{pmod(xxhash64(conv_id, turn_idx), 1e8)}``
  - ts = 2026-01-01 00:00:00 + turn_idx minutes

The reference's analogue is the C++ graphgen (graphgen.cpp:27-39) emitting a
raw CSR memory image; here the source of truth is the transcript *table* and
graph structure is derived downstream (operators/edges.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

TOOLS = ["search", "python", "browser", "sql"]


def _pmod(col, m: int):
    return F.pmod(F.xxhash64(*col), F.lit(m)) if isinstance(col, (list, tuple)) else F.pmod(col, F.lit(m))


def synth_transcripts(spark: SparkSession, n_conv: int, seed: int = 7) -> DataFrame:
    """Generate ``n_conv`` deterministic conversations, fully columnar.

    One ``spark.range`` over conversations, a ``sequence``/``explode`` over
    turns; every column is a hash expression — no Python on any row.
    """
    conv = (
        spark.range(n_conv)
        .select(F.format_string("conv-%05d", F.col("id").cast("int")).alias("conv_id"))
        .withColumn("n_turns", (F.lit(3) + _pmod([F.col("conv_id"), F.lit(seed)], 8)).cast("int"))
    )
    turns = conv.select(
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    phase = F.pmod(F.col("turn_idx"), F.lit(3))
    # does the assistant turn at index i invoke a tool?
    invokes = _pmod([F.col("conv_id"), F.col("turn_idx"), F.lit(seed)], 3) == 0
    # for a phase-2 turn, did the assistant at i-1 invoke?
    prev_invokes = _pmod([F.col("conv_id"), F.col("turn_idx") - 1, F.lit(seed)], 3) == 0

    role = (
        F.when(phase == 0, F.lit("user"))
        .when(phase == 1, F.lit("assistant"))
        .otherwise(F.when(prev_invokes, F.lit("tool")).otherwise(F.lit("user")))
    )
    tool_name = F.element_at(
        F.array(*[F.lit(t) for t in TOOLS]),
        (_pmod([F.col("conv_id"), F.lit("tool"), (F.col("turn_idx") - phase + F.lit(1))], 4) + 1).cast("int"),
    )
    tool = (
        F.when((phase == 1) & invokes, tool_name)
        .when((phase == 2) & prev_invokes, tool_name)
        .otherwise(F.lit(None).cast("string"))
    )
    text = F.format_string(
        "t-%s-%d-%d",
        F.col("conv_id"),
        F.col("turn_idx"),
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(10**8)),
    )
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(mins=F.col("turn_idx"))

    return turns.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def transcripts_tiny(spark: SparkSession) -> DataFrame:
    """The 3-conversation hand fixture from FIXTURES.md §2 (exact rows)."""
    rows = [
        ("c1", 0, "user", None),
        ("c1", 1, "assistant", "search"),
        ("c1", 2, "tool", "search"),
        ("c1", 3, "assistant", None),
        ("c2", 0, "user", None),
        ("c2", 1, "assistant", None),
        ("c3", 0, "user", None),
        ("c3", 1, "assistant", "python"),
        ("c3", 2, "tool", "python"),
        ("c3", 3, "user", None),
        ("c3", 4, "assistant", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, tool string")
    text = F.format_string(
        "t-%s-%d-%d",
        F.col("conv_id"),
        F.col("turn_idx"),
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(10**8)),
    )
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(mins=F.col("turn_idx"))
    return df.select("conv_id", "turn_idx", "role", text.alias("text"), "tool", ts.alias("ts"))


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """Deterministic transcripts-shaped view over the events gate table —
    the oracle-replayable bridge between the driver's parquet fixtures and
    the transcript operators (synth_transcripts hashes with xxhash64,
    which DuckDB cannot replay; this view uses only ROW_NUMBER + modular
    arithmetic, so cross-engine value gates can exercise the REAL
    transcript ETL end to end).

    Mapping: conversation = user, turn order = (ts, event_id); roles cycle
    user/assistant/(tool|user) exactly like the synthetic generator, with
    the "assistant invoked a tool" rule the integer form
    ``(user_id + turn_idx) % 3 == 0`` and the tool name = that turn's
    event_type (the tool-result turn inherits the invoker's tool). Text
    keeps the generator's ``t-{conv}-{turn}`` shape — the per-turn text
    equality invariant is checkable on it.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = events.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lag("event_type").over(w).alias("__prev_et"),
    )
    phase = F.pmod(F.col("turn_idx"), F.lit(3))
    invokes = F.pmod(F.col("user_id") + F.col("turn_idx"), F.lit(3)) == 0
    prev_invokes = F.pmod(F.col("user_id") + F.col("turn_idx") - 1, F.lit(3)) == 0
    role = (
        F.when(phase == 0, F.lit("user"))
        .when(phase == 1, F.lit("assistant"))
        .otherwise(F.when(prev_invokes, F.lit("tool")).otherwise(F.lit("user")))
    )
    tool = (
        F.when((phase == 1) & invokes, F.col("event_type"))
        .when((phase == 2) & prev_invokes, F.col("__prev_et"))
        .otherwise(F.lit(None).cast("string"))
    )
    return b.select(
        F.format_string("conv-%d", F.col("user_id")).alias("conv_id"),
        "turn_idx",
        role.alias("role"),
        F.format_string("t-%d-%d", F.col("user_id"), F.col("turn_idx")).alias("text"),
        tool.alias("tool"),
        F.col("ts"),
    )

"""Declarative data-quality constraint audit — the Deequ-style check suite
(Schelter et al., VLDB 2018 "Automating Large-Scale Data Quality
Verification" — public methodology) a pipeline runs before promoting a
table.

``audit`` takes a list of constraint specs and returns ONE row per check
with exact violation counts:

* ``("not_null", col)`` — NULL rows
* ``("range", col, lo, hi)`` — non-NULL rows outside ``[lo, hi]``
* ``("in_set", col, values)`` — non-NULL rows outside the value set
* ``("unique", [cols...])`` — rows sharing their key with another row
* ``("fk", col, ref_df, ref_col)`` — non-NULL rows whose value is absent
  from the referenced column (referential integrity)

Scale shape (100-TB lens, Deequ's own design): ALL row-level checks
(not_null/range/in_set) compile into ONE conditional aggregation — the
table is scanned exactly once no matter how many such checks are listed,
and the scan is a codegen'd sum of CASE indicators. Each ``unique`` check
is one map-side-combined groupBy on its key; each ``fk`` is one
anti-join against the DISTINCT referenced keys (broadcast when the
dimension is small — the planner decides). Everything unions into a
single plan; one action materializes the whole report.

Reference parity: none (single-query reference); operations-mandate
breadth — constraint audits are how a 100-TB ingest decides to publish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["audit", "fd_violations"]


def audit(df: DataFrame, checks: list[tuple]) -> DataFrame:
    """``(check, n_rows, n_violations)`` — exact BIGINT counts per check."""
    if not checks:
        raise ValueError("need at least one check")
    row_level: list[tuple[str, F.Column]] = []  # (name, violation indicator)
    keyed: list[tuple[str, list[str]]] = []
    fks: list[tuple[str, str, DataFrame, str]] = []
    for c in checks:
        kind = c[0]
        if kind == "not_null":
            row_level.append(
                (f"not_null({c[1]})", F.col(c[1]).isNull().cast("long"))
            )
        elif kind == "range":
            _, col, lo, hi = c
            v = F.col(col)
            row_level.append(
                (
                    f"range({col},{lo},{hi})",
                    (v.isNotNull() & ((v < F.lit(lo)) | (v > F.lit(hi)))).cast("long"),
                )
            )
        elif kind == "in_set":
            _, col, values = c
            v = F.col(col)
            row_level.append(
                (
                    f"in_set({col})",
                    (v.isNotNull() & ~v.isin(list(values))).cast("long"),
                )
            )
        elif kind == "unique":
            cols = list(c[1])
            keyed.append((f"unique({','.join(cols)})", cols))
        elif kind == "fk":
            _, col, ref_df, ref_col = c
            fks.append((f"fk({col}->{ref_col})", col, ref_df, ref_col))
        else:
            raise ValueError(f"unknown check kind {kind!r}")

    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    reports: list[DataFrame] = []
    if row_level:
        one = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.coalesce(F.sum(ind), F.lit(0)).alias(f"v{i}")
              for i, (_, ind) in enumerate(row_level)],
        )
        stack = ", ".join(
            f"'{name}', v{i}" for i, (name, _) in enumerate(row_level)
        )
        reports.append(
            one.selectExpr(
                f"stack({len(row_level)}, {stack}) AS (check, n_violations)",
                "n_rows",
            ).select("check", "n_rows", "n_violations")
        )
    for name, cols in keyed:
        dup_rows = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_violations"))
        )
        reports.append(
            dup_rows.crossJoin(F.broadcast(total)).select(
                F.lit(name).alias("check"), "n_rows", "n_violations"
            )
        )
    for name, col, ref_df, ref_col in fks:
        orphans = (
            df.filter(F.col(col).isNotNull())
            .join(
                ref_df.select(F.col(ref_col).alias(col)).dropDuplicates(),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        reports.append(
            orphans.crossJoin(F.broadcast(total)).select(
                F.lit(name).alias("check"), "n_rows", "n_violations"
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def fd_violations(df: DataFrame, lhs_cols: list[str], rhs_col: str) -> DataFrame:
    """Functional-dependency audit for ``lhs -> rhs`` (profiling primitive
    from FD-discovery systems — Papenbrock et al., VLDB 2015 "Functional
    Dependency Discovery: An Experimental Evaluation" — run as a CHECK of
    one candidate FD, not discovery): does every LHS key determine a single
    RHS value, and if not, how far off is the table?

    Emits one row of exact BIGINTs:

    * ``n_keys`` — distinct LHS keys
    * ``n_violating_keys`` — keys mapping to >= 2 distinct RHS values
    * ``rows_to_fix`` — the g3 error numerator (Kivinen & Mannila 1995):
      minimum rows to delete so the FD holds = sum over keys of
      (rows(key) - max single-RHS row count). Ties inside max() don't
      matter — only the count survives.

    Scale shape: two map-side-combined aggregations — (lhs, rhs) cells,
    then per-key max/sum — both keyed on the LHS; the fact table is
    scanned once and never re-shuffled. No windows, no driver loop.
    """
    cells = df.groupBy(
        *[F.col(c) for c in lhs_cols], F.col(rhs_col)
    ).agg(F.count(F.lit(1)).alias("__c"))
    per_key = cells.groupBy(*[F.col(c) for c in lhs_cols]).agg(
        F.count(F.lit(1)).alias("__nrhs"),
        F.sum("__c").alias("__rows"),
        F.max("__c").alias("__maxc"),
    )
    return per_key.groupBy().agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("__nrhs") > 1, 1).otherwise(0)).alias("n_violating_keys"),
        F.sum(F.col("__rows") - F.col("__maxc")).alias("rows_to_fix"),
    )

"""Temporal join operators Spark lacks natively: as-of and range joins.

Not present in the reference (SURVEY §2.4 notes their absence); added
as first-class engine operators per the build contract, expressed as
compositions of existing DataFrame ops so Catalyst keeps optimizing:

- :func:`asof_join` — for each left row, the single right row with the
  greatest ``right.ts <= left.ts`` per key (trades/quotes semantics).
  Implemented with the union-tag + window trick: one sort-based window
  over the tagged union instead of an O(n*m) non-equi join — a single
  shuffle on (key), no theta-join blowup, skew governed by the key
  distribution like any window.
- :func:`range_join` — join rows to interval buckets
  (``lo <= v < hi``). Small interval tables broadcast (nested-loop on
  a broadcast side is cheap); large ones should be binned first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: latest right row at-or-before each left row.

    ``right_cols`` are carried to the output with an ``asof_`` prefix
    (None when no right row qualifies). With ``tolerance_seconds``,
    matches older than the tolerance are nulled out (pandas
    ``merge_asof`` semantics).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_ets", F.col(left_ts)
    )
    r_tag = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(f"asof_{c}") for c in right_cols],
        )
        .withColumn("_side", F.lit(0))
        .withColumn("_ets", F.col("_rts"))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps so an exact
    # tie matches (<= semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ets"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "_match_ts", F.last(F.when(F.col("_side") == 0, F.col("_rts")),
                            ignorenulls=True).over(w)
    )
    for c in right_cols:
        filled = filled.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("_side") == 0, F.col(f"asof_{c}")),
                   ignorenulls=True).over(w),
        )
    out = filled.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        stale = (
            F.col("_match_ts").isNull()
            | ((F.unix_timestamp(F.col(left_ts))
                - F.unix_timestamp(F.col("_match_ts")))
               > tolerance_seconds)
        )
        for c in right_cols:
            out = out.withColumn(
                f"asof_{c}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"asof_{c}")),
            )
        out = out.withColumn(
            "_match_ts", F.when(stale, F.lit(None)).otherwise(F.col("_match_ts"))
        )
    return out.drop("_side", "_ets").withColumnRenamed("_match_ts", "asof_ts")


def range_join(
    rows: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Interval join: attach the bucket where ``lo <= value < hi``.

    The ranges side is broadcast (interval dimension tables are small;
    a broadcast nested-loop join over k intervals is O(n*k) JVM-side
    with no shuffle of the fact table).
    """
    return rows.join(
        F.broadcast(ranges),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "left",
    )

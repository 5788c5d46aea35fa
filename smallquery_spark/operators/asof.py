"""As-of join (SURVEY.md §2 B20) — a composite operator Spark lacks.

Semantics: for each left row, attach the single right row with the
largest ``right_time`` ≤ ``left_time`` (backward, inclusive) sharing the
join keys. Ties on ``right_time`` break to the largest tie-break column
(SURVEY §7 hard part 2). Oracle equivalent: DuckDB ``ASOF JOIN``.

Scalable plan (the point at 100 TB): Spark's only native route is a
range theta-join (BroadcastNestedLoop — quadratic). Instead we UNION the
two sides, hash-shuffle ONCE by the join keys, sort within partitions by
time, and propagate the most recent right-row attributes to each left
row with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window. Cost: one shuffle + one in-partition sort — the same shape as a
sort-merge join, no quadratic blowup, no driver collect. Skewed keys are
handled by AQE skew-split since the window partitions by the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join; left rows keep all columns, right contributes
    ``value_cols`` (renamed with ``suffix`` on collision).

    ``direction='backward'`` (default) matches the largest right time ≤
    left time; ``'forward'`` the smallest right time ≥ left time — same
    single-shuffle plan, just a reversed in-partition sort.
    ``tolerance`` (an SQL interval literal body, e.g. ``'30 minutes'``)
    nulls out matches farther than the tolerance from the probe — the
    pandas ``merge_asof`` contract, applied as a post-window projection
    (no extra shuffle).

    Returns one row per left row (right side may be NULL when no
    matching right row exists).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in value_cols
    }

    # Tag and align the two sides on a common schema.
    lhs = left.withColumn("__t", F.col(left_time)).withColumn(
        "__is_probe", F.lit(1)
    )
    for c in value_cols:
        lhs = lhs.withColumn(f"__v_{c}", F.lit(None).cast(right.schema[c].dataType))
    rhs = right.withColumn("__t", F.col(right_time)).withColumn(
        "__is_probe", F.lit(0)
    )
    for c in value_cols:
        rhs = rhs.withColumn(f"__v_{c}", F.col(c))
    left_only = [c for c in left.columns]
    common = on + ["__t", "__is_probe"] + [f"__v_{c}" for c in value_cols]
    lhs_sel = lhs.select(
        *common, *[F.col(c) for c in left_only if c not in common]
    )
    rhs_sel = rhs.select(
        *common,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only if c not in common],
    )
    unioned = lhs_sel.unionByName(rhs_sel)

    # Events sort before probes at equal time (inclusive match); ties among
    # events break by the tiebreak column (last wins). Forward direction
    # = the same scan over time reversed.
    tdir = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    order = [tdir, F.col("__is_probe").asc()]
    if tiebreak is not None:
        # tiebreak only exists on the right side → carried via __v_*
        tb = f"__v_{tiebreak}" if tiebreak in value_cols else tiebreak
        order.append(F.col(tb).asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = unioned.withColumn(
        "__matched_t", F.last(F.when(F.col("__is_probe") == 0, F.col("__t")), ignorenulls=True).over(w)
    )
    for c in value_cols:
        unioned = unioned.withColumn(
            out_names[c], F.last(f"__v_{c}", ignorenulls=True).over(w)
        )
    if tolerance is not None:
        gap_ok = (
            F.col("__t") <= F.expr(f"__matched_t + INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("__t") >= F.expr(f"__matched_t - INTERVAL {tolerance}")
        )
        for c in value_cols:
            unioned = unioned.withColumn(
                out_names[c], F.when(gap_ok, F.col(out_names[c]))
            )
    return unioned.filter(F.col("__is_probe") == 1).drop(
        "__t", "__is_probe", "__matched_t", *[f"__v_{c}" for c in value_cols]
    )

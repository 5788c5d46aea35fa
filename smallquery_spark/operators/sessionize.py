"""Batch + incremental sessionization (gaps-and-islands over events).

The streaming side of session semantics is B53 (``F.session_window``,
queries/streaming_queries.py) — reference parity per SURVEY §2. This
module is the BATCH and INCREMENTAL counterpart a training-data
pipeline needs when events arrive as at-rest epochs (daily drops,
backfills) rather than a live stream:

- ``session_spans(df, ...)``: per-key gaps-and-islands within one
  frame — a single keyed window sort (one shuffle on the key), then a
  grouped reduce to (key, first_ts, last_ts, n) SPANS.
- ``merge_session_spans(spans, ...)``: exact global sessions from
  per-epoch spans — a sorted running-max interval merge with the same
  >=gap split rule. Exactness: every span's internal event chain has
  all consecutive gaps < gap (that is what session_spans enforces), so
  gap-connectivity of the event UNION equals gap-connectivity of the
  span intervals, and the 1-D sweep computes exactly that transitive
  closure. The registered query c38_incremental_sessionize pins this
  against a global-session DuckDB oracle under an ADVERSARIAL
  hash-split of events into epochs (not even time-contiguous).

Why this shape at 100 TB: sessionizing N events directly is one
event-sized sort-shuffle. The span path sorts each epoch when it
ARRIVES (epoch-sized work, amortized over ingestion) and the global
merge afterwards is #sessions-sized, not #events-sized — the same
economics that made the b53 prereduce lever beat corpus-sized
streaming state at gen100 (B53_LEVERS_gen100.json: the session
operator's state store holds ~99M mostly-singleton sessions; the
span merge never materializes state at all).

Timestamps are compared in integer MICROSECONDS (``F.unix_micros``)
— the engine's canonical precision (events.ts carries nanoseconds in
the fixture; Spark truncates to µs on read, and oracles mirror with
``epoch_us``), so session-boundary decisions are exact integer
comparisons on both engines, no float/interval boundary risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

DEFAULT_GAP_US = 300 * 1_000_000  # 5 minutes, matching B53


def session_spans(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = DEFAULT_GAP_US,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Per-key session spans within this frame (gaps-and-islands).

    ``extra_keys`` lets callers sessionize per (key, epoch) in ONE
    plan — the incremental path — without a Python loop per epoch.
    Returns (key..., first_us, last_us, n_events).
    """
    keys = [key_col, *extra_keys]
    w = Window.partitionBy(*keys).orderBy("__us")
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag("__us").over(w)
    new_sess = prev.isNull() | ((F.col("__us") - prev) >= F.lit(gap_us))
    return (
        df.withColumn("__us", us)
        .withColumn("__sid", F.sum(new_sess.cast("int")).over(w))
        .groupBy(*keys, "__sid")
        .agg(
            F.min("__us").alias("first_us"),
            F.max("__us").alias("last_us"),
            F.count("*").alias("n_events"),
        )
        .drop("__sid", *extra_keys)
    )


def merge_session_spans(
    spans: DataFrame,
    key_col: str = "user_id",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Exact global sessions from (possibly overlapping) per-epoch
    spans: sorted running-max interval merge, same >=gap split rule.
    Span-sized work — the input is #sub-sessions rows, not #events.
    Returns (key, first_us, last_us, n_events) per global session.
    """
    w = Window.partitionBy(key_col).orderBy("first_us", "last_us")
    prev_max_end = F.max("last_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_grp = prev_max_end.isNull() | (
        (F.col("first_us") - prev_max_end) >= F.lit(gap_us)
    )
    return (
        spans.withColumn("__gid", F.sum(new_grp.cast("int")).over(w))
        .groupBy(key_col, "__gid")
        .agg(
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
            F.sum("n_events").alias("n_events"),
        )
        .drop("__gid")
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Direct batch sessionization: one keyed window sort over events.
    Returns (key, first_us, last_us, n_events) per session."""
    return session_spans(df, key_col, ts_col, gap_us)

"""Event-stream analytics over the events table.

``sessionize`` uses Spark's native ``session_window`` — the same expression
runs unchanged in batch and Structured Streaming (with a watermark), which is
the point: gap-based sessionization is the canonical stateful streaming
aggregation, and Catalyst plans it as a single merging aggregation rather
than the lag+cumsum window chain a hand-rolled version needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions per user: events closer than ``gap`` merge into
    one session.  Returns one row per (user, session):
    ``(user, session_start, last_ts, n_events)``.

    Session-window semantics (verified against Spark's planner): each
    event extends its session to ``[ts, ts + gap]`` — a follow-up event at
    exactly ``ts + gap`` still MERGES; the break happens strictly beyond
    the gap.  The SQL-replayable equivalent is a lag-diff ``> gap`` break +
    running sum (the driver oracle replays exactly that).
    """
    ts = F.col(ts_col).cast("timestamp")
    return (
        df.groupBy(F.session_window(ts, gap), F.col(user_col).alias("user"))
        .agg(F.count("*").alias("n_events"), F.max(ts).alias("_last"))
        .select(
            "user",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("_last", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            "n_events",
        )
        .orderBy("user", "session_start")
    )

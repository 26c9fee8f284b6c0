"""Event sessionization — the standard training-data / clickstream
operator the brief's pipeline needs over the ``events`` table.

Two implementations, both Spark-first:

* ``sessionize_stats`` — batch (and streaming, with a watermark) via
  the built-in ``F.session_window``: entirely JVM-side, one shuffle on
  the grouping key, AQE-coalesced. Semantics: events of one user merge
  into a session while consecutive gaps are <= gap (probed: an event
  exactly ``gap`` after the previous one MERGES; the break condition
  is strictly greater) — identical to the SQL lag/cumsum construction
  the DuckDB oracle uses.
* ``sessionize_stateful`` — the custom-stateful-streaming variant with
  ``applyInPandasWithState`` (the reference engine has no streaming at
  all — SURVEY.md §2.4 — so this is graft-mandated, not ported): state
  per user holds the open session; closed sessions are emitted when a
  gap break arrives, and the open session flushes on event-time
  timeout. Demonstrates the harness for operators session_window can't
  express (e.g. value-dependent gaps).

Scale: both shapes shuffle once on user_id; a hot user (bot traffic)
concentrates one key — AQE skew-join does not help groupBy state, so
the stateful variant should be fed pre-filtered (rate-capped) keys at
web scale; session_window aggregation is partial-aggregated map-side.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def sessionize_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session stats: (user, session_start, session_end, n_events,
    sum_value). session_start/end are min/max event time (the oracle's
    definition), not the session_window bounds (whose end is
    last_event + gap)."""
    return (
        events.groupBy(user_col, F.session_window(F.col(ts_col), gap))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(user_col, "session_start", "session_end", "n_events",
                "sum_value")
    )


_SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
# start/last are epoch SECONDS as doubles — a long would truncate
# sub-second event times and drift from the batch operator
_SESSION_STATE_SCHEMA = (
    "start double, last double, n long, total double"
)


def _make_session_update(gap_s: float):
    """Build the applyInPandasWithState update function for a given
    session gap (closure — the gap must match the batch operator's
    ``sessionize_stats(gap=...)`` or the two silently diverge)."""

    def _session_update(
        key, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        """Fold this micro-batch's events (sorted by event time) into
        the open session, emitting every session that a gap break
        closes; flush the open session when the event-time timeout
        fires."""
        import datetime as _dt

        def _utc_naive(epoch_s: float) -> "_dt.datetime":
            # naive-UTC datetime (the session tz is enforced UTC);
            # fromtimestamp(tz=utc) replaces deprecated utcfromtimestamp
            return _dt.datetime.fromtimestamp(
                epoch_s, _dt.timezone.utc
            ).replace(tzinfo=None)

        def row(start, last, n, total):
            return {
                "user_id": key[0],
                "session_start": _utc_naive(start),
                "session_end": _utc_naive(last),
                "n_events": n,
                "sum_value": round(total, 4),
            }

        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                state.remove()
                yield pd.DataFrame([row(start, last, n, total)])
            return

        ev = pd.concat(list(pdfs))
        ev = ev.sort_values("ts")
        ts = ev["ts"].astype("int64").to_numpy() / 1e9
        vals = ev["value"].to_numpy()

        closed = []
        if state.exists:
            start, last, n, total = state.get
            start, last = float(start), float(last)
        else:
            start = last = 0.0
            n, total = 0, 0.0
        for t, v in zip(ts, vals):
            t = float(t)
            if n > 0 and t - last > gap_s:
                closed.append(row(start, last, n, total))
                n, total = 0, 0.0
            if n == 0:
                start = last = t
            else:
                # late-but-in-watermark events may precede the open span
                start = min(start, t)
                last = max(last, t)
            n += 1
            total += float(v)
        state.update((float(start), float(last), int(n), float(total)))
        # flush the open session if no event arrives within the gap
        state.setTimeoutTimestamp(int((last + gap_s) * 1000))
        if closed:
            yield pd.DataFrame(closed)

    return _session_update


def sessionize_stateful(
    events_stream: DataFrame,
    watermark_delay: str = "1 minute",
    gap_s: float = 30 * 60,
) -> DataFrame:
    """Streaming sessionization with applyInPandasWithState over
    (user_id, ts, value). Closed sessions are emitted as gap breaks
    arrive; open sessions flush on event-time timeout (watermark-driven,
    so late data within the delay still joins its session). ``gap_s``
    is the session gap in seconds and must match the batch operator's
    ``sessionize_stats(gap=...)`` for the equivalence the tests prove.

    Requires ``spark.sql.session.timeZone = UTC`` (enforced): the
    pandas int64 view of the ts column is session-local epoch seconds
    while setTimeoutTimestamp compares against the UTC watermark — a
    non-UTC session would set timeouts offset by the zone (negative
    offsets kill the query with 'timeout earlier than watermark')."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    tz = events_stream.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        raise ValueError(
            f"sessionize_stateful requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}); see docstring"
        )

    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_update(gap_s),
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def asof_join(
    left: DataFrame, right: DataFrame, on: str, ts_col: str = "ts",
    value_cols: list[str] | None = None, strict: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time (as-of) LEFT join: for every left row, attach the
    ``value_cols`` of the LATEST right row with the same ``on`` key
    and ``right.ts < left.ts`` (``<=`` with ``strict=False``); null
    columns when no prior right row exists. The feature-backfill
    primitive of a training-data pipeline — "the user's last purchase
    state at event time" — where a naive range join explodes
    quadratically per key.

    Spark-first shape (the published union+window formulation, e.g.
    Databricks' tempo): tag both sides, union, ONE shuffle on the key,
    then a running ``last(value, ignorenulls=True)`` over
    (ts, side-tag) order — the tag breaks equal-ts ties so a strict
    join orders a right row AFTER left rows at the same instant
    (invisible to them), non-strict before. Cost is sort-within-
    partition, never per-key O(n*m); the attached values ride in one
    struct so N value columns still cost one window expression.

    Right rows must be unique per (key, ts) — pre-aggregate ties
    upstream (the caller knows which row should win); the asof
    output would otherwise be order-dependent.
    """
    from pyspark.sql import Window

    value_cols = value_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    # strict: left tag 0 < right tag 1 at equal ts -> right invisible
    rtag, ltag = (1, 0) if strict else (0, 1)
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(rtag).alias("_side"),
        F.struct(
            F.col(ts_col).alias(ts_col + suffix),
            *[F.col(c).alias(c + suffix) for c in value_cols],
        ).alias("_payload"),
    )
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(ltag).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    merged = l.unionByName(
        r.select(
            F.col(on), F.col(ts_col), "_side", "_payload",
        ), allowMissingColumns=True,
    )
    # ascending side-tag is right for BOTH modes because the tags are
    # assigned per mode above: strict puts left(0) before right(1) at
    # an equal ts, non-strict right(0) before left(1)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = merged.withColumn(
        "_state", F.last("_payload", ignorenulls=True).over(w)
    ).filter(F.col("_side") == ltag)
    return out.select(
        *lcols,
        *[F.col(f"_state.{ts_col}{suffix}").alias(ts_col + suffix)],
        *[F.col(f"_state.{c}{suffix}").alias(c + suffix)
          for c in value_cols],
    )


def scd2_history(
    events: DataFrame, key_col: str = "user_id", ts_col: str = "ts",
    attr_col: str = "event_type", id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build -> (key, attr,
    valid_from, valid_to, version): compress a per-key event stream
    into versioned validity intervals — one row per VALUE CHANGE, with
    ``valid_to`` = the next change's timestamp (null = current) and a
    1-based version counter. The dimension-table materialization an
    as-of join (asof_join above) consumes, built once instead of
    re-scanning raw events per query.

    Classic gaps-and-islands: a change row is one whose attr differs
    from its predecessor in (ts, id) order — ``id_col`` makes the
    order TOTAL, so equal-timestamp events resolve identically on
    every engine and rerun (the DuckDB oracle replays lag/lead/
    row_number over the same total order).

    Scale shape: ONE shuffle on the key, then sort-within-partition
    for all three window functions over the same (key | ts, id)
    frame (Spark plans a single Sort + Window chain, no re-shuffle
    between them); per-key history must fit one task's sort spill —
    the standard SCD2 build envelope (billions of keys scale out;
    a single key with 10^9 events is an upstream modeling bug)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    changes = (
        events.select(key_col, ts_col, id_col, attr_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            F.col("_prev").isNull()
            | (F.col(attr_col) != F.col("_prev"))
        )
    )
    wc = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    return changes.select(
        F.col(key_col),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(wc).alias("valid_to"),
        F.row_number().over(wc).alias("version"),
    )

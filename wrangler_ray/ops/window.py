"""Windowed aggregates and sessionization over event streams.

The reference has no windowing (its execution model is single-pass batch,
SURVEY.md §1.1); these are the custom operators a transcript/event pipeline
needs, expressed Ray-Data-first:

- tumbling window  = truncate-ts inside ``map_batches`` (vectorized) + one
  hash ``groupby().aggregate()`` — the window key is just another group key,
  so there is exactly ONE shuffle and partial aggregation happens per block.
- sessionize       = ``groupby(key).map_groups`` with a vectorized gap scan
  per key — the partitioning assumption (documented per SURVEY §2 custom-op
  rule) is that one key's events fit in one group task, which holds for
  conversation/user streams (bounded per-user history).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(
    ds,
    ts_col: str,
    aggs: list,
    key_cols: list[str] | None = None,
    every: str = "1 hour",
):
    """Tumbling-window aggregate: floor ``ts_col`` to the window start and
    group by (keys..., window_start). ``aggs`` are ray.data.aggregate.*
    instances. ``every`` accepts pyarrow multiple+unit ("15 minute", "1 hour",
    "1 day")."""
    n, unit = every.split()
    mult = int(n)

    def add_window(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t.column(ts_col), multiple=mult, unit=unit)
        return t.append_column("window_start", w)

    keys = list(key_cols or []) + ["window_start"]
    return (
        ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys)
        .aggregate(*aggs)
    )


def hopping_window(
    ds,
    ts_col: str,
    aggs: list,
    key_cols: list[str] | None = None,
    every: str = "15 minute",
    period: str = "1 hour",
):
    """Hopping (sliding) window aggregate: windows of length ``period``
    starting every ``every``; an event belongs to period/every overlapping
    windows. Expressed Ray-Data-first: each block REPLICATES its rows once
    per covering window inside one vectorized ``map_batches`` (replication
    factor = period/every, a small constant), then ONE hash groupby on
    (keys..., window_start) — same single-shuffle shape as tumbling.

    Scale note: shuffle volume is replication-factor × input for the touched
    columns only; pre-aggregation inside the exchange (Ray's partial
    aggregates) keeps the reduce side at one row per (key, window)."""
    ne, ue = every.split()
    np_, up = period.split()
    us = {"second": 1_000_000, "minute": 60_000_000,
          "hour": 3_600_000_000, "day": 86_400_000_000}
    every_us = int(ne) * us[ue.rstrip("s")]
    period_us = int(np_) * us[up.rstrip("s")]
    if period_us % every_us:
        raise ValueError("hopping_window: period must be a multiple of every")
    k = period_us // every_us  # replication factor

    def explode_windows(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        # last hop-aligned start covering ts, then k-1 earlier starts
        last_start = (ts // every_us) * every_us
        n = len(ts)
        idx = np.repeat(np.arange(n), k)
        offs = np.tile(np.arange(k, dtype=np.int64) * every_us, n)
        starts = last_start[idx] - offs
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column(
            "window_start", pa.array(starts, pa.int64()).cast(pa.timestamp("us"))
        )

    keys = list(key_cols or []) + ["window_start"]
    return (
        ds.map_batches(explode_windows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys)
        .aggregate(*aggs)
    )


def sessionize(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minute",
):
    """Assign session ids per key: a new session starts when the time since
    the previous event of the same key exceeds ``gap``. Returns the input
    rows plus ``session_id`` (0-based per key, in ts order)."""
    n, unit = gap.split()
    gap_us = int(n) * {
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }[unit.rstrip("s")]

    def assign(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(ts_col, "ascending")])
        g = g.take(idx)
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_sess = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess = np.cumsum(new_sess) - 1
        return g.append_column("session_id", pa.array(sess, pa.int64()))

    return ds.groupby(key_col).map_groups(assign, batch_format="pyarrow")


def session_stats(ds, key_col: str = "user_id", ts_col: str = "ts", gap: str = "30 minute"):
    """Per-key session count (compact, oracle-comparable summary of
    sessionize): (key, n_sessions, n_events)."""
    from ray.data.aggregate import Count, Max

    sess = sessionize(ds, key_col=key_col, ts_col=ts_col, gap=gap)
    out = sess.groupby(key_col).aggregate(
        Max("session_id", alias_name="_max_sess"), Count(alias_name="n_events")
    )

    def finish(t: pa.Table) -> pa.Table:
        n_sessions = pc.add(t.column("_max_sess"), 1)
        return t.drop_columns(["_max_sess"]).append_column(
            "n_sessions", n_sessions.cast(pa.int64())
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)

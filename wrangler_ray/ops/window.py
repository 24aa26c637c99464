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


def sessionize_sharded(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minute",
    shard: str = "7 day",
):
    """Memory-bounded sessionize for keys whose FULL history exceeds one
    group task's heap (plain ``sessionize`` holds a key's every event in one
    task — fine for conversations, unbounded for a years-long hot stream).

    Shape: shard each key by fixed time buckets (``shard`` wide), sessionize
    each (key, bucket) group independently (bounded rows per task), then
    STITCH at bucket boundaries: a tiny per-(key, bucket) summary
    (first/last ts, local session count) is collected and scanned in bucket
    order — a boundary whose inter-bucket gap ≤ ``gap`` merges the adjacent
    sessions — producing a per-bucket session-id offset that a final
    broadcast map adds to the local ids. Identical output to ``sessionize``
    (pinned by test). Driver state = one row per (key, bucket) — bounded by
    distinct key×bucket, never by events. Two shuffles instead of one; use
    plain ``sessionize`` when per-key history is known-bounded."""
    import ray

    n, unit = gap.split()
    us = {"second": 1_000_000, "minute": 60_000_000,
          "hour": 3_600_000_000, "day": 86_400_000_000}
    gap_us = int(n) * us[unit.rstrip("s")]
    ns, units = shard.split()
    span_us = int(ns) * us[units.rstrip("s")]
    if span_us <= gap_us:
        raise ValueError("shard span must exceed the session gap")

    def add_bucket(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        # metadata stripped: pandas-written parquet carries a dict that makes
        # the schema unhashable → Ray's shuffle schema-dedup warns per block
        return t.replace_schema_metadata(None).append_column(
            "_bucket", pc.divide(ts, span_us).cast(pa.int64())
        )

    def local_sessions(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(ts_col, "ascending")])
        g = g.take(idx)
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_sess = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        local = np.cumsum(new_sess) - 1
        g = g.append_column("_local_sess", pa.array(local, pa.int64()))
        g = g.append_column("_first_ts", pa.array(np.full(len(ts), ts[0] if len(ts) else 0), pa.int64()))
        g = g.append_column("_last_ts", pa.array(np.full(len(ts), ts[-1] if len(ts) else 0), pa.int64()))
        g = g.append_column("_n_sess", pa.array(np.full(len(ts), local[-1] + 1 if len(ts) else 0), pa.int64()))
        return g

    local = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "_bucket"])
        .map_groups(local_sessions, batch_format="pyarrow")
        .materialize()
    )
    if local.count() == 0:
        # an all-empty groupby emits a degenerate schema-less block; return
        # an empty dataset with the CONTRACT schema (input + session_id)
        import ray.data as rd

        sch = ds.schema().base_schema
        empty = pa.table({f.name: pa.array([], f.type) for f in sch})
        return rd.from_arrow(
            empty.append_column("session_id", pa.array([], pa.int64()))
        )
    # summaries: ONE row per (key, bucket) — the only thing the driver holds
    import pandas as pd  # noqa: F811

    summaries = (
        local.select_columns([key_col, "_bucket", "_first_ts", "_last_ts", "_n_sess"])
        .map_batches(
            lambda t: pa.Table.from_pandas(
                t.to_pandas().drop_duplicates([key_col, "_bucket"]),
                preserve_index=False,
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop_duplicates([key_col, "_bucket"])
        .sort_values([key_col, "_bucket"], kind="mergesort")
    )
    # sequential stitch per key (vectorized across the summary frame):
    # offset_i = offset_{i-1} + n_sess_{i-1} - merge_{i}, where merge_i = 1
    # when the boundary gap to the previous bucket of the SAME key <= gap
    keys_np = summaries[key_col].to_numpy()
    same_key = keys_np[1:] == keys_np[:-1]
    first_ts = summaries["_first_ts"].to_numpy()
    last_ts = summaries["_last_ts"].to_numpy()
    n_sess = summaries["_n_sess"].to_numpy().astype(np.int64)
    merge = np.zeros(len(summaries), dtype=np.int64)
    merge[1:] = (same_key & ((first_ts[1:] - last_ts[:-1]) <= gap_us)).astype(np.int64)
    # offset_i = Σ_{j<i, same key} n_sess_j − Σ_{j≤i, same key} merge_j
    #          = (excl_i − excl_at_key_start) − merge_i
    # with excl = exclusive prefix of delta = n_sess − merge (nondecreasing,
    # since every nonempty bucket has n_sess ≥ 1 ≥ merge — which makes the
    # maximum.accumulate forward-fill of per-key bases valid)
    if len(summaries):
        delta = n_sess - merge
        excl = np.concatenate(([0], np.cumsum(delta)[:-1]))
        grp_start = np.ones(len(summaries), dtype=bool)
        grp_start[1:] = ~same_key
        base = np.where(grp_start, excl, 0)
        np.maximum.accumulate(base, out=base)
        offsets = excl - base - merge
    else:
        offsets = np.zeros(0, np.int64)
    off_map = {
        (k, int(b)): int(o)
        for k, b, o in zip(summaries[key_col], summaries["_bucket"], offsets)
    }
    off_ref = ray.put(off_map)

    def apply_offsets(t: pa.Table) -> pa.Table:
        m = ray.get(off_ref)
        keys = t.column(key_col).to_pylist()
        buckets = t.column("_bucket").to_numpy(zero_copy_only=False)
        local_ids = t.column("_local_sess").to_numpy(zero_copy_only=False)
        offs = np.fromiter(
            (m[(k, int(b))] for k, b in zip(keys, buckets)), np.int64, len(keys)
        )
        t = t.append_column("session_id", pa.array(local_ids + offs, pa.int64()))
        return t.drop_columns(
            ["_bucket", "_local_sess", "_first_ts", "_last_ts", "_n_sess"]
        )

    return local.map_batches(
        apply_offsets, batch_format="pyarrow", zero_copy_batch=True
    )

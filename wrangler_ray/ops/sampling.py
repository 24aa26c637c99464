"""Sampling — the reference's workspace-ingest samplers
(wrangler-core/.../sampling/{Bernoulli,Poisson,Reservoir}.java:35-140,
service/SamplingMethod.java) as Dataset operations.

first/bernoulli map directly onto Dataset primitives; poisson keeps the
reference's per-row expected-count semantics; reservoir is a per-batch
partial reservoir + driver merge (deterministic with a seed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def first(ds, n: int):
    """Bounded head — service/explorer/BoundedLineInputStream analog."""
    return ds.limit(n)


def bernoulli(ds, p: float, seed: int = 42):
    """Keep each row independently with probability p."""
    return ds.random_sample(p, seed=seed)


def poisson(ds, mean: float, seed: int = 42):
    """Poisson sampling: each row emitted k~Poisson(mean) times (the
    reference uses it with mean<1 as a thinning sampler)."""

    def sample(batch: pa.Table) -> pa.Table:
        # per-batch deterministic stream: seed xor'd with a content-derived
        # offset so every batch draws a distinct substream
        import zlib

        h = zlib.crc32(str(batch.num_rows).encode() + bytes(str(batch.slice(0, 1).to_pydict()), "utf-8"))
        rng = np.random.RandomState((seed ^ h) % (2**32))
        counts = rng.poisson(mean, size=batch.num_rows)
        idx = np.repeat(np.arange(batch.num_rows), counts)
        return batch.take(pa.array(idx))

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def reservoir(ds, k: int, seed: int = 42, num_buckets: int = 32) -> pa.Table:
    """Reservoir sample of k rows: per-batch partial reservoirs (weighted by
    a uniform key — the 'A-Res' trick: keep k rows with the largest uniform
    random keys), reduced through a bucketed per-bucket top-k exchange so the
    driver sees at most ``num_buckets × k`` rows — at 10^6 blocks the naive
    one-level merge would pull 10^6·k rows driver-side. Deterministic given
    seed."""

    def partial(batch: pa.Table) -> pa.Table:
        import zlib

        h = zlib.crc32(str(batch.slice(0, 1).to_pydict()).encode())
        rng = np.random.RandomState((seed ^ h) % (2**32))
        keys = rng.rand(batch.num_rows)
        if batch.num_rows > k:
            top = np.argpartition(-keys, k - 1)[:k]
            batch = batch.take(pa.array(top))
            keys = keys[top]
        b = batch.append_column("_resk", pa.array(keys, pa.float64()))
        # bucket by the random key itself — any deterministic partition works
        # for a top-k-by-key merge
        return b.append_column(
            "_resb", pa.array((keys * num_buckets).astype(np.int32))
        )

    def bucket_topk(g: pa.Table) -> pa.Table:
        if g.num_rows > k:
            g = g.sort_by([("_resk", "descending")]).slice(0, k)
        return g.drop_columns(["_resb"])

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_resb")
        .map_groups(bucket_topk, batch_format="pyarrow")
    )
    tabs = [
        t
        for t in parts.iter_batches(batch_size=None, batch_format="pyarrow")
        if t.num_rows
    ]
    if not tabs:
        return pa.table({})
    tbl = pa.concat_tables(tabs)
    keys = np.asarray(tbl.column("_resk"))
    if len(keys) > k:
        top = np.argpartition(-keys, k - 1)[:k]
        tbl = tbl.take(pa.array(top))
    return tbl.drop_columns(["_resk"])

"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: the exact baseline — the query matrix is broadcast
  once via ``ray.put``; every batch does one numpy matmul and emits only its
  local top-k (k rows per query per batch), merged on the driver. Shuffle
  volume: zero; driver sees O(num_batches * k * q) tiny rows.
- ``lsh_topk``: the scale path — random-hyperplane bucket signatures with
  multi-probe (hamming radius 1); batches prune candidates to matching
  buckets before the matmul.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def vecs_np(col, dtype=np.float32) -> np.ndarray:
    """Arrow list<float> / fixed_size_list<float> column → (n, d) ndarray
    WITHOUT boxing each element into Python objects (to_pylist on a million
    embeddings allocates ~d million PyFloats; the flatten path is a single
    buffer reshape)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.values.to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), arr.type.list_size).astype(dtype, copy=False)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(arr), int(widths[0])).astype(dtype, copy=False)
    return np.array(arr.to_pylist(), dtype=dtype)  # ragged fallback


# per-worker-process cache of fetched/normalized query matrices keyed by the
# broadcast ref: task-based stages get actor-style fetch-once behavior without
# pinning the stage to a fixed-size pool
_QUERY_CACHE: dict = {}


def _cached_queries(queries_ref) -> np.ndarray:
    import ray

    key = queries_ref.hex() if hasattr(queries_ref, "hex") else id(queries_ref)
    q = _QUERY_CACHE.get(key)
    if q is None:
        q = _QUERY_CACHE[key] = _normalize(
            np.asarray(ray.get(queries_ref), np.float32)
        )
    return q


class _BatchTopK:
    """Per-batch exact cosine top-k against a broadcast query matrix.
    Queries fetched from the object store once per worker process."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        self.q = _cached_queries(queries_ref)  # (nq, d)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int32()),
                    self.id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float32()),
                }
            )
        vecs = vecs_np(batch.column(self.vec_col))
        unit = _normalize(vecs)
        sims = self.q @ unit.T  # (nq, nb)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in top[qi]:
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                self.id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float32()),
            }
        )


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int | None = None,
):
    """Exact cosine top-k of each query against the whole dataset.
    Returns a pyarrow Table (query_idx, id, score) of k rows per query,
    sorted by (query_idx, -score, id)."""
    import ray

    queries = np.asarray(queries, np.float32)
    qref = ray.put(queries)
    if concurrency:
        # explicit pool when the caller wants bounded concurrency
        partials = ds.map_batches(
            _BatchTopK,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_constructor_kwargs=dict(queries_ref=qref, k=k, vec_col=vec_col,
                                       id_col=id_col),
            concurrency=concurrency,
        )
    else:
        # task-based default: scales with the cluster; the query matrix is
        # fetched once per worker process via the broadcast-ref cache
        def topk_batch(t: pa.Table) -> pa.Table:
            return _BatchTopK(qref, k, vec_col, id_col)(t)

        partials = ds.map_batches(
            topk_batch, batch_format="pyarrow", zero_copy_batch=True
        )

    # merge tiny per-batch top-k lists on the driver with a heap per query
    heaps: dict[int, list] = {}
    for row in partials.take_all():
        h = heaps.setdefault(row["query_idx"], [])
        # heap orders by (score, -id) so ties prefer the smaller id
        item = (row["score"], -row[id_col])
        if len(h) < k:
            heapq.heappush(h, item)
        else:
            heapq.heappushpop(h, item)
    out_q, out_id, out_s = [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda x: (-x[0], -x[1]))
        for s, neg_id in best:
            out_q.append(qi)
            out_id.append(-neg_id)
            out_s.append(s)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int32()),
            id_col: pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float32()),
        }
    )


def lsh_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    seed: int = 5,
):
    """Approximate top-k: random-hyperplane signatures; batches only score
    vectors whose bucket is within hamming distance 1 of a query bucket.
    Same output shape as brute_force_topk."""
    import ray

    queries = np.asarray(queries, np.float32)
    dim = queries.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, num_planes).astype(np.float32)

    def sig(m: np.ndarray) -> np.ndarray:
        bits = (_normalize(m) @ planes) > 0
        keys = np.zeros(len(m), np.int64)
        for j in range(num_planes):
            keys |= bits[:, j].astype(np.int64) << j
        return keys

    q_sigs = sig(queries)
    # multi-probe: each query accepts its bucket plus all radius-1 neighbors
    accept: set[int] = set()
    for s in q_sigs:
        accept.add(int(s))
        for j in range(num_planes):
            accept.add(int(s) ^ (1 << j))
    qref = ray.put(queries)

    acc_sorted = np.sort(np.fromiter(accept, np.int64, len(accept)))

    def pruned_batch(t: pa.Table) -> pa.Table:
        inner = _BatchTopK(qref, k, vec_col, id_col)
        if t.num_rows == 0:
            return inner(t)
        vecs = vecs_np(t.column(vec_col))
        bits = (_normalize(vecs) @ planes) > 0
        keys = np.zeros(len(vecs), np.int64)
        for j in range(num_planes):
            keys |= bits[:, j].astype(np.int64) << j
        mask = np.isin(keys, acc_sorted)  # vectorized bucket membership
        return inner(t.filter(pa.array(mask)))

    partials = ds.map_batches(pruned_batch, batch_format="pyarrow", zero_copy_batch=True)
    heaps: dict[int, list] = {}
    for row in partials.take_all():
        h = heaps.setdefault(row["query_idx"], [])
        item = (row["score"], -row[id_col])
        if len(h) < k:
            heapq.heappush(h, item)
        else:
            heapq.heappushpop(h, item)
    out_q, out_id, out_s = [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda x: (-x[0], -x[1]))
        for s, neg_id in best:
            out_q.append(qi)
            out_id.append(-neg_id)
            out_s.append(s)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int32()),
            id_col: pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float32()),
        }
    )


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_clusters: int = 16,
    nprobe: int = 4,
    train_size: int = 2048,
    kmeans_iters: int = 8,
    seed: int = 7,
):
    """IVF (inverted-file) approximate top-k — the scale path for large
    corpora: k-means centroids trained on a bounded driver-side sample, then
    every batch scores ONLY vectors whose nearest centroid is among each
    query's ``nprobe`` closest centroids. Centroids are broadcast once via
    ``ray.put``; per-batch work is two small matmuls. Same output shape as
    brute_force_topk."""
    import ray

    queries = np.asarray(queries, np.float32)

    # --- train centroids on a sample (driver-side; bounded by train_size) ---
    sample = ds.limit(train_size).take_all()
    x = _normalize(np.stack([np.asarray(r[vec_col], np.float32) for r in sample]))
    rng = np.random.RandomState(seed)
    nc = min(num_clusters, len(x))
    cent = x[rng.choice(len(x), size=nc, replace=False)]
    for _ in range(kmeans_iters):
        assign = (x @ cent.T).argmax(axis=1)  # cosine == dot on unit vectors
        for c in range(nc):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                cent[c] = v / n if n else cent[c]
    qref = ray.put(queries)

    q_unit = _normalize(queries)
    probes = np.argsort(-(q_unit @ cent.T), axis=1)[:, :nprobe]
    probe_arr = np.unique(probes.ravel()).astype(np.int64)

    # task-based stage: centroids (small) + probe set close over the function;
    # the query matrix rides the broadcast-ref cache. Tasks scale with the
    # cluster instead of a fixed 4-actor pool.
    def ivf_batch(t: pa.Table) -> pa.Table:
        inner = _BatchTopK(qref, k, vec_col, id_col)
        if t.num_rows == 0:
            return inner(t)
        vecs = vecs_np(t.column(vec_col))
        assign = (_normalize(vecs) @ cent.T).argmax(axis=1)
        mask = np.isin(assign, probe_arr)
        return inner(t.filter(pa.array(mask)))

    partials = ds.map_batches(ivf_batch, batch_format="pyarrow", zero_copy_batch=True)
    heaps: dict[int, list] = {}
    for row in partials.take_all():
        h = heaps.setdefault(row["query_idx"], [])
        item = (row["score"], -row[id_col])
        if len(h) < k:
            heapq.heappush(h, item)
        else:
            heapq.heappushpop(h, item)
    out_q, out_id, out_s = [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda x: (-x[0], -x[1]))
        for s, neg_id in best:
            out_q.append(qi)
            out_id.append(-neg_id)
            out_s.append(s)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int32()),
            id_col: pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float32()),
        }
    )

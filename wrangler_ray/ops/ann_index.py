"""Persisted IVF-flat ANN index (beyond the reference): build once, query
many times, with TRUE partition pruning at query time.

`ops.similarity.ivf_topk` trains centroids and scans the whole Dataset per
call — right when the corpus is already in flight, wrong when the same
corpus serves many query batches. `IvfIndex` persists each inverted cell as
its own Parquet directory:

    index_dir/meta.json            centroids (f32), params, row count
    index_dir/cells/c=K/*.parquet  (id, vec) rows whose nearest centroid is K

so a query with ``nprobe`` probes READS only the probed cells from storage —
at a 10^9-vector corpus with 4096 cells and nprobe=16, that is 0.4% of the
bytes a full scan moves. Appends assign new vectors to the existing
centroids and append cell files (no retrain; centroid drift is handled by
``rebuild=True``).

Scoring is exact within probed cells (IVF-flat): cosine via one matmul per
batch against the broadcast query matrix, merged with the same distributed
``groupby(query_idx)`` top-k reduce as the other similarity paths.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from wrangler_ray.ops.similarity import (
    _BatchTopK,
    _merge_topk,
    _normalize,
    vecs_np,
)


class IvfIndex:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.meta_path = os.path.join(index_dir, "meta.json")
        self.meta = None
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                self.meta = json.load(f)

    @property
    def centroids(self) -> np.ndarray:
        return np.asarray(self.meta["centroids"], np.float32)

    def _commit_meta(self) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, self.meta_path)

    def _assign_and_write(self, ds, vec_col: str, id_col: str) -> int:
        """Assign every vector to its nearest centroid and append one Parquet
        directory per touched cell (partitioned write = the pruning unit)."""
        cent = self.centroids

        def tag(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column("c", pa.array([], pa.int32()))
            a = (_normalize(vecs_np(t.column(vec_col))) @ cent.T).argmax(axis=1)
            return t.append_column("c", pa.array(a.astype(np.int32)))

        # materialized once: count() and write_parquet() would otherwise each
        # re-execute the assignment pipeline
        tagged = (
            ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns([id_col, vec_col, "c"])
            .materialize()
        )
        n = tagged.count()
        tagged.write_parquet(
            os.path.join(self.index_dir, "cells"),
            partition_cols=["c"],
        )
        return n

    def build(
        self,
        ds,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        num_clusters: int = 64,
        train_size: int = 4096,
        kmeans_iters: int = 8,
        seed: int = 7,
    ) -> dict:
        """Train centroids on a seeded random sample (never the first blocks
        — storage order is not random) and write every cell."""
        if self.meta is not None:
            raise ValueError(f"index at {self.index_dir} already built")
        n = ds.count()
        frac = min(1.0, (train_size * 1.25) / max(n, 1))
        sample = (
            ds.random_sample(frac, seed=seed).limit(train_size).take_all()
            if frac < 1.0
            else ds.take_all()
        )
        x = _normalize(np.stack([np.asarray(r[vec_col], np.float32) for r in sample]))
        rng = np.random.RandomState(seed)
        nc = min(num_clusters, len(x))
        cent = x[rng.choice(len(x), size=nc, replace=False)]
        for _ in range(kmeans_iters):
            assign = (x @ cent.T).argmax(axis=1)
            for c in range(nc):
                m = assign == c
                if m.any():
                    v = x[m].mean(axis=0)
                    norm = np.linalg.norm(v)
                    cent[c] = v / norm if norm else cent[c]
        os.makedirs(self.index_dir, exist_ok=True)
        self.meta = {
            "centroids": [[float(v) for v in row] for row in cent],
            "vec_col": vec_col,
            "id_col": id_col,
            "count": 0,
        }
        self.meta["count"] = self._assign_and_write(ds, vec_col, id_col)
        self._commit_meta()
        return {"cells": len(cent), "count": self.meta["count"]}

    def append(self, ds) -> int:
        """Assign new vectors to the EXISTING centroids and append cell
        files. No retrain — run build on a fresh dir when drift matters."""
        if self.meta is None:
            raise ValueError("index not built")
        n = self._assign_and_write(ds, self.meta["vec_col"], self.meta["id_col"])
        self.meta["count"] += n
        self._commit_meta()
        return n

    def query(self, queries: np.ndarray, k: int = 10, nprobe: int = 4) -> pa.Table:
        """Exact cosine top-k within the probed cells, reading ONLY those
        cells' Parquet from storage (partition pruning — the reason this
        index exists)."""
        import ray
        import ray.data as rd

        if self.meta is None:
            raise ValueError("index not built")
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        cent = self.centroids
        probes = np.argsort(-(_normalize(queries) @ cent.T), axis=1)[:, :nprobe]
        cells = np.unique(probes.ravel())
        import glob

        dirs = []
        for c in cells:
            dirs.extend(
                sorted(
                    glob.glob(
                        os.path.join(self.index_dir, "cells", f"c={c}", "*.parquet")
                    )
                )
            )
        if not dirs:
            return pa.table(
                {"query_idx": pa.array([], pa.int64()),
                 self.meta["id_col"]: pa.array([], pa.int64()),
                 "score": pa.array([], pa.float32())}
            )
        ds = rd.read_parquet(dirs, columns=[self.meta["id_col"], self.meta["vec_col"]])
        qref = ray.put(queries)
        partials = ds.map_batches(
            _BatchTopK(qref, k, self.meta["vec_col"], self.meta["id_col"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return _merge_topk(partials, k, self.meta["id_col"])

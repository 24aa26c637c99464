"""Persisted incremental near-dup index (beyond the reference, the 100 TB
ingest shape): dedup each arriving increment against everything kept so far
WITHOUT re-signing the historical corpus.

A batch `minhash_lsh_dedup` over `corpus ∪ increment` re-shingles and
re-minhashes the whole corpus on every arrival — O(corpus) signing per
increment. `MinHashDedupIndex` persists the survivors' SIGNATURES
(num_perm × 8 bytes per doc, ~64× smaller than text) plus their texts under
``index_dir`` and unions the pre-signed table into the LSH candidate space
(`minhash_lsh_dedup(..., indexed=...)`), so each increment pays signing for
its own docs only. Historical texts are read column-pruned and ONLY for the
few borderline-band candidates that need exact shingle-set verification.

Semantics — "old doc wins": incoming ids must exceed the index watermark
(monotone, LSN-like — the natural shape of an ingest pipeline), so every
cluster minimum lands on the indexed side and an incoming near-dup of any
kept document is dropped. Kept documents are never retroactively removed.
With monotone ids the incremental survivor set provably equals the batch
run over the concatenated corpus (pinned by the in-repo A/B test and the
``dedup_index_incremental_invariant`` driver oracle).

Storage layout (resumable: one subdirectory per committed increment):

    index_dir/meta.json                      {params, watermark, count, incr}
    index_dir/texts/incr-00000K/*.parquet    (id, text)
    index_dir/signatures/incr-00000K/*.parquet  (id, sig, dig)

The meta commit is atomic (tmp + rename) and happens LAST, so a crashed
increment leaves only unreferenced files: re-running the increment is safe
and the orphan directories are simply overwritten.

At 100 TB the signatures table itself is large; the scale path keeps it
hash-partitioned by band key so an increment reads only the band partitions
its own keys hash to — the layout above is one `read_parquet` filter away
from that, and the banding shuffle already buckets by the same key.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from wrangler_ray.ops.dedup import (
    MinHasher,
    _mix64,
    _shingle_hashes,
    exact_dedup,
    minhash_lsh_dedup,
)


class MinHashDedupIndex:
    def __init__(
        self,
        index_dir: str,
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        jaccard_threshold: float = 0.8,
    ):
        self.index_dir = index_dir
        self.meta_path = os.path.join(index_dir, "meta.json")
        params = {
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
            "jaccard_threshold": jaccard_threshold,
        }
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                meta = json.load(f)
            for k, v in params.items():
                if meta[k] != v:
                    raise ValueError(
                        f"index at {index_dir} was built with {k}={meta[k]}, "
                        f"got {v} — signatures are not comparable across "
                        "parameter sets"
                    )
            self.meta = meta
        else:
            os.makedirs(index_dir, exist_ok=True)
            self.meta = {**params, "watermark": None, "count": 0, "incr": 0}

    @property
    def watermark(self):
        return self.meta["watermark"]

    @property
    def count(self) -> int:
        return self.meta["count"]

    def _incr_dirs(self, kind: str) -> list:
        root = os.path.join(self.index_dir, kind)
        if not os.path.isdir(root):
            return []
        import glob

        files: list = []
        for d in sorted(os.listdir(root)):
            # only directories the committed meta references (an increment
            # that crashed before its meta commit leaves orphans — ignored)
            if d.startswith("incr-") and int(d.split("-")[1]) < self.meta["incr"]:
                files.extend(sorted(glob.glob(os.path.join(root, d, "*.parquet"))))
        return files

    def _commit_meta(self) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, self.meta_path)

    def dedup_increment(self, ds, text_col: str = "text", id_col: str = "doc_id"):
        """Dedup one arriving increment against the index AND within itself;
        append the survivors (texts + signatures) to the index; return the
        surviving rows of ``ds`` as a materialized Dataset."""
        import ray.data as rd

        lo = ds.min(id_col)
        if lo is None:  # empty increment — nothing to do, commit nothing
            return ds.materialize()
        if self.meta["watermark"] is not None and lo <= self.meta["watermark"]:
            raise ValueError(
                f"incoming min {id_col}={lo} is not past the index watermark "
                f"{self.meta['watermark']} — ids must be monotone so kept "
                "documents always win their clusters"
            )
        ds = exact_dedup(ds, text_col=text_col, id_col=id_col)

        sig_dirs = self._incr_dirs("signatures")
        text_dirs = self._incr_dirs("texts")
        indexed = None
        if sig_dirs:
            import pyarrow.dataset as pads

            def texts_for(ids):
                # borderline-candidate fetch with the id filter pushed into
                # the parquet read: increments are id-monotone, so each
                # file's row-group id stats are tight and non-matching
                # files/row-groups prune instead of scanning the whole
                # historical text corpus
                flt = pads.field(id_col).isin(pa.array(np.asarray(ids)))
                return rd.read_parquet(text_dirs, filter=flt)

            indexed = (texts_for, rd.read_parquet(sig_dirs))
        out = minhash_lsh_dedup(
            ds,
            text_col=text_col,
            id_col=id_col,
            num_perm=self.meta["num_perm"],
            bands=self.meta["bands"],
            jaccard_threshold=self.meta["jaccard_threshold"],
            shingle_k=self.meta["shingle_k"],
            pre_exact=False,  # done above, against raw text
            indexed=indexed,
        ).materialize()

        k = self.meta["incr"]
        hasher = MinHasher(
            num_perm=self.meta["num_perm"], shingle_k=self.meta["shingle_k"]
        )
        num_perm = self.meta["num_perm"]
        shingle_k = self.meta["shingle_k"]

        def sign_rows(t: pa.Table) -> pa.Table:
            texts = t.column(text_col).to_pylist()
            n = len(texts)
            sigs = np.empty((n, num_perm), np.uint64)
            digs = np.empty(n, np.uint64)
            for i, x in enumerate(texts):
                sh = _shingle_hashes(x, shingle_k)
                if len(sh) == 0:
                    sigs[i] = np.iinfo(np.uint64).max
                    digs[i] = 0
                    continue
                with np.errstate(over="ignore"):
                    prod = sh[None, :] * hasher.a[:, None] + hasher.b[:, None]
                    sigs[i] = prod.min(axis=1)
                    digs[i] = _mix64(np.bitwise_xor.reduce(np.unique(sh))[None])[0]
            return pa.table(
                {
                    id_col: t.column(id_col),
                    "sig": pa.FixedSizeListArray.from_arrays(
                        pa.array(sigs.astype(np.int64).ravel(), pa.int64()), num_perm
                    ),
                    "dig": pa.array(digs.astype(np.int64), pa.int64()),
                }
            )

        # a crashed previous attempt at THIS increment leaves orphan files in
        # the uncommitted incr-k dirs; clear them so the re-run replaces
        # rather than appends (write_parquet generates fresh file names)
        import shutil

        for kind in ("texts", "signatures"):
            leftover = os.path.join(self.index_dir, kind, f"incr-{k:06d}")
            if os.path.isdir(leftover):
                shutil.rmtree(leftover)

        texts_only = out.select_columns([id_col, text_col])
        texts_only.write_parquet(
            os.path.join(self.index_dir, "texts", f"incr-{k:06d}")
        )
        texts_only.map_batches(
            sign_rows, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(os.path.join(self.index_dir, "signatures", f"incr-{k:06d}"))

        n_kept = out.count()
        if n_kept:
            self.meta["watermark"] = int(out.max(id_col))
        self.meta["count"] += int(n_kept)
        self.meta["incr"] = k + 1
        self._commit_meta()
        return out

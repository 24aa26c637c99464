"""Persisted incremental near-dup index (beyond the reference, the 100 TB
ingest shape): dedup each arriving increment against everything kept so far
WITHOUT re-signing — or even re-reading — the historical corpus.

A batch `minhash_lsh_dedup` over `corpus ∪ increment` re-shingles and
re-minhashes the whole corpus on every arrival — O(corpus) signing per
increment. `MinHashDedupIndex` persists three things per committed
increment under ``index_dir``:

- the survivors' TEXTS (borderline exact verification only, id-filtered),
- their SIGNATURES (num_perm × 8 bytes per doc, candidate-endpoint
  verification only, id-filtered),
- their BAND ROWS (band, key, id, dig — the LSH candidate space itself),
  hash-partitioned by ``pb = key % sig_parts``.

An arriving increment signs + bands ITS OWN docs, then reads back only the
``pb`` partitions its own band keys hash to (with the exact key set pushed
into the parquet read as a filter when small enough to broadcast) — so
historical I/O per increment is O(increment ∩ index), not O(index).
Candidate pairs whose both endpoints are historical are dropped (they were
resolved when those docs were indexed). Signatures/texts of historical
CANDIDATE ENDPOINTS are fetched by id-filtered reads (row-group pruning —
increments are id-monotone, so per-file id stats are tight).

Semantics — "old doc wins": incoming ids must exceed the index watermark
(monotone, LSN-like — the natural shape of an ingest pipeline), so every
cluster minimum lands on the indexed side and an incoming near-dup of any
kept document is dropped. Kept documents are never retroactively removed.
With monotone ids the incremental survivor set provably equals the batch
run over the concatenated corpus (pinned by the in-repo A/B test and the
``dedup_index_incremental_invariant`` driver oracle).

Storage layout (v2; one subdirectory per committed increment):

    index_dir/meta.json                         {params, watermark, count, incr}
    index_dir/texts/incr-00000K/*.parquet       (id, text)
    index_dir/signatures/incr-00000K/*.parquet  (id, sig, dig)
    index_dir/bands/incr-00000K/pb=J/*.parquet  (band, key, id, dig)

The meta commit is atomic (tmp + rename) and happens LAST, so a crashed
increment leaves only unreferenced files: re-running the increment is safe
and the orphan directories are deleted and rewritten. All storage goes
through ``pyarrow.fs`` (``filesystem=`` injectable — object-store capable).

v1 indexes (built before the band layout existed, meta without ``layout``)
keep working: they fall back to the legacy full-signature-table read and
never gain band partitions — rebuild to get pruned increments.
"""
from __future__ import annotations

import posixpath

import numpy as np
import pyarrow as pa

from wrangler_ray.ops import fsio
from wrangler_ray.ops.dedup import (
    _coarse_bucket,
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
        sig_parts: int = 64,
        filesystem=None,
    ):
        self.fs, self.index_dir = fsio.resolve_fs(index_dir, filesystem)
        self.meta_path = posixpath.join(self.index_dir, "meta.json")
        params = {
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
            "jaccard_threshold": jaccard_threshold,
        }
        meta = fsio.read_json(self.fs, self.meta_path)
        if meta is not None:
            for k, v in params.items():
                if meta[k] != v:
                    raise ValueError(
                        f"index at {index_dir} was built with {k}={meta[k]}, "
                        f"got {v} — signatures are not comparable across "
                        "parameter sets"
                    )
            if meta.get("layout", 1) >= 2 and meta["sig_parts"] != sig_parts:
                raise ValueError(
                    f"index at {index_dir} was built with "
                    f"sig_parts={meta['sig_parts']}, got {sig_parts}"
                )
            self.meta = meta
        else:
            self.fs.create_dir(self.index_dir, recursive=True)
            self.meta = {
                **params,
                "sig_parts": sig_parts,
                "layout": 2,
                "id_col": None,
                "text_col": None,
                "watermark": None,
                "count": 0,
                "incr": 0,
            }

    @property
    def watermark(self):
        return self.meta["watermark"]

    @property
    def count(self) -> int:
        return self.meta["count"]

    @property
    def sig_parts(self) -> int:
        return self.meta["sig_parts"]

    def _incr_files(self, kind: str, sub: str | None = None) -> list:
        """Parquet files of every COMMITTED increment under ``kind`` (an
        increment that crashed before its meta commit leaves orphan dirs —
        ignored; after a compact() only ``live_incrs`` count); ``sub``
        narrows to one partition subdir per increment."""
        root = posixpath.join(self.index_dir, kind)
        live = self.meta.get("live_incrs")
        names = [f"incr-{int(j):06d}" for j in live] if live is not None else None
        files: list = []
        for d in fsio.list_subdirs(self.fs, root):
            if not d.startswith("incr-"):
                continue
            if (d not in names) if names is not None else (
                int(d.split("-")[1]) >= self.meta["incr"]
            ):
                continue
            p = posixpath.join(root, d)
            if sub is not None:
                p = posixpath.join(p, sub)
            # band files nest one level deeper (pb=J/) — recurse so a
            # sub-less listing (compaction) still sees them
            files.extend(fsio.list_parquet(self.fs, p, recursive=sub is None))
        return files

    def _vacuum_orphans(self) -> int:
        """Delete dead incr dirs left by a crash between a compact's meta
        commit and its old-dir deletion: any ``incr-j`` with ``j <
        meta['incr']`` not in the committed ``live_incrs`` set is
        unreachable (``_incr_files`` never lists it) and would otherwise
        leak forever — the next compact would see ≤1 live dir and return
        early without sweeping. In-flight dirs (``j >= meta['incr']``) are
        left alone. Returns dirs removed."""
        live = self.meta.get("live_incrs")
        if live is None:  # pre-compaction layout: all j < incr are live
            return 0
        live_names = {f"incr-{int(j):06d}" for j in live}
        removed = 0
        for kind in ("texts", "signatures", "bands"):
            root = posixpath.join(self.index_dir, kind)
            for d in fsio.list_subdirs(self.fs, root):
                if (
                    d.startswith("incr-")
                    and d not in live_names
                    and int(d.split("-")[1]) < self.meta["incr"]
                ):
                    fsio.delete_dir(self.fs, posixpath.join(root, d))
                    removed += 1
        return removed

    def compact(self) -> int:
        """Fold every committed increment's texts / signatures / band rows
        into ONE consolidated increment — per-increment file counts grow
        with ingest age, and ``banded_for`` lists one directory per
        (increment × pb partition). Rows are re-sorted (texts/signatures by
        id, band rows by key) so the id- and key-filter pushdowns keep tight
        row-group stats. Crash-safe like an increment: the consolidated
        directories only become visible at the meta commit (live_incrs
        switch); old directories are deleted after (a crash in between
        leaves dead dirs that the next compact's ``_vacuum_orphans`` sweeps
        before the ≤1-dir early return). Returns docs consolidated."""
        import ray.data as rd

        if self.meta.get("layout", 1) < 2:
            raise ValueError("compact() requires the v2 (banded) layout")
        if self.meta["incr"] == 0:
            return 0
        self._vacuum_orphans()
        old = {k: self._incr_files(k) for k in ("texts", "signatures", "bands")}
        n_dirs = len({posixpath.dirname(f) for f in old["texts"]})
        if n_dirs <= 1:
            return 0
        id_col = self.meta["id_col"]
        k = self.meta["incr"]
        for kind in ("texts", "signatures", "bands"):
            fsio.delete_dir(
                self.fs, posixpath.join(self.index_dir, kind, f"incr-{k:06d}")
            )
        texts = rd.read_parquet(old["texts"], filesystem=self.fs).sort(id_col)
        texts = texts.materialize()
        n = texts.count()
        texts.write_parquet(
            posixpath.join(self.index_dir, "texts", f"incr-{k:06d}"),
            filesystem=self.fs,
        )
        rd.read_parquet(old["signatures"], filesystem=self.fs).sort(
            id_col
        ).write_parquet(
            posixpath.join(self.index_dir, "signatures", f"incr-{k:06d}"),
            filesystem=self.fs,
        )
        parts = self.meta["sig_parts"]

        def re_pb(t: pa.Table) -> pa.Table:
            # band files carry (band, key, id, dig); pyarrow re-infers the pb
            # partition from file paths as a string — rebuild it as int32
            key = t.column("key").to_numpy(zero_copy_only=False)
            cols = {c: t.column(c) for c in ("band", "key", id_col, "dig")}
            cols["pb"] = pa.array((key % parts).astype(np.int32))
            return pa.table(cols)

        rd.read_parquet(old["bands"], filesystem=self.fs).map_batches(
            re_pb, batch_format="pyarrow", zero_copy_batch=True
        ).sort("key").write_parquet(
            posixpath.join(self.index_dir, "bands", f"incr-{k:06d}"),
            partition_cols=["pb"],
            filesystem=self.fs,
        )
        self.meta["incr"] = k + 1
        self.meta["live_incrs"] = [k]
        self._commit_meta()
        old_dirs = {posixpath.dirname(f) for files in old.values() for f in files}
        for d in sorted(old_dirs):
            # band files live one level deeper (pb=J); delete the incr root
            if posixpath.basename(d).startswith("pb="):
                d = posixpath.dirname(d)
            fsio.delete_dir(self.fs, d)
        return n

    def _commit_meta(self) -> None:
        fsio.write_json_atomic(self.fs, self.meta_path, self.meta)

    # -- the banded-index protocol consumed by minhash_lsh_dedup ----------

    def texts_for(self, ids):
        """(id, text) rows for the given candidate ids, with the id filter
        pushed into the parquet read: increments are id-monotone, so each
        file's row-group id stats are tight and non-matching files/row-groups
        prune instead of scanning the whole historical text corpus."""
        import pyarrow.dataset as pads
        import ray.data as rd

        flt = pads.field(self.meta["id_col"]).isin(pa.array(np.asarray(ids)))
        return rd.read_parquet(
            self._incr_files("texts"), filter=flt, filesystem=self.fs
        )

    def sigs_for(self, ids=None):
        """(id, sig, dig) rows for the given candidate ids (None = the whole
        table — only the no-driver-state distributed tail needs that)."""
        import pyarrow.dataset as pads
        import ray.data as rd

        flt = None
        if ids is not None:
            flt = pads.field(self.meta["id_col"]).isin(pa.array(np.asarray(ids)))
        return rd.read_parquet(
            self._incr_files("signatures"), filter=flt, filesystem=self.fs
        )

    def banded_for(self, pbs, keys=None):
        """Historical band rows from ONLY the ``pb`` partitions in ``pbs``,
        further filtered to the exact ``keys`` when provided — the pruned
        read that makes per-increment I/O O(increment), not O(index)."""
        import pyarrow.dataset as pads
        import ray.data as rd

        id_col = self.meta["id_col"]
        files: list = []
        for j in np.asarray(pbs).tolist():
            files.extend(self._incr_files("bands", sub=f"pb={int(j)}"))

        def empty() -> pa.Table:
            return pa.table(
                {"_bkt": pa.array([], pa.int32()),
                 "band": pa.array([], pa.int32()),
                 "key": pa.array([], pa.int64()),
                 id_col: pa.array([], pa.int64()),
                 "dig": pa.array([], pa.int64())}
            )

        if not files:
            return rd.from_arrow(empty())
        flt = None
        if keys is not None:
            flt = pads.field("key").isin(pa.array(np.asarray(keys, np.int64)))

        def add_bkt(t: pa.Table) -> pa.Table:
            # recompute the coarse shuffle bucket from (key, band) — the same
            # derivation the in-flight banding uses, so persisted rows land
            # in the same groupby buckets as the increment's
            if t.num_rows == 0:
                return empty()
            key = t.column("key").to_numpy(zero_copy_only=False)
            band = t.column("band").to_numpy(zero_copy_only=False)
            return pa.table(
                {"_bkt": pa.array(_coarse_bucket(key, band)),
                 "band": t.column("band"),
                 "key": t.column("key"),
                 id_col: t.column(id_col),
                 "dig": t.column("dig")}
            )

        return rd.read_parquet(files, filter=flt, filesystem=self.fs).map_batches(
            add_bkt, batch_format="pyarrow", zero_copy_batch=True
        )

    def _legacy_indexed(self, id_col: str):
        """v1 indexes have no band partitions: fall back to the legacy tuple
        protocol (full signature-table read, re-banded in flight)."""
        import ray.data as rd

        sig_files = self._incr_files("signatures")
        if not sig_files:
            return None
        return (self.texts_for, rd.read_parquet(sig_files, filesystem=self.fs))

    # -- ingest -------------------------------------------------------------

    def dedup_increment(self, ds, text_col: str = "text", id_col: str = "doc_id"):
        """Dedup one arriving increment against the index AND within itself;
        append the survivors (texts + signatures + band rows) to the index;
        return the surviving rows of ``ds`` as a materialized Dataset.
        Survivor signatures/band rows are the ones the dedup itself computed
        — filtered, never re-derived."""
        import ray

        lo = ds.min(id_col)
        if lo is None:  # empty increment — nothing to do, commit nothing
            return ds.materialize()
        if self.meta["watermark"] is not None and lo <= self.meta["watermark"]:
            raise ValueError(
                f"incoming min {id_col}={lo} is not past the index watermark "
                f"{self.meta['watermark']} — ids must be monotone so kept "
                "documents always win their clusters"
            )
        legacy = self.meta.get("layout", 1) < 2
        if self.meta.get("id_col") is None:
            self.meta["id_col"] = id_col
            self.meta["text_col"] = text_col
        elif self.meta["id_col"] != id_col or self.meta["text_col"] != text_col:
            raise ValueError(
                f"index at {self.index_dir} stores "
                f"({self.meta['id_col']}, {self.meta['text_col']}) columns, "
                f"got ({id_col}, {text_col})"
            )
        # materialized: the deduped increment is consumed several times
        # downstream (signing, banding, borderline fetch, survivor filter,
        # text write) — lazy, each consumption re-runs the exchange
        ds = exact_dedup(ds, text_col=text_col, id_col=id_col).materialize()

        indexed = None
        if self.meta["incr"] > 0:
            indexed = self._legacy_indexed(id_col) if legacy else self
        out, signed, banded = minhash_lsh_dedup(
            ds,
            text_col=text_col,
            id_col=id_col,
            num_perm=self.meta["num_perm"],
            bands=self.meta["bands"],
            jaccard_threshold=self.meta["jaccard_threshold"],
            shingle_k=self.meta["shingle_k"],
            pre_exact=False,  # done above, against raw text
            indexed=indexed,
            return_artifacts=True,
        )
        out = out.materialize()

        # a crashed previous attempt at THIS increment leaves orphan files in
        # the uncommitted incr-k dirs; clear them so the re-run replaces
        # rather than appends (write_parquet generates fresh file names)
        k = self.meta["incr"]
        for kind in ("texts", "signatures", "bands"):
            fsio.delete_dir(
                self.fs, posixpath.join(self.index_dir, kind, f"incr-{k:06d}")
            )

        surv = np.sort(np.concatenate(
            [t.column(id_col).to_numpy(zero_copy_only=False)
             for t in out.select_columns([id_col]).iter_batches(
                 batch_size=None, batch_format="pyarrow")]
            or [np.empty(0, np.int64)]
        ))
        surv_ref = ray.put(surv)

        def keep_surv(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(ids, ray.get(surv_ref))))

        out.select_columns([id_col, text_col]).write_parquet(
            posixpath.join(self.index_dir, "texts", f"incr-{k:06d}"),
            filesystem=self.fs,
        )
        signed.map_batches(
            keep_surv, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(
            posixpath.join(self.index_dir, "signatures", f"incr-{k:06d}"),
            filesystem=self.fs,
        )
        if not legacy:
            parts = self.meta["sig_parts"]

            def band_out(t: pa.Table) -> pa.Table:
                t = keep_surv(t)
                key = t.column("key").to_numpy(zero_copy_only=False)
                pb = (key % parts).astype(np.int32)
                return t.drop_columns(["_bkt"]).append_column("pb", pa.array(pb))

            # sorted by key before the partitioned write: each written file's
            # key row-group stats become tight ranges, so banded_for's
            # key-isin filter prunes row groups instead of scanning them
            banded.map_batches(
                band_out, batch_format="pyarrow", zero_copy_batch=True
            ).sort("key").write_parquet(
                posixpath.join(self.index_dir, "bands", f"incr-{k:06d}"),
                partition_cols=["pb"],
                filesystem=self.fs,
            )

        n_kept = out.count()
        if n_kept:
            self.meta["watermark"] = int(out.max(id_col))
        self.meta["count"] += int(n_kept)
        if self.meta.get("live_incrs") is not None:  # post-compaction layout
            self.meta["live_incrs"].append(k)
        self.meta["incr"] = k + 1
        self._commit_meta()
        return out

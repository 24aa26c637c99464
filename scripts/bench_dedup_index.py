"""Evidence that MinHashDedupIndex v2 increments read O(increment-matches)
historical data, not O(index): index the sf documents corpus in equal-size
increments under BOTH layouts and record, per increment, how many historical
rows each pulls into the dedup pipeline.

- v1 (legacy): the FULL signature table (num_perm×8 B ≈ 520 B/doc) is read
  and re-banded every increment — rows read = index size, growing linearly
  with corpus age for constant increment size.
- v2 (banded): only the persisted band rows whose (pb partition, exact key)
  match the increment's own band keys enter the pipeline — the true
  candidate set (28 B/row), plus id-filtered signature/text fetches for
  candidate-edge endpoints only.

Run:  python scripts/bench_dedup_index.py [sf_dir] [n_increments]
Prints one JSON line per increment per layout plus a summary.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_layout(docs, bounds, legacy: bool) -> list:
    import ray.data as rd

    from wrangler_ray.ops.dedup_index import MinHashDedupIndex

    work = tempfile.mkdtemp(prefix=f"wr_idx_bench_{'v1' if legacy else 'v2'}_")
    idx = MinHashDedupIndex(work)
    if legacy:  # force the v1 code path: no band partitions, full sig reads
        idx.meta.pop("layout")
        idx.meta.pop("sig_parts")

    reads: dict = {}
    orig_banded_for = MinHashDedupIndex.banded_for

    def spy(self, pbs, keys=None):
        ds = orig_banded_for(self, pbs, keys).materialize()
        reads["hist_rows"] = ds.count()
        return ds

    MinHashDedupIndex.banded_for = spy
    rows = []
    try:
        for i, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            inc = rd.from_arrow(docs.slice(lo, hi - lo)).repartition(8)
            reads.clear()
            before = idx.count
            t0 = time.time()
            kept = idx.dedup_increment(inc).count()
            dt = time.time() - t0
            # v1 reads the whole signature table and bands it in flight:
            # 16 band rows per indexed doc enter the candidate shuffle
            hist_rows = (
                before * 16 if legacy else int(reads.get("hist_rows", 0))
            )
            row = {
                "layout": "v1" if legacy else "v2",
                "incr": i,
                "incr_docs": int(hi - lo),
                "kept": int(kept),
                "index_docs_before": int(before),
                "hist_band_rows_into_pipeline": hist_rows,
                "sec": round(dt, 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    finally:
        MinHashDedupIndex.banded_for = orig_banded_for
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_incr = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    ids = docs.column("doc_id").to_numpy()
    docs = docs.take(pa.array(np.argsort(ids)))
    bounds = np.linspace(0, docs.num_rows, n_incr + 1).astype(int)

    v2 = run_layout(docs, bounds, legacy=False)
    v1 = run_layout(docs, bounds, legacy=True)
    assert [r["kept"] for r in v1] == [r["kept"] for r in v2], "layouts disagree"

    tail1, tail2 = v1[1:], v2[1:]
    print(json.dumps({
        "summary": "historical band rows entering the pipeline per increment",
        "survivors_identical": True,
        "v1_full_read": [r["hist_band_rows_into_pipeline"] for r in tail1],
        "v2_pruned_read": [r["hist_band_rows_into_pipeline"] for r in tail2],
        "v2_over_v1_pct": [
            round(100 * b["hist_band_rows_into_pipeline"]
                  / max(a["hist_band_rows_into_pipeline"], 1), 1)
            for a, b in zip(tail1, tail2)
        ],
        "v1_sec": [r["sec"] for r in tail1],
        "v2_sec": [r["sec"] for r in tail2],
    }), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Self-run correctness pre-flight: execute EVERY `__ray_entry__.queries()`
entry against its `oracle_sql()` DuckDB oracle with the driver's compare
shape (sorted columns, row-value equality, 1e-6 float tolerance) — the
same gate CORRECTNESS_r{N}.json records, but over the FULL query set
instead of a capped window. Run before ending a round:

    python scripts/preflight_correctness.py [sf_dir]

Prints one line per query and a JSON summary; exits nonzero on any FAIL.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    def to_df(res):
        if isinstance(res, ray.data.Dataset):
            res = pa.concat_tables(
                res.iter_batches(batch_size=None, batch_format="pyarrow")
            )
        return res.to_pandas() if isinstance(res, pa.Table) else res

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    fails, okc, noc = [], 0, 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = to_df(fn(sf))
            if name not in osql:
                noc += 1
                print(f"{name}: no_oracle rows={len(got)} "
                      f"{time.time() - t0:.1f}s", flush=True)
                continue
            g, e = norm(got), norm(con.execute(osql[name]).df())
            ok = g.shape == e.shape and list(g.columns) == list(e.columns)
            if ok:
                for c in g.columns:
                    gv, ev = g[c].to_numpy(), e[c].to_numpy()
                    if gv.dtype.kind == "f" or ev.dtype.kind == "f":
                        ok = np.allclose(gv.astype(float), ev.astype(float),
                                         atol=1e-6, equal_nan=True)
                    else:
                        ok = (pd.Series(gv).astype(str)
                              == pd.Series(ev).astype(str)).all()
                    if not ok:
                        break
            if ok:
                okc += 1
            else:
                fails.append(name)
            print(f"{name}: {'OK' if ok else 'FAIL'} rows={len(g)}/{len(e)} "
                  f"{time.time() - t0:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            fails.append(name)
            print(f"{name}: ERROR {type(ex).__name__}: {ex}", flush=True)
    print(json.dumps({"ok": okc, "no_oracle": noc, "fails": fails}), flush=True)
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

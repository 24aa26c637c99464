"""Single-threaded reference replay (the correctness oracle, FIXTURES.md §4):
apply every change event in lsn order, row by row, to a dict keyed by
(conv_id, turn_idx). The engine's merged table must match this under the
per-turn text-equality invariant with stable turn ordering."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def replay_oracle(base_path: str, segment_paths: list[str], upto_lsn: int | None = None) -> pd.DataFrame:
    base = pq.read_table(base_path).to_pandas()
    state: dict = {}
    columns = list(base.columns)
    for _, row in base.iterrows():
        state[(row["conv_id"], row["turn_idx"])] = row.to_dict()

    frames = []
    for p in segment_paths:
        df = pq.read_table(p).to_pandas()
        if upto_lsn is not None:
            df = df[df["lsn"] <= upto_lsn]
        if len(df):
            frames.append(df)
            # additive schema evolution: a column exists in the final table
            # only once a contributing segment actually carries it
            for col in df.columns:
                if col not in columns and col not in ("lsn", "op"):
                    columns.append(col)
    if not frames:
        df = base.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        return df
    events = pd.concat(frames, ignore_index=True).sort_values("lsn")
    for _, ev in events.iterrows():
        key = (ev["conv_id"], ev["turn_idx"])
        if ev["op"] == "D":
            state.pop(key, None)
        else:
            rec = {c: ev.get(c) for c in columns}
            state[key] = rec
    if not state:
        return pd.DataFrame(columns=columns)
    df = pd.DataFrame.from_records(list(state.values()))
    for c in columns:
        if c not in df.columns:
            df[c] = None
    df = df[columns]
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def assert_tables_equal(engine_table: pa.Table, oracle_df: pd.DataFrame) -> None:
    """Per-turn equality with stable ordering: compare on (conv_id, turn_idx)
    → text (the invariant) plus every surviving column."""
    eng = engine_table.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ora = oracle_df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(eng) == len(ora), f"row count {len(eng)} != oracle {len(ora)}"
    eng_keys = list(zip(eng["conv_id"], eng["turn_idx"]))
    ora_keys = list(zip(ora["conv_id"], ora["turn_idx"]))
    assert eng_keys == ora_keys, "key sets / ordering differ"
    assert list(eng["text"].fillna("")) == list(ora["text"].fillna("")), "text mismatch"
    for col in ora.columns:
        if col in ("conv_id", "turn_idx", "text"):
            continue
        if col not in eng.columns:
            raise AssertionError(f"engine missing column {col}")
        a = eng[col]
        b = ora[col]
        if a.dtype.kind == "M" or b.dtype.kind == "M":
            a = pd.to_datetime(a)
            b = pd.to_datetime(b)
        mism = ~((a == b) | (a.isna() & b.isna()))
        assert not mism.any(), f"column {col}: {int(mism.sum())} mismatches"

"""Deterministic synthetic binlog/WAL generator for the CDC engine.

Produces (seeded, reproducible at any scale):
- a base snapshot: multi-turn conversation transcripts
  (conv_id, turn_idx, role, text, tool, ts) — the input_hint shape
- N binlog *segment* parquet files of change events
  (lsn, op∈{I,U,D}, conv_id, turn_idx, role, text, tool, ts [, model])

Guarantees exercised by the tests (FIXTURES.md §2):
- Zipf-skewed conversation sizes → hot keys (exercises the combiner/salting)
- multiple updates to the same (conv_id, turn_idx) at different lsn (LWW)
- deletes followed by re-inserts
- events for one conversation spread across segments (cross-batch merge)
- later segments carry an additive `model` column (schema evolution)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "calc", "browse", "code", "", None]
_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa question answer "
    "model token prompt response tool call result data stream merge turn"
).split()

BASE_TS_US = 1_700_000_000_000_000  # fixed epoch base for determinism


def _texts(rng: np.random.RandomState, n: int) -> list[str]:
    out = []
    for _ in range(n):
        k = int(rng.randint(5, 40))
        idx = rng.randint(0, len(_WORDS), size=k)
        out.append(" ".join(_WORDS[i] for i in idx))
    return out


def generate_base(
    n_convs: int = 200, seed: int = 42, mean_turns: int = 10
) -> pa.Table:
    """Base transcript snapshot: Zipf-ish turn counts per conversation."""
    rng = np.random.RandomState(seed)
    # long-tailed conversation lengths: a few very long ("hot") conversations
    lens = np.minimum((rng.pareto(1.5, size=n_convs) + 1) * mean_turns / 3, 500).astype(
        np.int64
    )
    lens = np.maximum(lens, 1)
    conv_ids = []
    turn_idx = []
    for i, ln in enumerate(lens):
        conv_ids.extend([f"conv-{i:08d}"] * int(ln))
        turn_idx.extend(range(int(ln)))
    n = len(conv_ids)
    roles = [_ROLES[t % 3] for t in turn_idx]
    tools = [_TOOLS[int(x)] for x in rng.randint(0, len(_TOOLS), size=n)]
    ts = BASE_TS_US + np.arange(n, dtype=np.int64) * 1_000_000
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(_texts(rng, n), pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def generate_change_stream(
    out_dir: str,
    base: pa.Table | None = None,
    n_convs: int = 200,
    n_events: int = 5000,
    n_segments: int = 5,
    seed: int = 42,
    evolve_schema_at_segment: int | None = None,
    start_lsn: int = 1,
) -> dict:
    """Write base snapshot + binlog segments under out_dir.

    Returns {"base": path, "segments": [paths...], "max_lsn": int}.
    evolve_schema_at_segment: from that segment index on, events carry an
    additive `model: string` column.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed + 1)
    if base is None:
        base = generate_base(n_convs=n_convs, seed=seed)
    base_path = os.path.join(out_dir, "base.parquet")
    pq.write_table(base, base_path)

    if evolve_schema_at_segment is None:
        evolve_schema_at_segment = max(1, n_segments - 2)

    # Existing keys for update/delete targeting; Zipf-weighted conv choice so
    # hot conversations receive disproportionate updates (skew).
    conv_arr = base.column("conv_id").to_pylist()
    turn_arr = base.column("turn_idx").to_pylist()
    keys = list(zip(conv_arr, turn_arr))
    zipf_w = 1.0 / (np.arange(len(keys)) + 1.0) ** 0.7
    zipf_w /= zipf_w.sum()

    max_turn: dict[str, int] = {}
    for c, t in keys:
        max_turn[c] = max(max_turn.get(c, -1), t)
    convs = sorted(max_turn)

    deleted: set = set()
    lsn = start_lsn
    seg_paths = []
    per_seg = n_events // n_segments
    for seg in range(n_segments):
        n_here = per_seg if seg < n_segments - 1 else n_events - per_seg * (n_segments - 1)
        ops = rng.choice(["U", "I", "D"], size=n_here, p=[0.6, 0.3, 0.1])
        rows = {
            "lsn": [], "op": [], "conv_id": [], "turn_idx": [], "role": [],
            "text": [], "tool": [], "ts": [],
        }
        evolve = seg >= evolve_schema_at_segment
        if evolve:
            rows["model"] = []
        texts = _texts(rng, n_here)
        for j, op in enumerate(ops):
            if op == "U":
                # update an existing (possibly deleted → becomes re-insert-ish;
                # LWW semantics treat U on absent key as upsert)
                ki = int(rng.choice(len(keys), p=zipf_w))
                c, t = keys[ki]
            elif op == "I":
                if rng.rand() < 0.15 and deleted:
                    # re-insert a previously deleted key
                    c, t = next(iter(deleted))
                    deleted.discard((c, t))
                else:
                    c = convs[int(rng.randint(len(convs)))]
                    max_turn[c] += 1
                    t = max_turn[c]
                    keys.append((c, t))
                    zipf_w = 1.0 / (np.arange(len(keys)) + 1.0) ** 0.7
                    zipf_w /= zipf_w.sum()
            else:  # D
                ki = int(rng.choice(len(keys), p=zipf_w))
                c, t = keys[ki]
                deleted.add((c, t))
            rows["lsn"].append(lsn)
            rows["op"].append(op)
            rows["conv_id"].append(c)
            rows["turn_idx"].append(t)
            if op == "D":
                rows["role"].append(None)
                rows["text"].append(None)
                rows["tool"].append(None)
            else:
                rows["role"].append(_ROLES[t % 3])
                rows["text"].append(texts[j])
                rows["tool"].append(_TOOLS[int(rng.randint(len(_TOOLS)))])
            rows["ts"].append(BASE_TS_US + lsn * 1_000)
            if evolve:
                rows["model"].append(
                    None if op == "D" else ["model-a", "model-b"][int(rng.randint(2))]
                )
            lsn += 1
        schema_fields = [
            pa.field("lsn", pa.int64()),
            pa.field("op", pa.string()),
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
        if evolve:
            schema_fields.append(pa.field("model", pa.string()))
        seg_table = pa.table(
            {k: pa.array(v, f.type) for (k, v), f in zip(rows.items(), schema_fields)},
        )
        path = os.path.join(out_dir, f"segment-{seg:05d}.parquet")
        pq.write_table(seg_table, path)
        seg_paths.append(path)

    return {"base": base_path, "segments": seg_paths, "max_lsn": lsn - 1}

"""CDC engine correctness: replay vs oracle, idempotent resume, schema
evolution, exactly-once commit semantics (north rule; FIXTURES.md §2/§4)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from wrangler_ray.cdc.engine import CdcTable
from wrangler_ray.cdc.generate import generate_change_stream
from wrangler_ray.cdc.oracle import assert_tables_equal, replay_oracle


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    d = tmp_path_factory.mktemp("cdc_stream")
    info = generate_change_stream(
        str(d), n_convs=50, n_events=2000, n_segments=4, seed=7,
        evolve_schema_at_segment=2,
    )
    return info


def _fresh_table(tmp_path, stream, ray_session):
    import ray.data as rd

    table = CdcTable(str(tmp_path / "lake"), num_partitions=8)
    base = rd.read_parquet(stream["base"])
    table.init_from_snapshot(base)
    return table


def test_replay_matches_oracle(tmp_path, stream, ray_session):
    table = _fresh_table(tmp_path, stream, ray_session)
    table.apply_changes(stream["segments"])
    oracle = replay_oracle(stream["base"], stream["segments"])
    assert_tables_equal(table.read_arrow(), oracle)


def test_incremental_apply_equals_batch_apply(tmp_path, stream, ray_session):
    table = _fresh_table(tmp_path, stream, ray_session)
    # apply one segment at a time (incremental tail)
    for seg in stream["segments"]:
        table.apply_changes([seg])
    oracle = replay_oracle(stream["base"], stream["segments"])
    assert_tables_equal(table.read_arrow(), oracle)


def test_idempotent_reapply(tmp_path, stream, ray_session):
    table = _fresh_table(tmp_path, stream, ray_session)
    m1 = table.apply_changes(stream["segments"])
    # re-applying the same segments is a no-op (watermark prunes everything)
    m2 = table.apply_changes(stream["segments"])
    assert m2["version"] == m1["version"]
    assert m2["watermark_lsn"] == m1["watermark_lsn"]
    oracle = replay_oracle(stream["base"], stream["segments"])
    assert_tables_equal(table.read_arrow(), oracle)


def test_resume_from_intermediate_checkpoint(tmp_path, stream, ray_session):
    # apply half, then all — equivalent to resuming from a checkpoint
    table = _fresh_table(tmp_path, stream, ray_session)
    half = stream["segments"][:2]
    table.apply_changes(half)
    wm_half = table.watermark
    oracle_half = replay_oracle(stream["base"], stream["segments"], upto_lsn=wm_half)
    assert_tables_equal(table.read_arrow(), oracle_half)
    # resume with the FULL segment list (overlap): must dedupe via watermark
    table.apply_changes(stream["segments"])
    oracle = replay_oracle(stream["base"], stream["segments"])
    assert_tables_equal(table.read_arrow(), oracle)


def test_schema_evolution_null_backfill(tmp_path, stream, ray_session):
    table = _fresh_table(tmp_path, stream, ray_session)
    table.apply_changes(stream["segments"])
    final = table.read_arrow()
    assert "model" in final.column_names  # additive column arrived
    col = final.column("model").to_pylist()
    assert any(v is not None for v in col)  # evolved rows carry values
    assert any(v is None for v in col)  # old rows null-backfilled


def test_manifest_lineage_and_atomicity(tmp_path, stream, ray_session):
    table = _fresh_table(tmp_path, stream, ray_session)
    m = table.apply_changes(stream["segments"])
    # lineage: per-partition row counts + digests present
    assert m["lineage"]
    for rec in m["lineage"].values():
        assert rec["rows"] >= 0 and len(rec["sha256"]) == 64
    # manifest pointer resolves and matches
    latest = table.latest_manifest()
    assert latest["version"] == m["version"]
    # every referenced file exists with the committed digest
    import hashlib

    for part, rel in m["partitions"].items():
        p = os.path.join(table.table_dir, rel)
        assert os.path.exists(p)
        if part in m["lineage"]:
            h = hashlib.sha256(open(p, "rb").read()).hexdigest()
            assert h == m["lineage"][part]["sha256"]


def test_in_flight_directive_chain(tmp_path, stream, ray_session):
    table = _fresh_table(tmp_path, stream, ray_session)
    table.apply_changes(stream["segments"], recipe=["uppercase :role"])
    final = table.read_arrow()
    roles = [r for r in final.column("role").to_pylist() if r]
    # rows written by this apply have uppercase roles; base rows unchanged
    assert any(r.isupper() for r in roles)


def test_row_counts_in_manifest(tmp_path, stream, ray_session):
    table = _fresh_table(tmp_path, stream, ray_session)
    m = table.apply_changes(stream["segments"])
    assert m["total_rows"] == table.read_arrow().num_rows

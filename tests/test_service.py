"""Service-layer façade: workspace upload → execute → summary → schema
(reference wrangler-service DirectivesHandler.java:359-668 semantics as
library functions; VERDICT r4 #6)."""

import pyarrow as pa
import pytest
import ray.data as rd

from wrangler_ray.service import (
    Workspace,
    workspace_delete,
    workspace_get,
    workspace_list,
    workspace_upload,
)


def _fixture_table() -> pa.Table:
    return pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "name": pa.array(["Ann", "Bob", None, "", "Eve", "Fay"], pa.string()),
        "raw": pa.array(["10", "2.5", "true", "2024-01-02", "hello", None],
                        pa.string()),
    })


def test_workspace_upload_execute_schema_summary(ray_session):
    ws = workspace_upload("w1", _fixture_table(), sampler="first", limit=100)
    assert ws.sample.num_rows == 6
    assert "w1" in workspace_list() and workspace_get("w1") is ws

    # execute-on-sample with a recipe + limit (reference sampling.limit)
    out = ws.execute(["uppercase :name", "set-column :id2 exp:{id * 2}"], limit=4)
    assert out.num_rows == 4
    assert out.column("name").to_pylist()[:2] == ["ANN", "BOB"]
    assert out.column("id2").to_pylist() == [2, 4, 6, 8]
    assert ws.directives == ["uppercase :name", "set-column :id2 exp:{id * 2}"]

    # schema of the WRANGLED sample (fields array semantics)
    fields = ws.schema(["drop :raw", "set-column :flag exp:{id > 3}"])
    byname = {f["name"]: f for f in fields}
    assert set(byname) == {"id", "name", "flag"}
    assert byname["id"]["type"] == "int64" and byname["flag"]["type"] == "bool"
    assert byname["name"]["nullable"] is True

    # BasicStatistics-style summary: null/non-null/empty + type detection
    s = ws.summary()
    assert s["count"] == 6
    name = s["columns"]["name"]
    assert name["stats"]["null"] == pytest.approx(1 / 6)
    assert name["stats"]["non-null"] == pytest.approx(5 / 6)
    assert name["stats"]["empty"] == pytest.approx(1 / 6)
    raw_types = s["columns"]["raw"]["types"]
    assert raw_types["integer"] == pytest.approx(1 / 6)
    assert raw_types["number"] == pytest.approx(1 / 6)
    assert raw_types["boolean"] == pytest.approx(1 / 6)
    assert raw_types["date"] == pytest.approx(1 / 6)
    assert raw_types["text"] == pytest.approx(1 / 6)
    # non-string column reports its arrow type
    assert s["columns"]["id"]["types"] == {"int64": 1.0}

    # summary AFTER a recipe reflects the wrangled sample
    s2 = ws.summary(["filter-row exp:{name == null} true"])
    assert s2["count"] == 5
    assert s2["columns"]["name"]["stats"]["null"] == 0.0

    assert workspace_delete("w1") and "w1" not in workspace_list()
    with pytest.raises(KeyError):
        workspace_get("w1")


def test_workspace_samplers_and_sources(ray_session, tmp_path):
    import pyarrow.parquet as pq

    t = pa.table({"x": pa.array(range(1000), pa.int64())})
    p = tmp_path / "x.parquet"
    pq.write_table(t, str(p))

    # path upload + first-sampler cap
    ws = workspace_upload("wf", str(p), sampler="first", limit=50)
    assert ws.sample.num_rows == 50
    assert ws.sample.column("x").to_pylist() == list(range(50))

    # probabilistic samplers stay bounded and draw from the whole range
    wb = workspace_upload("wb", rd.from_arrow(t), sampler="bernoulli", limit=64)
    assert 0 < wb.sample.num_rows <= 64
    wr = workspace_upload("wr", rd.from_arrow(t), sampler="reservoir", limit=32)
    assert wr.sample.num_rows == 32
    assert max(wr.sample.column("x").to_pylist()) > 100  # not just the head

    with pytest.raises(ValueError, match="unknown sampler"):
        workspace_upload("bad", rd.from_arrow(t), sampler="systematic")
    for n in ("wf", "wb", "wr"):
        workspace_delete(n)


def test_workspace_poisson_sampler(ray_session):
    t = pa.table({"x": pa.array(range(1000), pa.int64())})
    ws = workspace_upload("wp", rd.from_arrow(t), sampler="poisson", limit=64)
    assert 0 < ws.sample.num_rows <= 64
    workspace_delete("wp")

"""Round-trip tests for the self-authored binary-format writers
(ops/avro_writer.py, ops/proto_writer.py) against the repo's own readers AND
through the parse-as-avro-file / parse-as-protobuf directive chain — the
fixtures driver queries rely on."""

import pyarrow as pa

from wrangler_ray.directives.avro_reader import read_container
from wrangler_ray.directives.parsers import (
    register_avro_schema,
    register_protobuf_descriptor,
)
from wrangler_ray.directives.proto_reader import decode_message, parse_descriptor_set
from wrangler_ray.ops.avro_writer import write_container
from wrangler_ray.ops.proto_writer import (
    LABEL_REPEATED,
    T_BOOL,
    T_DOUBLE,
    T_INT32,
    T_INT64,
    T_SINT64,
    T_STRING,
    encode_message,
    make_descriptor_set,
)
from wrangler_ray.pipeline import apply_recipe_table

AVRO_SCHEMA = {
    "type": "record",
    "name": "Ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "opt", "type": ["null", "long"]},
    ],
}


def _avro_records(n, base=0):
    return [
        {
            "id": base + i,
            "name": f"n{base + i}",
            "score": base + i + 0.25,
            "tags": ["a", str(i)],
            "opt": (None if i % 3 else i * 2),
        }
        for i in range(n)
    ]


def test_avro_container_roundtrip_both_codecs():
    recs = _avro_records(50)
    for codec in ("null", "deflate"):
        blob = write_container(AVRO_SCHEMA, recs, codec=codec, records_per_block=7)
        schema, out = read_container(blob)
        assert out == recs
        assert schema["name"] == "Ev"


def test_avro_container_through_directive_chain():
    blob = write_container(AVRO_SCHEMA, _avro_records(5), codec="deflate")
    t = pa.table({"body": pa.array([blob], pa.binary())})
    ok, err = apply_recipe_table(t, ["parse-as-avro-file :body"])
    assert err.num_rows == 0
    assert ok.num_rows == 5
    assert ok.column("id").to_pylist() == [0, 1, 2, 3, 4]
    assert ok.column("score").to_pylist() == [0.25, 1.25, 2.25, 3.25, 4.25]


PROTO_SPEC = {
    "id": (1, T_INT64),
    "name": (2, T_STRING),
    "score": (3, T_DOUBLE),
    "delta": (4, T_SINT64),
    "flag": (5, T_BOOL),
    "tags": (6, T_STRING, LABEL_REPEATED),
    "neg": (7, T_INT32),
}


def test_proto_descriptor_and_message_roundtrip():
    desc = make_descriptor_set("demo", {"Ev": PROTO_SPEC})
    messages = parse_descriptor_set(desc)
    assert "demo.Ev" in messages
    fields = {
        "id": 7,
        "name": "x",
        "score": 1.5,
        "delta": -4,
        "flag": True,
        "tags": ["p", "q"],
        "neg": -12,  # negative int32 → 10-byte varint path
    }
    out = decode_message(encode_message(fields, PROTO_SPEC), messages, "demo.Ev")
    assert out == fields


def test_proto_through_directive_chain():
    desc = make_descriptor_set("demo", {"Point": {"x": (1, T_INT64), "label": (2, T_STRING)}})
    register_protobuf_descriptor("t_demo_desc", desc)
    spec = {"x": (1, T_INT64), "label": (2, T_STRING)}
    blobs = [encode_message({"x": i * 3, "label": f"p{i}"}, spec) for i in range(4)]
    t = pa.table({"body": pa.array(blobs, pa.binary())})
    ok, err = apply_recipe_table(t, ["parse-as-protobuf :body t_demo_desc Point"])
    assert err.num_rows == 0
    assert ok.column("body_x").to_pylist() == [0, 3, 6, 9]
    assert ok.column("body_label").to_pylist() == ["p0", "p1", "p2", "p3"]


def test_avro_message_through_parse_as_avro():
    register_avro_schema("t_demo_avro", AVRO_SCHEMA)
    from wrangler_ray.ops.avro_writer import _encode

    bodies = []
    for rec in _avro_records(3, base=10):
        buf = bytearray()
        _encode(rec, AVRO_SCHEMA, buf)
        bodies.append(bytes(buf))
    t = pa.table({"body": pa.array(bodies, pa.binary())})
    ok, err = apply_recipe_table(t, ["parse-as-avro :body t_demo_avro binary"])
    assert err.num_rows == 0
    assert ok.column("body_id").to_pylist() == [10, 11, 12]
    assert ok.column("body_name").to_pylist() == ["n10", "n11", "n12"]

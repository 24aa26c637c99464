"""Breadth coverage for the directives not exercised elsewhere: every
remaining registered directive gets at least one semantic check (gated stubs
assert their clean NotImplementedError/error-channel behavior). Chain runs
directly on Arrow tables — no Ray session needed."""

import datetime as dt
import urllib.parse

import pyarrow as pa
import pytest

from wrangler_ray.pipeline import DirectiveChain, compile_recipe


def run(recipe, table, on_error="skip"):
    return DirectiveChain(compile_recipe(recipe), on_error=on_error)(table)


def col(t, name):
    return t.column(name).to_pylist()


def test_change_column_case():
    t = pa.table({"AbC": [1], "XyZ": [2]})
    assert run(["change-column-case lower"], t).column_names == ["abc", "xyz"]
    assert run(["change-column-case upper"], t).column_names == ["ABC", "XYZ"]


def test_create_and_flatten_record():
    t = pa.table({"a": [1, 2], "b": ["x", "y"], "c": [0.5, 1.5]})
    rec = run(["create-record :r :a,:b"], t)
    assert pa.types.is_struct(rec.column("r").type)
    flat = run(["create-record :r :a,:b", "drop :a,:b", "flatten-record :r"], t)
    assert set(("r_a", "r_b")) <= set(flat.column_names) or set(("a", "b")) <= set(
        flat.column_names
    )


def test_current_datetime_injected():
    t = pa.table({"x": [1, 2]})
    out = run(["current-datetime :now"], t)
    vals = col(out, "now")
    assert len(vals) == 2 and vals[0] == vals[1]  # one job-level constant


def test_datetime_roundtrip_timestamp():
    t = pa.table({"ts": pa.array([dt.datetime(2024, 3, 1, 12, 30)], pa.timestamp("us"))})
    out = run(["datetime-to-timestamp :ts"], t)
    assert pa.types.is_timestamp(out.column("ts").type)
    back = run(["timestamp-to-datetime :ts"], out)
    assert back.column("ts").to_pylist()[0].year == 2024


def test_filter_row_v1_aliases():
    t = pa.table({"v": pa.array([1, 5, 9], pa.int64())})
    # v1: filter-row-if-true drops where condition true
    out = run(["filter-row-if-true exp:{v > 4}"], t)
    assert col(out, "v") == [1]
    # v1: filter-row-if-false drops where condition false
    out = run(["filter-row-if-false exp:{v > 4}"], t)
    assert col(out, "v") == [5, 9]


def test_filter_rows_on_empty_or_null():
    t = pa.table({"a": ["", None, "x"], "b": [None, None, "y"]})
    out = run(["filter-rows-on empty-or-null-columns :a,:b"], t)
    # only the row with some non-empty value among the listed columns survives
    assert col(out, "a") == ["x"]


def test_format_unix_timestamp():
    t = pa.table({"epoch": pa.array([1719800000], pa.int64())})
    out = run(["format-unix-timestamp :epoch 'yyyy-MM-dd'"], t)
    assert col(out, "epoch") == ["2024-07-01"]


def test_format_datetime_pattern():
    t = pa.table({"ts": pa.array([dt.datetime(2024, 3, 1, 12, 30)], pa.timestamp("us"))})
    out = run(["format-datetime :ts 'yyyy/MM/dd HH:mm'"], t)
    assert col(out, "ts") == ["2024/03/01 12:30"]


def test_generate_uuid_deterministic_seed():
    t = pa.table({"x": [1, 2, 3]})
    a = col(run(["generate-uuid :id"], t), "id")
    assert len(set(a)) == 3  # distinct per row
    for v in a:
        assert len(v) == 36  # uuid format


def test_indexsplit():
    t = pa.table({"s": ["abcdefgh"]})
    out = run(["indexsplit :s 2 5 :part"], t)
    assert len(col(out, "part")[0]) >= 3  # slice semantics (reference 1-based)


def test_mask_shuffle_preserves_shape():
    t = pa.table({"s": ["Hello 123!"]})
    out = run(["mask-shuffle :s"], t)
    v = col(out, "s")[0]
    assert len(v) == len("Hello 123!")
    assert v[5] == " " and v[9] == "!"  # non-alnum pass through positionally


def test_parse_as_fixed_length():
    t = pa.table({"body": ["AA1234  zz"]})
    out = run(["parse-as-fixed-length :body 2,4,4"], t)
    assert col(out, "body_1") == ["AA"]
    assert col(out, "body_2") == ["1234"]
    assert col(out, "body_3") == ["  zz"]


def test_parse_as_log_common_format():
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x.gif HTTP/1.0" 200 2326'
    t = pa.table({"log": [line]})
    out = run(["parse-as-log :log 'common'"], t)
    joined = " ".join(str(col(out, c)[0]) for c in out.column_names)
    assert "127.0.0.1" in joined and "200" in joined


def test_parse_as_datetime_pattern():
    t = pa.table({"d": ["2024-03-01 12:30:00"]})
    out = run(["parse-as-datetime :d 'yyyy-MM-dd HH:mm:ss'"], t)
    v = col(out, "d")[0]
    assert getattr(v, "year", None) == 2024


def test_parse_as_date_natural():
    t = pa.table({"d": ["2024-03-01"]})
    # reference ParseDate writes the parsed value to <col>_1
    out = run(["parse-as-date :d"], t)
    v = col(out, "d_1")[0]
    assert getattr(v, "year", None) == 2024


def test_parse_xml_to_json():
    t = pa.table({"x": ["<root><name>bob</name><age>7</age></root>"]})
    out = run(["parse-xml-to-json :x 2"], t)
    joined = " ".join(str(col(out, c)[0]) for c in out.column_names)
    assert "bob" in joined


def test_set_charset_decodes_bytes():
    t = pa.table({"b": pa.array(["héllo".encode("utf-8")], pa.binary())})
    out = run(["set-charset :b 'utf-8'"], t)
    assert col(out, "b") == ["héllo"]


def test_set_headers_and_set_columns():
    t = pa.table({"c1": [1], "c2": [2]})
    assert run(["set-headers :x,:y"], t).column_names == ["x", "y"]
    assert run(["set-columns :p,:q"], t).column_names == ["p", "q"]


def test_set_record_delim_splits_rows():
    t = pa.table({"blob": ["a;b;c"]})
    out = run(["set-record-delim :blob ';'"], t)
    assert col(out, "blob") == ["a", "b", "c"]


def test_set_variable_then_use():
    t = pa.table({"v": pa.array([3, 4], pa.int64())})
    out = run(["set-variable threshold exp:{3}", "filter-row exp:{v > threshold} false"], t)
    assert col(out, "v") == [4]


def test_split_to_columns():
    t = pa.table({"s": ["a|b|c", "x|y"]})
    out = run(["split-to-columns :s '\\|'"], t)
    assert col(out, "s_1") == ["a", "x"]
    assert col(out, "s_2") == ["b", "y"]
    assert col(out, "s_3") == ["c", None]


def test_text_metric_similarity():
    t = pa.table({"a": ["abc"], "b": ["abc"]})
    out = run(["text-metric levenshtein :a :b :sim"], t)
    assert col(out, "sim") == [1.0]  # identical → similarity 1


def test_url_encode_decode():
    s = "a b&c=d"
    t = pa.table({"u": [s]})
    enc = run(["url-encode :u"], t)
    # java URLEncoder semantics: space → '+' (quote_plus), reference
    # transformation/UrlEncode.java
    assert col(enc, "u") == [urllib.parse.quote_plus(s)]
    back = run(["url-encode :u", "url-decode :u"], t)
    assert col(back, "u") == [s]


def test_write_as_json_object():
    t = pa.table({"a": [1], "b": ["x"], "c": [True]})
    out = run(["write-as-json-object :j :a,:b"], t)
    assert col(out, "j") == ['{"a": 1, "b": "x"}']


def test_format_and_parse_currency():
    t = pa.table({"amt": pa.array([1234.5], pa.float64())})
    out = run(["format-as-currency :amt :pretty"], t)
    pretty = col(out, "pretty")[0]
    assert "1,234" in pretty
    back = run(
        ["format-as-currency :amt :pretty", "parse-as-currency :pretty :back"], t
    )
    assert abs(col(back, "back")[0] - 1234.5) < 0.01


def test_parse_as_currency_locale_string():
    t = pa.table({"p": ["$1,234.50"]})
    out = run(["parse-as-currency :p :v"], t)
    assert abs(col(out, "v")[0] - 1234.5) < 0.001


def test_table_lookup_registered():
    from wrangler_ray.directives.lookup import register_lookup_table

    register_lookup_table(
        "colors", pa.table({"id": pa.array([1, 2], pa.int64()), "name": ["red", "blue"]}),
        key_col="id",
    )
    t = pa.table({"cid": pa.array([2, 1, 9], pa.int64())})
    out = run(["table-lookup :cid 'colors'"], t)
    assert col(out, "cid_name") == ["blue", "red", None]


def test_send_to_error_with_message():
    t = pa.table({"v": pa.array([-1, 5], pa.int64())})
    res = DirectiveChain(
        compile_recipe(["send-to-error exp:{v < 0} 'neg'"]), on_error="skip"
    )(t)
    assert col(res, "v") == [5]


def test_data_model_map_column():
    from wrangler_ray.directives.lookup import register_data_model

    register_data_model("omop", {"person_source": "person_id"})
    t = pa.table({"person_source": [7]})
    out = run(["data-model-map-column 'omop' :person_source 'person_id'"], t)
    assert "person_id" in out.column_names


def test_gated_stub_parsers_error_cleanly():
    # parsers either decode, divert bad rows to the error channel, or raise a
    # clear compile-time error (unregistered schema / missing dependency) —
    # never crash mid-chain
    from wrangler_ray.core.errors import DirectiveError

    t = pa.table({"b": pa.array([b"notavro"], pa.binary())})
    for d in ("parse-as-avro :b unregistered binary", "parse-as-protobuf :b 1 rec",
              "parse-as-excel :b", "parse-as-hl7 :b"):
        try:
            chain = DirectiveChain(compile_recipe([d]), on_error="skip")
            out = chain(t)  # rows become errors → dropped, or pass through
            assert out.num_rows in (0, 1)
        except (NotImplementedError, DirectiveError):
            pass


def test_parse_as_avro_registered_schema():
    from wrangler_ray.directives.parsers import register_avro_schema

    register_avro_schema(
        "ev1",
        {"type": "record", "name": "Ev",
         "fields": [{"name": "id", "type": "long"},
                    {"name": "name", "type": "string"}]},
    )

    def zigzag(n):
        n = (n << 1) ^ (n >> 63)
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            if n:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def enc(i, name):
        nb = name.encode()
        return zigzag(i) + zigzag(len(nb)) + nb

    t = pa.table({"msg": pa.array([enc(7, "alpha"), bytes([255]) * 10], pa.binary())})
    out = run(["parse-as-avro :msg ev1 binary"], t)
    assert col(out, "msg_id") == [7]           # bad message → error channel
    assert col(out, "msg_name") == ["alpha"]
    t2 = pa.table({"msg": ['{"id": 3, "name": "x"}']})
    out2 = run(["parse-as-avro :msg ev1 json"], t2)
    assert col(out2, "msg_id") == [3]


def test_invoke_http_against_local_server():
    import http.server
    import json
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            out = json.dumps({"echoed": body.get("a", 0) * 10}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        t = pa.table({"a": pa.array([1, 2], pa.int64())})
        out = run([f"invoke-http http://127.0.0.1:{port}/x :a"], t)
        assert col(out, "echoed") == [10, 20]  # response fields merged in
    finally:
        srv.shutdown()


def test_invoke_http_failure_goes_to_error_channel():
    t = pa.table({"a": [1]})
    chain = DirectiveChain(
        compile_recipe(["invoke-http http://127.0.0.1:1/x :a"]), on_error="skip"
    )
    out = chain(t)  # unreachable port → rows diverted to error channel
    assert out.num_rows == 0


def test_parse_as_protobuf_with_reference_descriptor():
    import os as _os

    import pytest as _pytest

    desc_path = "/root/reference/wrangler-core/src/test/resources/addressbook.desc"
    if not _os.path.exists(desc_path):
        _pytest.skip("reference descriptor fixture not available")
    from wrangler_ray.directives.parsers import register_protobuf_descriptor

    register_protobuf_descriptor("ab", open(desc_path, "rb").read())

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            if n:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def field(num, wt, payload):
        return varint((num << 3) | wt) + payload

    phone = field(1, 2, varint(3) + b"555")
    person = (
        field(1, 2, varint(3) + b"Ada")
        + field(2, 0, varint(7))
        + field(3, 2, varint(8) + b"ada@x.io")
        + field(4, 2, varint(len(phone)) + phone)
    )
    truncated = field(1, 2, varint(100) + b"x")  # declared 100 bytes, has 1
    t = pa.table({"msg": pa.array([person, truncated], pa.binary())})
    out = run(["parse-as-protobuf :msg ab Person"], t)
    assert out.num_rows == 1  # truncated message → error channel
    assert col(out, "msg_name") == ["Ada"]
    assert col(out, "msg_id") == [7]
    assert col(out, "msg_phones") == ['[{"number": "555"}]']


def test_parse_as_log_percent_directives():
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    t = pa.table({"log": [line]})
    out = run(['parse-as-log :log \'%h %l %u %t "%r" %>s %b\''], t)
    assert col(out, "log_ip") == ["127.0.0.1"]
    assert col(out, "log_user") == ["frank"]
    assert col(out, "log_method") == ["GET"]
    assert col(out, "log_uri") == ["/apache_pb.gif"]
    assert col(out, "log_status") == ["200"]
    assert col(out, "log_size") == ["2326"]
    assert col(out, "log_identd") == [None]  # '-' → null


def test_protobuf_packed_repeated_scalars():
    # proto3 packs repeated numerics by default: one length-delimited payload
    # holding back-to-back varints / fixed-width values (public wire format)
    from wrangler_ray.directives.proto_reader import decode_message
    import struct as _struct

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def field(num, wt, payload):
        return varint((num << 3) | wt) + payload

    messages = {
        "M": {
            "fields": {
                1: ("ints", 5, 3, ""),       # repeated int32
                2: ("zz", 17, 3, ""),        # repeated sint32 (zigzag)
                3: ("flags", 8, 3, ""),      # repeated bool
                4: ("xs", 2, 3, ""),         # repeated float
                5: ("ds", 1, 3, ""),         # repeated double
                6: ("fixed", 7, 3, ""),      # repeated fixed32
                7: ("negs", 5, 3, ""),       # repeated int32 incl. negative
            }
        }
    }
    packed_ints = varint(1) + varint(2) + varint(300)
    packed_zz = varint(1) + varint(2) + varint(3)  # zigzag: -1, 1, -2
    packed_flags = varint(1) + varint(0) + varint(1)
    packed_floats = _struct.pack("<2f", 1.5, -2.0)
    packed_doubles = _struct.pack("<2d", 0.25, 9.0)
    packed_fixed = (7).to_bytes(4, "little") + (9).to_bytes(4, "little")
    neg = varint((-5) & 0xFFFFFFFFFFFFFFFF)  # int32 -5 as 10-byte... 64-bit varint
    msg = (
        field(1, 2, varint(len(packed_ints)) + packed_ints)
        + field(2, 2, varint(len(packed_zz)) + packed_zz)
        + field(3, 2, varint(len(packed_flags)) + packed_flags)
        + field(4, 2, varint(len(packed_floats)) + packed_floats)
        + field(5, 2, varint(len(packed_doubles)) + packed_doubles)
        + field(6, 2, varint(len(packed_fixed)) + packed_fixed)
        + field(7, 2, varint(len(neg)) + neg)
        # expanded encoding of the same repeated field still appends
        + field(1, 0, varint(4))
    )
    out = decode_message(msg, messages, "M")
    assert out["ints"] == [1, 2, 300, 4]
    assert out["zz"] == [-1, 1, -2]
    assert out["flags"] == [True, False, True]
    assert out["xs"] == [1.5, -2.0]
    assert out["ds"] == [0.25, 9.0]
    assert out["fixed"] == [7, 9]
    assert out["negs"] == [-5]


def test_validate_standard():
    import json

    from wrangler_ray.directives.validation import register_standard
    from wrangler_ray.pipeline import DirectiveChain, compile_recipe

    good = json.dumps({"name": "Ada", "email": "ada@x.io", "age": 36})
    bad_email = json.dumps({"name": "Bob", "email": "not-an-email"})
    missing_name = json.dumps({"email": "c@x.io"})
    not_json = "{{{"
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "doc": [good, bad_email, missing_name, not_json, None],
    })
    chain = DirectiveChain(compile_recipe(["validate-standard :doc contact"]),
                           on_error="tag")
    out = chain(t)
    from wrangler_ray.core.errors import ERROR_COLUMNS

    err_mask = [v is not None for v in out.column("_wr_msg").to_pylist()]
    ok_ids = [v for v, e in zip(out.column("id").to_pylist(), err_mask) if not e]
    # null cell passes through (reference continue branch); 3 rows error
    assert sorted(ok_ids) == [1, 5]
    msgs = [m for m in out.column("_wr_msg").to_pylist() if m]
    assert any("pattern" in m for m in msgs)
    assert any("required property 'name' missing" in m for m in msgs)
    assert any("not valid JSON" in m for m in msgs)

    # custom standard registration + unknown-standard parse error
    register_standard("point", {"type": "object",
                                "required": ["x", "y"],
                                "properties": {"x": {"type": "number"},
                                               "y": {"type": "number"}}})
    t2 = pa.table({"p": [json.dumps({"x": 1, "y": 2})]})
    out2 = run(["validate-standard :p point"], t2)
    assert out2.num_rows == 1
    from wrangler_ray.core.errors import DirectiveError as DE

    with pytest.raises(Exception):
        compile_recipe(["validate-standard :p no_such_standard"])


def test_validate_standard_schema_keywords():
    from wrangler_ray.directives.validation import _Validator

    v = _Validator({
        "definitions": {"pos": {"type": "integer", "minimum": 0}},
        "type": "object",
        "properties": {
            "n": {"$ref": "#/definitions/pos"},
            "kind": {"enum": ["a", "b"]},
            "mix": {"oneOf": [{"type": "string"}, {"type": "integer"}]},
            "arr": {"type": "array", "items": {"type": "integer"}, "maxItems": 2},
        },
        "additionalProperties": False,
    })
    assert v.issues({"n": 3, "kind": "a", "mix": 5, "arr": [1, 2]}) == []
    assert v.issues({"n": -1})  # minimum
    assert v.issues({"kind": "z"})  # enum
    assert v.issues({"mix": 1.5})  # oneOf: matches 0
    assert v.issues({"arr": [1, 2, 3]})  # maxItems
    assert v.issues({"zzz": 1})  # additionalProperties false

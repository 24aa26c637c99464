"""Per-directive goldens — column ops, transforms, row ops, error channel.
Test style mirrors the reference's TestingRig pattern (tiny inline tables +
recipe → exact expected output; reference
wrangler-core/src/test/java/io/cdap/directives/...)."""

import pyarrow as pa
import pytest

from wrangler_ray.core.errors import DirectiveError, PipelineAbort
from wrangler_ray.pipeline import apply_recipe_table


def run(table, recipe):
    return apply_recipe_table(table, recipe)


def test_drop_keep_rename_swap_copy():
    t = pa.table({"a": [1], "b": [2], "c": [3]})
    ok, _ = run(t, ["drop :b"])
    assert ok.column_names == ["a", "c"]
    ok, _ = run(t, ["keep :a,:c"])
    assert ok.column_names == ["a", "c"]
    ok, _ = run(t, ["rename :a :x"])
    assert ok.column_names == ["x", "b", "c"]
    ok, _ = run(t, ["swap :a :c"])
    assert ok.column_names == ["c", "b", "a"]
    ok, _ = run(t, ["copy :a :d"])
    assert ok.column("d").to_pylist() == [1]


def test_rename_conflict_errors():
    t = pa.table({"a": [1], "b": [2]})
    with pytest.raises(DirectiveError):
        run(t, ["rename :a :b"])


def test_copy_existing_needs_force():
    t = pa.table({"a": [1], "b": [2]})
    with pytest.raises(DirectiveError):
        run(t, ["copy :a :b"])
    ok, _ = run(t, ["copy :a :b true"])
    assert ok.column("b").to_pylist() == [1]


def test_set_type_matrix():
    t = pa.table(
        {
            "s_int": ["1", " 2 ", "3"],
            "s_f": ["1.5", "2.25", "-3"],
            "f": [1.9, -2.9, 0.5],
            "b": [b"ab", b"cd", b"ef"],
            "s_bool": ["true", "False", "x"],
        }
    )
    ok, _ = run(
        t,
        [
            "set-type :s_int int",
            "set-type :s_f double",
            "set-type :f int",
            "set-type :b string",
            "set-type :s_bool boolean",
        ],
    )
    assert ok.column("s_int").to_pylist() == [1, 2, 3]
    assert ok.column("s_f").to_pylist() == [1.5, 2.25, -3.0]
    assert ok.column("f").to_pylist() == [1, -2, 0]  # truncate toward zero
    assert ok.column("b").to_pylist() == ["ab", "cd", "ef"]
    assert ok.column("s_bool").to_pylist() == [True, False, False]


def test_set_type_decimal():
    t = pa.table({"x": [1.005, 2.675]})
    ok, _ = run(t, ["set-type :x decimal 2 HALF_UP prop:{precision=10}"])
    assert str(ok.column("x").type) == "decimal128(10, 2)"


def test_string_transforms():
    t = pa.table({"s": ["  Hello World  "]})
    ok, _ = run(t, ["trim :s", "lowercase :s"])
    assert ok.column("s").to_pylist() == ["hello world"]
    ok, _ = run(t, ["uppercase :s"])
    assert ok.column("s").to_pylist() == ["  HELLO WORLD  "]
    ok, _ = run(pa.table({"s": ["hello world"]}), ["titlecase :s"])
    assert ok.column("s").to_pylist() == ["Hello World"]


def test_cut_character():
    t = pa.table({"s": ["abcdefgh"]})
    ok, _ = run(t, ["cut-character :s :d '1-3'"])
    assert ok.column("d").to_pylist() == ["abc"]
    ok, _ = run(t, ["cut-character :s :d '2-4,6'"])
    assert ok.column("d").to_pylist() == ["bcdf"]


def test_split_email():
    t = pa.table({"e": ["root@cdap.io", "a@b@c.io", "nomail"]})
    ok, _ = run(t, ["split-email :e"])
    assert ok.column("e_account").to_pylist() == ["root", "a@b", None]
    assert ok.column("e_domain").to_pylist() == ["cdap.io", "c.io", None]


def test_find_and_replace_sed():
    t = pa.table({"s": ["aaa bbb aaa"]})
    ok, _ = run(t, ["find-and-replace :s 's/aaa/x/g'"])
    assert ok.column("s").to_pylist() == ["x bbb x"]
    ok, _ = run(t, ["find-and-replace :s 's/aaa/x/'"])
    assert ok.column("s").to_pylist() == ["x bbb aaa"]


def test_mask_number():
    # exact reference behavior (MaskNumber.java:119-146): x/X mask and always
    # advance; '#' emits the input char; literals advance only on equality
    t = pa.table({"ssn": ["888990000"]})
    ok, _ = run(t, ["mask-number :ssn 'XXX-XX-####'"])
    assert ok.column("ssn").to_pylist() == ["xxx-xx-0000"]
    ok, _ = run(pa.table({"ssn": ["888-99-0000"]}), ["mask-number :ssn 'xxx-xx-####'"])
    assert ok.column("ssn").to_pylist() == ["xxx-xx-0000"]


def test_hash_directive():
    import hashlib

    t = pa.table({"s": ["secret"]})
    ok, _ = run(t, ["hash :s 'SHA-256' true"])
    assert ok.column("s").to_pylist() == [hashlib.sha256(b"secret").hexdigest()]


def test_encode_decode_roundtrip():
    t = pa.table({"s": ["hello"]})
    ok, _ = run(t, ["encode base64 :s"])
    assert ok.column("s_encode_base64").to_pylist() == ["aGVsbG8="]
    ok, _ = run(
        pa.table({"x": ["aGVsbG8="]}), ["decode base64 :x"]
    )
    assert ok.column("x_decode_base64").to_pylist() == ["hello"]


def test_fill_null_or_empty():
    t = pa.table({"s": ["a", None, ""]})
    ok, _ = run(t, ["fill-null-or-empty :s 'N/A'"])
    assert ok.column("s").to_pylist() == ["a", "N/A", "N/A"]


def test_quantize():
    t = pa.table({"v": [5.0, 15.0, 50.0]})
    ok, _ = run(t, ["quantize :v :q '0:10=low,10.01:20=mid,20.01:100=high'"])
    assert ok.column("q").to_pylist() == ["low", "mid", "high"]


def test_filter_by_regex_null_to_error():
    t = pa.table({"s": ["apple", "banana", None]})
    ok, err = run(t, ["filter-by-regex if-matched :s 'a.*'"])
    assert ok.column("s").to_pylist() == ["banana"]
    assert err.num_rows == 1  # null value → error channel


def test_filter_empty_or_null_all_must_be_empty():
    t = pa.table({"a": [None, None, "x"], "b": ["", None, None]})
    ok, _ = run(t, ["filter-empty-or-null :a,:b"])
    assert ok.num_rows == 1
    assert ok.column("a").to_pylist() == ["x"]


def test_split_to_rows():
    t = pa.table({"s": ["a,b,c"], "k": [1]})
    ok, _ = run(t, ["split-to-rows :s ','"])
    assert ok.column("s").to_pylist() == ["a", "b", "c"]
    assert ok.column("k").to_pylist() == [1, 1, 1]


def test_fail_aborts():
    t = pa.table({"v": [1, 100]})
    with pytest.raises(PipelineAbort):
        run(t, ["fail exp:{v > 50}"])


def test_send_to_error_and_continue_keeps_rows():
    t = pa.table({"v": [1, 100]})
    ok, err = run(t, ["send-to-error-and-continue exp:{v > 50} 'big'"])
    assert ok.num_rows == 2
    assert err.num_rows == 1


def test_expression_vectorized_and_ternary():
    t = pa.table({"a": [1, 2, 3], "b": [10.0, 20.0, 30.0]})
    ok, _ = run(t, ["set-column :c exp:{a * b + 1}"])
    assert ok.column("c").to_pylist() == [11.0, 41.0, 91.0]
    ok, _ = run(t, ["set-column :c exp:{a > 1 ? 'big' : 'small'}"])
    assert ok.column("c").to_pylist() == ["small", "big", "big"]
    ok, _ = run(t, ["set-column :c exp:{a > 1 && b < 25}"])
    assert ok.column("c").to_pylist() == [False, True, False]


def test_expression_functions():
    t = pa.table({"s": ["a@b.io", "nope", None]})
    ok, _ = run(t, ["set-column :is exp:{dq:isEmail(s)}"])
    assert ok.column("is").to_pylist() == [True, False, False]
    t = pa.table({"v": [None, "x"]})
    ok, _ = run(t, ["set-column :w exp:{NullToValue(v, 'dflt')}"])
    assert ok.column("w").to_pylist() == ["dflt", "x"]


def test_parse_as_csv_with_header():
    t = pa.table({"body": ["first name, last  name", "alice,zed"]})
    ok, _ = run(t, ["parse-as-csv :body ',' true", "drop :body"])
    assert ok.column_names == ["first_name", "last_name"]
    assert ok.column("first_name").to_pylist() == ["alice"]


def test_parse_as_json_explode_and_flatten():
    t = pa.table({"body": ['{"a": 1, "b": {"c": 2}}', '[{"a": 5}, {"a": 6}]']})
    ok, err = run(t, ["parse-as-json :body 2"])
    assert ok.column("body_a").to_pylist() == [1, 5, 6]
    assert ok.column("body_b_c").to_pylist() == [2, None, None]
    assert err.num_rows == 0


def test_json_path():
    t = pa.table({"j": ['{"a": {"b": [10, 20]}}']})
    ok, _ = run(t, ["json-path :j :out '$.a.b[1]'"])
    assert ok.column("out").to_pylist() == [20]


def test_parse_timestamp_and_format_date():
    t = pa.table({"ts": [1500000000000]})
    ok, _ = run(t, ["parse-timestamp :ts 'milliseconds'", "format-date :ts 'yyyy-MM-dd'"])
    assert ok.column("ts").to_pylist() == ["2017-07-14"]


def test_parse_as_simple_date():
    t = pa.table({"d": ["12/31/2019 10:00:00"]})
    ok, _ = run(t, ["parse-as-simple-date :d 'MM/dd/yyyy HH:mm:ss'"])
    assert str(ok.column("d").type).startswith("timestamp")


def test_diff_date_ms():
    import datetime as dt

    t = pa.table(
        {
            "a": pa.array([dt.datetime(2020, 1, 2)], pa.timestamp("us")),
            "b": pa.array([dt.datetime(2020, 1, 1)], pa.timestamp("us")),
        }
    )
    ok, _ = run(t, ["diff-date :a :b :d"])
    assert ok.column("d").to_pylist() == [86400000]


def test_columns_replace_and_cleanse():
    t = pa.table({"C1_fname": [1], "C2 lname!": [2]})
    ok, _ = run(t, ["columns-replace 's/^C\\d+_//'"])
    assert ok.column_names[0] == "fname"
    ok, _ = run(t, ["cleanse-column-names"])
    assert ok.column_names == ["c1_fname", "c2_lname_"]


def test_catalog_lookup():
    t = pa.table({"code": ["A000", "ZZZ"]})
    ok, _ = run(t, ["catalog-lookup icd-10-2016 :code"])
    got = ok.column("code_icd_10_2016_description").to_pylist()
    assert got[0] is not None and got[1] is None


def test_write_as_json_map():
    t = pa.table({"a": [1], "b": ["x"]})
    ok, _ = run(t, ["write-as-json-map :j"])
    import json

    assert json.loads(ok.column("j").to_pylist()[0]) == {"a": 1, "b": "x"}


def test_stemming():
    t = pa.table({"s": ["running quickly"]})
    ok, _ = run(t, ["stemming :s"])
    assert ok.column("s_porter").to_pylist() == [["run", "quickli"]]


def test_flatten_pad_to_max():
    t = pa.table({"a": [[1, 2, 3]], "b": [["x"]], "k": ["r"]})
    ok, _ = run(t, ["flatten :a,:b"])
    assert ok.column("a").to_pylist() == [1, 2, 3]
    assert ok.column("b").to_pylist() == ["x", None, None]
    assert ok.column("k").to_pylist() == ["r", "r", "r"]


def test_set_variable_and_increment():
    t = pa.table({"v": [1, 60, 70]})
    from wrangler_ray.pipeline import DirectiveChain, compile_recipe

    chain = DirectiveChain(compile_recipe(["increment-variable big 1 exp:{v > 50}"]))
    from wrangler_ray.core.registry import DirectiveContext

    ctx = DirectiveContext()
    ok = chain.transform(t)[0]
    # run via transform() to inspect ctx — re-run manually
    directives = compile_recipe(["increment-variable big 1 exp:{v > 50}"])
    ctx = DirectiveContext()
    ok, _ = directives[0].apply(t, ctx)
    assert ctx.variables["big"] == 2


def test_pragma_load_directives_roundtrip():
    """#pragma load-directives resolves names against the @directive registry
    (grammar Directives.g4:98-104); unknown names fail at parse time."""
    from wrangler_ray.core.errors import RecipeParseError
    from wrangler_ray.parser.recipe import parse_recipe

    calls = parse_recipe(
        "#pragma version 2.0;\n"
        "#pragma load-directives uppercase, drop;\n"
        "uppercase :a;"
    )
    assert [c.name for c in calls] == ["uppercase"]

    import pytest as _pytest

    with _pytest.raises(RecipeParseError, match="no-such-udd"):
        parse_recipe("#pragma load-directives no-such-udd;\nuppercase :a;")
    with _pytest.raises(RecipeParseError):
        parse_recipe("#pragma load-directives ;")
    with _pytest.raises(RecipeParseError):
        parse_recipe("#pragma frobnicate x;")

    # a registered custom directive resolves like a built-in (UDD surface)
    from wrangler_ray.core.registry import Directive, directive

    @directive("my-test-udd")
    class MyUdd(Directive):
        usage = "my-test-udd :col"

        def __init__(self, call):
            self.column = call.col(0)

        def apply(self, table, ctx):
            return self.ok(table)

    calls = parse_recipe("#pragma load-directives my-test-udd;\nmy-test-udd :a;")
    assert [c.name for c in calls] == ["my-test-udd"]


def test_recipe_result_write_split(tmp_path, ray_session):
    """write_split executes the tagged chain ONCE and splits ok/error rows
    into two parquet trees (the scale path vs consuming ok()+errors())."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from wrangler_ray.pipeline import apply_recipe

    t = pa.table({"k": pa.array(range(100), pa.int64())})
    res = apply_recipe(
        rd.from_arrow(t),
        ["send-to-error exp:{k % 10 == 0} 'k divisible by 10'"],
        on_error="tag",
    )
    out = res.write_split(str(tmp_path / "out"))
    ok = pq.read_table(glob.glob(out["ok"] + "/*.parquet"))
    errs = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(out["errors"] + "/*.parquet")]
    )
    assert ok.num_rows == 90
    assert errs.num_rows == 10
    assert set(errs.column_names) == {"_wr_code", "_wr_msg", "_wr_directive", "_wr_row"}
    assert all("divisible" in m for m in errs.column("_wr_msg").to_pylist())


# -- DirectiveConfig exclusion / aliasing (reference
#    parser/ConfigDirectiveContextTest.java, exclusion-and-aliasing.md) -----

_DCONF = """{
    "exclusions": ["parse-as-csv", "invoke-http", "js-parser"],
    "aliases": {"json-parser": "parse-as-json", "js-parser": "parse-as-json"}
}"""


def test_directive_config_basic_exclude():
    import pytest as _pytest

    from wrangler_ray import DirectiveConfig, compile_recipe
    from wrangler_ray.core.errors import RecipeParseError

    cfg = DirectiveConfig.from_json(_DCONF)
    with _pytest.raises(RecipeParseError, match="restricted"):
        compile_recipe(["parse-as-csv :body ','"], config=cfg)


def test_directive_config_aliased_and_excluded():
    import pytest as _pytest

    from wrangler_ray import DirectiveConfig, compile_recipe
    from wrangler_ray.core.errors import RecipeParseError

    cfg = DirectiveConfig.from_json(_DCONF)
    # js-parser aliases parse-as-json but is itself on the exclusion list
    with _pytest.raises(RecipeParseError, match="[Aa]liased.*restricted"):
        compile_recipe(["js-parser :body"], config=cfg)


def test_directive_config_aliasing_resolves():
    from wrangler_ray import DirectiveConfig, compile_recipe

    cfg = DirectiveConfig.from_json(_DCONF)
    steps = compile_recipe(["json-parser :body"], config=cfg)
    assert len(steps) == 1
    assert steps[0].name == "parse-as-json"


def test_directive_config_empty_alias_fails_unknown():
    import pytest as _pytest

    from wrangler_ray import DirectiveConfig, compile_recipe
    from wrangler_ray.core.errors import RecipeParseError

    cfg = DirectiveConfig.from_json("{}")
    with _pytest.raises(RecipeParseError, match="unknown directive"):
        compile_recipe(["json-parser :body"], config=cfg)


def test_directive_config_no_config_passthrough():
    from wrangler_ray import compile_recipe

    steps = compile_recipe(["parse-as-json :body"])
    assert len(steps) == 1


def test_directive_config_reverse_alias():
    from wrangler_ray import DirectiveConfig

    cfg = DirectiveConfig.from_json(_DCONF)
    rev = cfg.reverse_alias()
    assert sorted(rev["parse-as-json"]) == ["js-parser", "json-parser"]

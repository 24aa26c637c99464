"""v1→v2 recipe migration parity (reference parser/MigrateToV2.java:67-770,
MigrateToV2Test.java)."""

import pyarrow as pa
import pytest

from wrangler_ray.core.errors import RecipeParseError
from wrangler_ray.parser.migrate import migrate_to_v2
from wrangler_ray.pipeline import apply_recipe_table, compile_recipe


def test_empty_and_comment_recipes():
    assert migrate_to_v2("") == ""
    assert migrate_to_v2("// test") == ""
    assert migrate_to_v2("# plain comment") == ""
    assert migrate_to_v2(["", "// a", "# b"]) == ""


def test_column_prefixing_and_quoting():
    assert migrate_to_v2("rename old new") == "rename :old :new;"
    assert migrate_to_v2("uppercase body") == "uppercase :body;"
    assert migrate_to_v2("drop a,b,c") == "drop :a,:b,:c;"
    # the v1 tokenizer reads ONE space-token for the list: a dangling
    # space-separated tail is ignored, and trailing commas drop (Java split)
    assert migrate_to_v2("drop a,b, c") == "drop :a,:b;"
    assert migrate_to_v2("keep a,b") == "keep :a,:b;"
    assert (
        migrate_to_v2("merge first second combined -")
        == "merge :first :second :combined '-';"
    )
    assert migrate_to_v2("split-to-columns body ,") == "split-to-columns :body ',';"
    assert (
        migrate_to_v2("parse-as-csv body , true")
        == "parse-as-csv :body ',' true;"
    )
    # already-quoted text is kept; text containing ' gets double quotes
    assert (
        migrate_to_v2("find-and-replace body s/a/b/g")
        == "find-and-replace :body 's/a/b/g';"
    )
    assert migrate_to_v2("mask-number ssn xx-xxx") == "mask-number :ssn 'xx-xxx';"


def test_expressions_become_exp_blocks():
    assert (
        migrate_to_v2("set column name a + b")
        == "set-column :name exp:{a + b};"
    )
    assert (
        migrate_to_v2("set columns a,b,c")
        == "set-headers :a,:b,:c;"
    )
    assert (
        migrate_to_v2("filter-row-if-true age > 10")
        == "filter-row exp:{age > 10} true;"
    )
    assert (
        migrate_to_v2("filter-row-if-matched body ^a.*")
        == "filter-by-regex if-matched :body '^a.*';"
    )
    assert (
        migrate_to_v2("send-to-error value == null")
        == "send-to-error exp:{value == null};"
    )
    assert (
        migrate_to_v2("set-variable total total + count")
        == "set-variable total exp:{total + count};"
    )


def test_filter_rows_on_subcommands():
    assert (
        migrate_to_v2("filter-rows-on condition-true x > 1")
        == "filter-row exp:{x > 1} true;"
    )
    assert (
        migrate_to_v2("filter-rows-on empty-or-null-columns a,b")
        == "filter-empty-or-null :a,:b;"
    )
    assert (
        migrate_to_v2("filter-rows-on regex-match body ^x")
        == "filter-by-regex if-matched :body '^x';"
    )
    with pytest.raises(RecipeParseError, match="unknown option"):
        migrate_to_v2("filter-rows-on bogus x")


def test_optionals_and_method_first_directives():
    assert migrate_to_v2("set-type age int") == "set-type :age int;"
    assert migrate_to_v2("copy a b") == "copy :a :b;"
    assert migrate_to_v2("copy a b true") == "copy :a :b true;"
    assert (
        migrate_to_v2("text-distance cosine a b out")
        == "text-distance 'cosine' :a :b :out;"
    )
    assert migrate_to_v2("encode base64 col") == "encode 'base64' :col;"
    assert migrate_to_v2("hash c MD5 true") == "hash :c 'MD5' true;"
    assert migrate_to_v2("cleanse-column-names") == "cleanse-column-names;"
    with pytest.raises(RecipeParseError, match="missing argument"):
        migrate_to_v2("rename onlyone")


def test_v2_lines_pass_through():
    # exp:/prop: lines and #pragma are untouched (terminator added)
    assert (
        migrate_to_v2("set-column :a exp:{b + 1}")
        == "set-column :a exp:{b + 1};"
    )
    assert migrate_to_v2("#pragma version 2.0;") == "#pragma version 2.0;"
    # MigrateToV2Test.testOldDirectivesWithNewSyntax: v2-shaped args survive
    out = migrate_to_v2("parse-as-csv :body ',' true")
    assert out == "parse-as-csv :body ',' true;"
    # unknown directives pass through with a terminator
    assert migrate_to_v2("my-custom-udd :a 'x'") == "my-custom-udd :a 'x';"


def test_migrated_recipe_compiles_and_runs():
    recipe = "\n".join(
        [
            "// legacy recipe",
            "set column doubled v * 2",
            "rename v original",
            "filter-row-if-true doubled > 4",
            "keep doubled,original",
        ]
    )
    steps = compile_recipe(recipe, migrate=True)
    assert [s.name for s in steps] == [
        "set-column", "rename", "filter-row", "keep"]
    t = pa.table({"v": pa.array([1, 2, 3], pa.int64())})
    ok, err = apply_recipe_table(t, migrate_to_v2(recipe))
    # keep preserves table order (reference Keep filters the row in place)
    assert ok.column_names == ["original", "doubled"]
    # filter-row <cond> true DROPS matching rows (reference RecordConditionFilter)
    assert ok.num_rows == 2 and err.num_rows == 0

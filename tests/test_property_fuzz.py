"""Property-based tests (hypothesis): surfaces that take arbitrary user
input must be total — the recipe parser either parses or raises
RecipeParseError (never an arbitrary exception), and the self-authored
codec pairs round-trip arbitrary conforming values bit-for-bit.
"""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# -- avro writer <-> reader round-trip --------------------------------------

_AVRO_SCHEMA = {
    "type": "record",
    "name": "fuzz",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "f", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "flag", "type": "boolean"},
        {"name": "u", "type": ["null", "string", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ],
}

_record = st.fixed_dictionaries({
    "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "f": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "s": st.text(max_size=80),
    "b": st.binary(max_size=40),
    "flag": st.booleans(),
    "u": st.one_of(st.none(), st.text(max_size=20),
                   st.integers(min_value=-(2**40), max_value=2**40)),
    "arr": st.lists(st.integers(min_value=-(2**40), max_value=2**40),
                    max_size=8),
    "m": st.dictionaries(st.text(min_size=1, max_size=10),
                         st.text(max_size=20), max_size=5),
})


@settings(max_examples=60, deadline=None)
@given(st.lists(_record, max_size=12))
def test_avro_container_roundtrip(records):
    from wrangler_ray.directives.avro_reader import read_container
    from wrangler_ray.ops.avro_writer import write_container

    blob = write_container(_AVRO_SCHEMA, records)
    _schema, decoded = read_container(blob)
    assert len(decoded) == len(records)
    for want, got in zip(records, decoded):
        for k, v in want.items():
            if isinstance(v, bytes):
                assert got[k] == v
            elif isinstance(v, float):
                assert got[k] == pytest.approx(v, nan_ok=True)
            else:
                assert got[k] == v, (k, v, got[k])


# -- binary decoders: total over arbitrary bytes -----------------------------

_DECODER_ERRORS = (ValueError, KeyError, IndexError, EOFError, OverflowError,
                   UnicodeDecodeError, TypeError, MemoryError)


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=200))
def test_avro_reader_total_over_garbage(blob):
    """Arbitrary bytes (including truncated/corrupted containers) either
    decode or raise a controlled error — never hang or crash the process."""
    from wrangler_ray.directives.avro_reader import read_container

    try:
        read_container(b"Obj\x01" + blob)
    except _DECODER_ERRORS:
        pass
    try:
        read_container(blob)
    except _DECODER_ERRORS:
        pass


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=200))
def test_proto_reader_total_over_garbage(blob):
    from wrangler_ray.directives.proto_reader import parse_descriptor_set

    try:
        parse_descriptor_set(blob)
    except _DECODER_ERRORS:
        pass


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=300))
def test_xlsx_reader_total_over_garbage(blob):
    import zipfile
    import zlib

    from wrangler_ray.directives.parsers import _xlsx_rows

    try:
        _xlsx_rows(blob, None)
    except (*_DECODER_ERRORS, zlib.error, OSError, zipfile.BadZipFile):
        pass


# -- recipe parser totality --------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(st.text(max_size=120))
def test_parse_recipe_total(garbage):
    """Arbitrary input either parses or raises RecipeParseError — no other
    exception type ever escapes (the reference's parser contract)."""
    from wrangler_ray.core.errors import RecipeParseError
    from wrangler_ray.parser.recipe import parse_recipe

    try:
        parse_recipe(garbage)
    except RecipeParseError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=80))
def test_migrate_v1_total(garbage):
    from wrangler_ray.core.errors import RecipeParseError
    from wrangler_ray.parser.migrate import migrate_to_v2

    try:
        migrate_to_v2(garbage)
    except RecipeParseError:
        pass


# -- expression engine: no eval-injection, totality over scalar exprs -------

@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_expression_engine_rejects_garbage_safely(garbage):
    """Arbitrary expression text: either evaluates against a row batch or
    raises a controlled error (RecipeParseError / ValueError family) —
    never executes side effects or raises SystemExit/KeyboardInterrupt."""
    from wrangler_ray.core.errors import RecipeParseError
    from wrangler_ray.expr.engine import compile_expression

    t = pa.table({"v": pa.array([1, 2], pa.int64())})
    try:
        compile_expression(garbage).evaluate_table(t)
    except (RecipeParseError, ValueError, TypeError, KeyError,
            AttributeError, SyntaxError, ZeroDivisionError, OverflowError,
            NotImplementedError, IndexError, ArithmeticError):
        pass


def test_expression_engine_blocks_injection():
    from wrangler_ray.expr.engine import compile_expression

    t = pa.table({"v": pa.array([1], pa.int64())})
    for evil in (
        "__import__('os').system('true')",
        "open('/etc/passwd')",
        "().__class__.__bases__[0].__subclasses__()",
        "exec('x=1')",
        "eval('1')",
    ):
        with pytest.raises(Exception):
            compile_expression(evil).evaluate_table(t)


# -- set-type conversion matrix round-trips ----------------------------------

@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
                min_size=1, max_size=10))
def test_settype_int_double_int_roundtrip(vals):
    from wrangler_ray.directives.typeconv import convert_column

    col = pa.array(vals, pa.int64())
    as_dbl = convert_column(col, "double")
    back = convert_column(as_dbl, "long")
    assert back.to_pylist() == vals

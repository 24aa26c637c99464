"""Expression function-library behavior corpus (reference
wrangler-core/src/test/java/io/cdap/functions/*Test.java). Evaluates
expressions through the real engine against 1-row tables — what `set-column`
does per batch."""

import datetime as dt

import pyarrow as pa
import pytest

from wrangler_ray.expr.engine import compile_expression


def ev(src, **cols):
    arrays = {}
    for k, v in cols.items():
        arrays[k] = pa.array([v])
    t = pa.table(arrays) if arrays else pa.table({"_x": pa.array([0])})
    out = compile_expression(src).evaluate_table(t)
    if hasattr(out, "__len__") and not isinstance(out, (str, bytes)):
        return out[0]
    return out


# --- Global.java -----------------------------------------------------------

def test_coalesce():
    assert ev("coalesce(a, b, c)", a=None, b=None, c="c") == "c"
    assert ev("coalesce(a, b)", a="a", b="b") == "a"


def test_null_helpers():
    assert ev("NullToEmpty(a)", a=None) == ""
    assert ev("NullToZero(a)", a=None) == 0
    assert ev("NullToValue(a, 42)", a=None) == 42
    assert bool(ev("IsNull(a)", a=None)) is True
    assert bool(ev("IsNotNull(a)", a="x")) is True


def test_concat_format_pad():
    assert ev("concat(a, '-', b)", a="x", b="y") == "x-y"
    assert ev("format('%s=%d', a, b)", a="k", b=7) == "k=7"
    assert ev("padAtStart(a, 5, '0')", a="42") == "00042"
    assert ev("padAtEnd(a, 4, 'x')", a="ab") == "abxx"


def test_numeric_conversions():
    assert ev("toInteger(a)", a="12") == 12
    assert ev("toDouble(a)", a="1.5") == 1.5
    assert ev("unquote(a)", a='"hi"') == "hi"


# --- DataQuality.java / Types.java -----------------------------------------

def test_dq_inrange():
    assert bool(ev("dq:inrange(1, 0, 10)")) is True
    assert bool(ev("dq:inrange(0.9, 1, 10)")) is False
    assert bool(ev("dq:inrange(1.1, 1, 10)")) is True


def test_dq_email_url_ip():
    assert bool(ev("dq:isEmail(a)", a="root@example.io")) is True
    assert bool(ev("dq:isEmail(a)", a="not-an-email")) is False
    assert bool(ev("dq:isUrl(a)", a="https://x.io/p")) is True
    assert bool(ev("dq:isIP(a)", a="10.0.0.1")) is True
    assert bool(ev("dq:isIP(a)", a="999.0.0.1")) is False


def test_dq_luhn_cards():
    # 4111111111111111 is the canonical Visa test number (passes Luhn)
    assert bool(ev("dq:isCreditCard(a)", a="4111111111111111")) is True
    assert bool(ev("dq:isCreditCard(a)", a="4111111111111112")) is False


def test_types_sniffing():
    # Types.java helpers are registered under the dq: namespace (EL.java
    # has no separate "types" namespace)
    assert bool(ev("dq:isInteger(a)", a="123")) is True
    assert bool(ev("dq:isInteger(a)", a="1.5")) is False
    assert bool(ev("dq:isNumber(a)", a="1.5")) is True
    assert bool(ev("dq:isBoolean(a)", a="true")) is True
    assert bool(ev("dq:isDate(a)", a="2024-01-02")) is True
    assert bool(ev("dq:isEmpty(a)", a="")) is True


# --- Dates.java / DateAndTime.java -----------------------------------------

def test_date_components():
    d = dt.datetime(2017, 2, 2, 21, 6, 44)
    assert ev("date:YEAR(a)", a=d) == 2017
    assert ev("date:MONTH(a)", a=d) == 2
    assert ev("date:DAY_OF_WEEK(a)", a=d) in (4, 5)  # Thu (locale convention)


def test_days_between():
    a = dt.datetime(2024, 1, 1)
    b = dt.datetime(2024, 1, 11)
    assert abs(ev("date:DAYS_BETWEEN(a, b)", a=a, b=b)) == 10


# --- JsonFunctions.java ----------------------------------------------------

def test_json_select_and_len():
    j = '{"a": {"b": [1, 2, 3]}, "name": "x"}'
    assert ev("json:ArrayLength(json:Select(a, '$.a.b'))", a=j) == 3
    assert bool(ev("json:IsValid(a)", a=j)) is True
    assert bool(ev("json:IsValid(a)", a="{nope")) is False


# --- Logical.java ----------------------------------------------------------

def test_bit_ops():
    assert ev("logical:BitAnd(a, b)", a=12, b=10) == 8
    assert ev("logical:BitOr(a, b)", a=12, b=10) == 14
    assert ev("logical:BitXor(a, b)", a=12, b=10) == 6


# --- vectorized evaluation over real columns --------------------------------

def test_vectorized_batch_path():
    t = pa.table({"v": pa.array([1, 2, 3], pa.int64()), "s": ["a", "bb", "ccc"]})
    expr = compile_expression("v * 2 + string:length(s)")
    out = expr.evaluate_table(t)
    assert list(out) == [3, 6, 9]

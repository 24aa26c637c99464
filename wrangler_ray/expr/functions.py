"""Scalar function library for the expression engine.

Re-implements (vectorized where cheap, elementwise otherwise) the reference's
JEXL function namespaces (reference wrangler-core/src/main/java/io/cdap/functions/:
Global.java, NumberFunctions.java, Logical.java, Dates.java, DateAndTime.java,
JsonFunctions.java, DataQuality.java, Types.java; registered in
expression/EL.java:82-99). Functions are plain Python callables; the
``@elementwise`` decorator lifts them over numpy arrays so the vectorized
expression path can call them on whole columns.
"""

from __future__ import annotations

import datetime as _dt
import json as _json
import math as _math
import re as _re
from functools import wraps

import numpy as np

FUNCTIONS: dict = {}


def _register(name, fn):
    FUNCTIONS[name] = fn


def elementwise(fn):
    @wraps(fn)
    def wrapper(*args):
        arrs = [(i, a) for i, a in enumerate(args) if isinstance(a, np.ndarray)]
        if not arrs:
            return fn(*args)
        n = len(arrs[0][1])
        out = []
        for r in range(n):
            row_args = [a[r] if isinstance(a, np.ndarray) else a for a in args]
            try:
                out.append(fn(*row_args))
            except Exception:
                out.append(None)
        return np.array(out, dtype=object)

    return wrapper


def expr_function(*names):
    """Register under one or more names (bare = Global namespace;
    'ns:fn' is looked up as 'ns__fn' after preprocessing)."""

    def deco(fn):
        for n in names:
            _register(n.replace(":", "__"), fn)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Global namespace (reference functions/Global.java)
# ---------------------------------------------------------------------------

@expr_function("IsNull")
def _isnull(v):
    if isinstance(v, np.ndarray):
        if v.dtype == object:
            return np.fromiter((x is None for x in v), bool, len(v))
        if np.issubdtype(v.dtype, np.floating):
            return np.isnan(v)
        return np.zeros(len(v), bool)
    return v is None or (isinstance(v, float) and _math.isnan(v))


@expr_function("IsNotNull")
def _isnotnull(v):
    r = _isnull(v)
    return ~r if isinstance(r, np.ndarray) else not r


@expr_function("NullToEmpty")
@elementwise
def _null_to_empty(v):
    return "" if v is None else v


@expr_function("NullToZero")
@elementwise
def _null_to_zero(v):
    return 0 if v is None or (isinstance(v, float) and _math.isnan(v)) else v


@expr_function("NullToValue")
@elementwise
def _null_to_value(v, default):
    return default if v is None or (isinstance(v, float) and _math.isnan(v)) else v


@expr_function("coalesce")
@elementwise
def _coalesce(*vals):
    for v in vals:
        if v is not None and not (isinstance(v, float) and _math.isnan(v)):
            return v
    return None


@expr_function("rcoalesce")
@elementwise
def _rcoalesce(*vals):
    return _coalesce.__wrapped__(*reversed(vals))


@expr_function("concat")
@elementwise
def _concat(*vals):
    return "".join("" if v is None else str(v) for v in vals)


@expr_function("format")
@elementwise
def _format(fmt, *args):
    # Java String.format subset: %s %d %f with widths
    return fmt % tuple(args) if "%" in fmt else fmt.format(*args)


@expr_function("padAtStart")
@elementwise
def _pad_start(v, length, pad):
    s = "" if v is None else str(v)
    return s.rjust(int(length), str(pad)[0] if pad else " ")


@expr_function("padAtEnd")
@elementwise
def _pad_end(v, length, pad):
    s = "" if v is None else str(v)
    return s.ljust(int(length), str(pad)[0] if pad else " ")


@expr_function("repeat")
@elementwise
def _repeat(v, n):
    return ("" if v is None else str(v)) * int(n)


@expr_function("unquote")
@elementwise
def _unquote(v):
    if v is None:
        return None
    s = str(v)
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        return s[1:-1]
    return s


@expr_function("toInteger", "toInt")
@elementwise
def _to_integer(v):
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return int.from_bytes(v[:4], "big")
    return int(float(v))


@expr_function("toLong")
@elementwise
def _to_long(v):
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return int.from_bytes(v[:8], "big")
    return int(float(v))


@expr_function("toFloat", "toDouble")
@elementwise
def _to_double(v):
    return None if v is None else float(v)


@expr_function("toString")
@elementwise
def _to_string(v):
    return None if v is None else str(v)


@expr_function("toBytes")
@elementwise
def _to_bytes(v):
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return str(v).encode("utf-8")


# ---------------------------------------------------------------------------
# math: namespace → numpy-native (vectorizes for free)
# ---------------------------------------------------------------------------

for _name, _fn in {
    "math:abs": np.abs,
    "math:ceil": np.ceil,
    "math:floor": np.floor,
    "math:sqrt": np.sqrt,
    "math:exp": np.exp,
    "math:log": np.log,
    "math:log10": np.log10,
    "math:pow": np.power,
    "math:sin": np.sin,
    "math:cos": np.cos,
    "math:tan": np.tan,
}.items():
    _register(_name.replace(":", "__"), _fn)


@expr_function("math:max")
def _math_max(a, b):
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return np.maximum(a, b)
    return max(a, b)


@expr_function("math:min")
def _math_min(a, b):
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return np.minimum(a, b)
    return min(a, b)


@expr_function("math:round")
def _math_round(a):
    if isinstance(a, np.ndarray):
        return np.round(a)
    return round(a)


# ---------------------------------------------------------------------------
# string: namespace (Java String-method-ish helpers)
# ---------------------------------------------------------------------------

@expr_function("string:lower", "string:toLowerCase")
@elementwise
def _s_lower(v):
    return None if v is None else str(v).lower()


@expr_function("string:upper", "string:toUpperCase")
@elementwise
def _s_upper(v):
    return None if v is None else str(v).upper()


@expr_function("string:trim")
@elementwise
def _s_trim(v):
    return None if v is None else str(v).strip()


@expr_function("string:substring")
@elementwise
def _s_substring(v, start, end=None):
    if v is None:
        return None
    s = str(v)
    return s[int(start):] if end is None else s[int(start):int(end)]


@expr_function("string:length", "strlen", "dq:strlen")
@elementwise
def _s_length(v):
    return None if v is None else len(str(v))


@expr_function("string:indexOf")
@elementwise
def _s_indexof(v, sub):
    return None if v is None else str(v).find(str(sub))


@expr_function("string:contains")
@elementwise
def _s_contains(v, sub):
    return False if v is None else str(sub) in str(v)


@expr_function("string:startsWith")
@elementwise
def _s_startswith(v, p):
    return False if v is None else str(v).startswith(str(p))


@expr_function("string:endsWith")
@elementwise
def _s_endswith(v, p):
    return False if v is None else str(v).endswith(str(p))


@expr_function("string:replace", "string:replaceAll")
@elementwise
def _s_replace(v, find, repl):
    return None if v is None else _re.sub(find, repl, str(v))


@expr_function("string:split")
@elementwise
def _s_split(v, sep):
    return None if v is None else str(v).split(sep)


# ---------------------------------------------------------------------------
# logical: (reference functions/Logical.java)
# ---------------------------------------------------------------------------

@expr_function("logical:BitAnd", "BitAnd")
@elementwise
def _bitand(a, b):
    return int(a) & int(b)


@expr_function("logical:BitOr", "BitOr")
@elementwise
def _bitor(a, b):
    return int(a) | int(b)


@expr_function("logical:BitXor", "BitXor")
@elementwise
def _bitxor(a, b):
    return int(a) ^ int(b)


@expr_function("logical:Not", "Not")
@elementwise
def _lnot(a):
    return not bool(a)


@expr_function("logical:SetBit", "SetBit")
@elementwise
def _setbit(v, bit, flag):
    v = int(v)
    return v | (1 << int(bit)) if int(flag) else v & ~(1 << int(bit))


# ---------------------------------------------------------------------------
# date:/datetime: (reference functions/Dates.java + DateAndTime.java subset)
# ---------------------------------------------------------------------------

def _as_dt(v):
    if v is None:
        return None
    if isinstance(v, np.datetime64):
        us = v.astype("datetime64[us]").astype("int64")
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=int(us))
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v
    if isinstance(v, (int, float)):
        return _dt.datetime.utcfromtimestamp(v)
    if isinstance(v, str):
        return _dt.datetime.fromisoformat(v)
    return None


@expr_function("date:YEAR", "datetime:getYear")
@elementwise
def _d_year(v):
    d = _as_dt(v)
    return None if d is None else d.year


@expr_function("date:MONTH", "datetime:getMonth")
@elementwise
def _d_month(v):
    d = _as_dt(v)
    return None if d is None else d.month


@expr_function("date:DAY", "date:DAY_OF_MONTH")
@elementwise
def _d_day(v):
    d = _as_dt(v)
    return None if d is None else d.day


@expr_function("date:HOUR")
@elementwise
def _d_hour(v):
    d = _as_dt(v)
    return None if d is None else d.hour


@expr_function("date:MINUTE")
@elementwise
def _d_minute(v):
    d = _as_dt(v)
    return None if d is None else d.minute


@expr_function("date:SECOND")
@elementwise
def _d_second(v):
    d = _as_dt(v)
    return None if d is None else d.second


@expr_function("date:DAY_OF_WEEK")
@elementwise
def _d_dow(v):
    d = _as_dt(v)
    # Java Calendar: SUNDAY=1..SATURDAY=7
    return None if d is None else (d.weekday() + 1) % 7 + 1


@expr_function("date:DAYS_BETWEEN")
@elementwise
def _d_days_between(a, b):
    da, db = _as_dt(a), _as_dt(b)
    if da is None or db is None:
        return None
    if isinstance(da, _dt.datetime) and not isinstance(db, _dt.datetime):
        db = _dt.datetime.combine(db, _dt.time())
    if isinstance(db, _dt.datetime) and not isinstance(da, _dt.datetime):
        da = _dt.datetime.combine(da, _dt.time())
    return abs((da - db).days)


@expr_function("date:UNIXTIMESTAMP_SECONDS")
@elementwise
def _d_unix_s(v):
    d = _as_dt(v)
    return None if d is None else int(d.timestamp()) if isinstance(d, _dt.datetime) else None


@expr_function("date:UNIXTIMESTAMP_MILLIS")
@elementwise
def _d_unix_ms(v):
    d = _as_dt(v)
    return None if d is None else int(d.timestamp() * 1000)


@expr_function("date:CURRENT_DATE", "date:CURRENT_TIMESTAMP")
def _d_now():
    # Deterministic replay: callers can override via environment injection of
    # a 'now' variable; bare function returns wall clock.
    return _dt.datetime.now()


@expr_function("datetime:DaysInMonth")
@elementwise
def _d_days_in_month(v):
    import calendar

    d = _as_dt(v)
    return None if d is None else calendar.monthrange(d.year, d.month)[1]


# ---------------------------------------------------------------------------
# json: (reference functions/JsonFunctions.java)
# ---------------------------------------------------------------------------

@expr_function("json:Parse")
@elementwise
def _j_parse(v):
    return None if v is None else _json.loads(v)


@expr_function("json:Stringify")
@elementwise
def _j_stringify(v):
    return None if v is None else _json.dumps(v, ensure_ascii=False)


@expr_function("json:IsValid")
@elementwise
def _j_isvalid(v):
    if v is None:
        return False
    try:
        _json.loads(v)
        return True
    except (ValueError, TypeError):
        return False


@expr_function("json:ArrayLength")
@elementwise
def _j_arraylength(v):
    if v is None:
        return None
    obj = _json.loads(v) if isinstance(v, str) else v
    if isinstance(obj, np.ndarray):
        return int(len(obj))
    return len(obj) if isinstance(obj, (list, tuple)) else None


@expr_function("json:Select")
@elementwise
def _j_select(v, path):
    """Minimal JsonPath: $.a.b[0].c"""
    if v is None:
        return None
    obj = _json.loads(v) if isinstance(v, str) else v
    p = str(path)
    if p.startswith("$"):
        p = p[1:]
    for part in _re.findall(r"\.([A-Za-z_][A-Za-z0-9_]*)|\[(\d+)\]", p):
        key, idx = part
        try:
            obj = obj[key] if key else obj[int(idx)]
        except (KeyError, IndexError, TypeError):
            return None
    return obj


# ---------------------------------------------------------------------------
# dq: data-quality checks (reference functions/DataQuality.java + Types.java)
# ---------------------------------------------------------------------------

_EMAIL_RE = _re.compile(r"^[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}$")
_URL_RE = _re.compile(r"^(https?|ftp)://[^\s/$.?#].[^\s]*$", _re.I)
_IPV4_RE = _re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
_DOMAIN_RE = _re.compile(r"^(?!-)[A-Za-z0-9\-]{1,63}(?<!-)(\.[A-Za-z]{2,})+$")


@expr_function("dq:isEmail")
@elementwise
def _dq_email(v):
    return bool(v) and bool(_EMAIL_RE.match(str(v)))


@expr_function("dq:isUrl")
@elementwise
def _dq_url(v):
    return bool(v) and bool(_URL_RE.match(str(v)))


@expr_function("dq:isIP", "dq:isIPv4")
@elementwise
def _dq_ip(v):
    if not v:
        return False
    m = _IPV4_RE.match(str(v))
    return bool(m) and all(0 <= int(g) <= 255 for g in m.groups())


@expr_function("dq:isIPv6")
@elementwise
def _dq_ipv6(v):
    import ipaddress

    try:
        ipaddress.IPv6Address(str(v))
        return True
    except Exception:
        return False


@expr_function("dq:isDomainName")
@elementwise
def _dq_domain(v):
    return bool(v) and bool(_DOMAIN_RE.match(str(v)))


def _luhn(num: str) -> bool:
    digits = [int(c) for c in num if c.isdigit()]
    if len(digits) < 12:
        return False
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@expr_function("dq:isCreditCard")
@elementwise
def _dq_cc(v):
    return bool(v) and _luhn(str(v))


@expr_function("dq:isDate")
@elementwise
def _dq_isdate(v):
    if v is None:
        return False
    if isinstance(v, (_dt.date, _dt.datetime, np.datetime64)):
        return True
    try:
        _dt.datetime.fromisoformat(str(v))
        return True
    except ValueError:
        pass
    for fmt in ("%m/%d/%Y", "%d/%m/%Y", "%Y/%m/%d", "%m-%d-%Y", "%d.%m.%Y"):
        try:
            _dt.datetime.strptime(str(v), fmt)
            return True
        except ValueError:
            continue
    return False


@expr_function("dq:inrange")
@elementwise
def _dq_inrange(v, lo, hi):
    if v is None:
        return False
    try:
        return float(lo) <= float(v) <= float(hi)
    except (TypeError, ValueError):
        return False


@expr_function("dq:isNumber", "dq:isNumeric")
@elementwise
def _dq_isnumber(v):
    if v is None:
        return False
    if isinstance(v, (int, float, np.integer, np.floating)):
        return True
    try:
        float(str(v))
        return True
    except ValueError:
        return False


@expr_function("dq:isInteger")
@elementwise
def _dq_isint(v):
    if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
        return True
    try:
        int(str(v))
        return True
    except (TypeError, ValueError):
        return False


@expr_function("dq:isBoolean")
@elementwise
def _dq_isbool(v):
    return isinstance(v, (bool, np.bool_)) or str(v).lower() in ("true", "false")


@expr_function("dq:isEmpty")
@elementwise
def _dq_isempty(v):
    return v is None or str(v) == ""


@expr_function("dq:isISBN")
@elementwise
def _dq_isbn(v):
    if not v:
        return False
    s = str(v).replace("-", "").replace(" ", "")
    if len(s) == 10:
        if not s[:9].isdigit() or not (s[9].isdigit() or s[9] in "Xx"):
            return False
        total = sum((10 - i) * (10 if c in "Xx" else int(c)) for i, c in enumerate(s))
        return total % 11 == 0
    if len(s) == 13 and s.isdigit():
        total = sum(int(c) * (1 if i % 2 == 0 else 3) for i, c in enumerate(s))
        return total % 10 == 0
    return False


# geo: (reference functions/GeoFences.java — polygon containment)
@expr_function("geo:InFence")
@elementwise
def _geo_infence(lat, lon, fence_json):
    """Point-in-polygon via ray casting; fence is a GeoJSON-ish polygon."""
    try:
        obj = _json.loads(fence_json) if isinstance(fence_json, str) else fence_json
        if isinstance(obj, dict):
            if obj.get("type") == "FeatureCollection":
                obj = obj["features"][0]["geometry"]
            elif obj.get("type") == "Feature":
                obj = obj["geometry"]
            coords = obj["coordinates"][0]
        else:
            coords = obj
        x, y = float(lon), float(lat)
        inside = False
        j = len(coords) - 1
        for i in range(len(coords)):
            xi, yi = coords[i][0], coords[i][1]
            xj, yj = coords[j][0], coords[j][1]
            if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
                inside = not inside
            j = i
        return inside
    except Exception:
        return False

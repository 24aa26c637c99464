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


# ---------------------------------------------------------------------------
# datetime: DataStage family (reference functions/DateAndTime.java — the full
# corpus; parity cases from wrangler-core DateAndTimeTest.java)
# ---------------------------------------------------------------------------

_MONTH_MAX_LEN = [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]  # Java Month.maxLength
_DOW = {
    "MON": 0, "MONDAY": 0, "TUE": 1, "TUESDAY": 1, "WED": 2, "WEDNESDAY": 2,
    "THU": 3, "THURSDAY": 3, "FRI": 4, "FRIDAY": 4, "SAT": 5, "SATUDAY": 5,
    "SATURDAY": 5, "SUN": 6, "SUNDAY": 6,
}


def _as_date(v):
    """LocalDate-ish: date / datetime / 'yyyy-MM-dd[ HH:mm:ss[.f]]' string."""
    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        return v.date()
    if isinstance(v, _dt.date):
        return v
    if isinstance(v, str):
        return _dt.datetime.fromisoformat(v).date()
    if isinstance(v, np.datetime64):
        return v.astype("datetime64[us]").astype(_dt.datetime).date()
    return None


def _as_time(v):
    """LocalTime-ish: time / datetime / 'HH:mm:ss[.f]' string."""
    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        return v.time()
    if isinstance(v, _dt.time):
        return v
    if isinstance(v, str):
        return _dt.time.fromisoformat(v)
    return None


def _as_dtt(v):
    """LocalDateTime-ish: datetime / date / string / epoch number."""
    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime.combine(v, _dt.time())
    if isinstance(v, str):
        return _dt.datetime.fromisoformat(v)
    if isinstance(v, (int, float)):
        return _dt.datetime.utcfromtimestamp(v)
    if isinstance(v, np.datetime64):
        return v.astype("datetime64[us]").astype(_dt.datetime)
    return None


def _plus_months(d, months: int):
    """Java plusMonths: clamp day-of-month to the target month's length."""
    import calendar

    y = d.year + (d.month - 1 + months) // 12
    m = (d.month - 1 + months) % 12 + 1
    day = min(d.day, calendar.monthrange(y, m)[1])
    return d.replace(year=y, month=m, day=day)


def _plus_years(d, years: int):
    return _plus_months(d, years * 12)


@expr_function("datetime:GetDate")
@elementwise
def _dt_getdate(s):
    return None if s is None else _as_date(s)


@expr_function("datetime:GetTime")
@elementwise
def _dt_gettime(s):
    return None if s is None else _as_time(s)


@expr_function("datetime:GetDateTime")
@elementwise
def _dt_getdatetime(a, b=None):
    # 1-arg: parse a datetime string; 2-arg: combine (date, time)
    if b is None:
        return None if a is None else _as_dtt(a)
    da, tb = _as_date(a), _as_time(b)
    return None if da is None or tb is None else _dt.datetime.combine(da, tb)


@expr_function("datetime:CurrentDate")
def _dt_currentdate():
    return _dt.date.today()


@expr_function("datetime:CurrentTime")
def _dt_currenttime():
    return _dt.datetime.now().time()


@expr_function("datetime:CurrentTimeMS")
def _dt_currenttimems():
    t = _dt.datetime.now().time()
    return ((t.hour * 60 + t.minute) * 60 + t.second) * 1000 + t.microsecond // 1000


@expr_function("datetime:CurrentDateTime")
def _dt_currentdatetime():
    return _dt.datetime.now()


@expr_function("datetime:CurrentTimestamp")
def _dt_currenttimestamp():
    return _dt.datetime.now(_dt.timezone.utc)


@expr_function("datetime:EpochSeconds")
def _dt_epochseconds():
    import time as _time

    return int(_time.time())


@expr_function("datetime:CurrentTimestampMS")
def _dt_currenttimestampms():
    import time as _time

    return int(_time.time() * 1000)


@expr_function("datetime:CurrentTimestampNano")
def _dt_currenttimestampnano():
    # reference returns Instant.now().getNano() — the NANO-OF-SECOND field
    return _dt.datetime.now().microsecond * 1000


@expr_function("datetime:TimeDate")
def _dt_timedate():
    # OUTPUT_DATETIME_FORMAT = "HH:mm:ss dd MMM yyyy"
    return _dt.datetime.now().strftime("%H:%M:%S %d %b %Y")


@expr_function("datetime:DateFromDaysSince")
@elementwise
def _dt_datefromdayssince(days, baseline=None):
    base = _as_date(baseline) if baseline is not None else _dt.date.today()
    if base is None:
        base = _dt.date.today()
    return base + _dt.timedelta(days=int(days) if days is not None else 0)


@expr_function("datetime:DateFromComponents")
@elementwise
def _dt_datefromcomponents(year, month, day):
    if year is None or month is None or day is None:
        return None
    return _dt.date(int(year), int(month), int(day))


@expr_function("datetime:DateFromJulianDay")
@elementwise
def _dt_datefromjulianday(jd):
    # joda fromJulianDay: ms = (jd - 2440587.5) * 86400000 → date part
    v = float(jd) if jd is not None else 0.0
    dtv = _dt.datetime(1970, 1, 1) + _dt.timedelta(days=v - 2440587.5)
    return dtv.date()


@expr_function("datetime:DateOffsetByComponents")
@elementwise
def _dt_dateoffsetbycomponents(baseline, y, m, d):
    b = _as_date(baseline)
    if b is None:
        return None
    b = _plus_years(b, int(y) if y is not None else 0)
    b = _plus_months(b, int(m) if m is not None else 0)
    return b + _dt.timedelta(days=int(d) if d is not None else 0)


@expr_function("datetime:DaysSinceFromDate")
@elementwise
def _dt_dayssincefromdate(source, destination):
    s, d = _as_date(source), _as_date(destination)
    return None if s is None or d is None else (d - s).days


@expr_function("datetime:DaysInMonth")
@elementwise
def _dt_daysinmonth(v):
    # Java Month.maxLength(): February is ALWAYS 29 (max over leap years) —
    # reference DateAndTime.java:290
    d = _as_date(v)
    return None if d is None else _MONTH_MAX_LEN[d.month - 1]


@expr_function("datetime:DaysInYear")
@elementwise
def _dt_daysinyear(v):
    import calendar

    d = _as_date(v)
    return None if d is None else 366 if calendar.isleap(d.year) else 365


@expr_function("datetime:DateOffsetByDays")
@elementwise
def _dt_dateoffsetbydays(v, off):
    d = _as_date(v)
    return None if d is None else d + _dt.timedelta(days=int(off) if off is not None else 0)


@expr_function("datetime:HoursFromTime")
@elementwise
def _dt_hoursfromtime(v):
    t = _as_time(v)
    return None if t is None else t.hour


@expr_function("datetime:JulianDayFromDate")
@elementwise
def _dt_juliandayfromdate(v):
    d = _as_date(v)
    if d is None:
        return None
    days = (d - _dt.date(1970, 1, 1)).days
    return int(_math.floor(days + 2440587.5 + 0.5))


@expr_function("datetime:NanoSecondsFromTime")
@elementwise
def _dt_nanosecondsfromtime(v):
    t = _as_time(v)
    return None if t is None else t.microsecond * 1000


@expr_function("datetime:MicroSecondsFromTime")
@elementwise
def _dt_microsecondsfromtime(v):
    t = _as_time(v)
    return None if t is None else t.microsecond


@expr_function("datetime:MilliSecondsFromTime")
@elementwise
def _dt_millisecondsfromtime(v):
    t = _as_time(v)
    return None if t is None else t.microsecond // 1000


@expr_function("datetime:MidnightSecondsFromTime")
@elementwise
def _dt_midnightsecondsfromtime(v):
    t = _as_time(v)
    return None if t is None else (t.hour * 60 + t.minute) * 60 + t.second


@expr_function("datetime:MinutesFromTime")
@elementwise
def _dt_minutesfromtime(v):
    t = _as_time(v)
    return None if t is None else t.minute


@expr_function("datetime:SecondsFromTime")
@elementwise
def _dt_secondsfromtime(v):
    t = _as_time(v)
    return None if t is None else t.second


@expr_function("datetime:MonthDayFromDate")
@elementwise
def _dt_monthdayfromdate(v):
    d = _as_date(v)
    return None if d is None else d.day


@expr_function("datetime:MonthFromDate")
@elementwise
def _dt_monthfromdate(v):
    d = _as_date(v)
    return None if d is None else d.month


@expr_function("datetime:NextWeekdayFromDate")
@elementwise
def _dt_nextweekdayfromdate(source, dow):
    d = _as_date(source)
    if d is None:
        return None
    if dow is None:
        return d
    target = _DOW.get(str(dow).upper(), 6)
    delta = (target - d.weekday() - 1) % 7 + 1  # strictly next
    return d + _dt.timedelta(days=delta)


@expr_function("datetime:PreviousWeekdayFromDate")
@elementwise
def _dt_previousweekdayfromdate(source, dow):
    d = _as_date(source)
    if d is None:
        return None
    if dow is None:
        return d
    target = _DOW.get(str(dow).upper(), 6)
    delta = (d.weekday() - target - 1) % 7 + 1  # strictly previous
    return d - _dt.timedelta(days=delta)


@expr_function("datetime:NthWeekdayFromDate")
@elementwise
def _dt_nthweekdayfromdate(source, dow, offset):
    d = _as_date(source)
    if d is None or dow is None:
        return d
    n = int(offset) if offset is not None else 0
    for _ in range(abs(n)):
        d = (_dt_nextweekdayfromdate.__wrapped__(d, dow) if n > 0
             else _dt_previousweekdayfromdate.__wrapped__(d, dow))
    return d


@expr_function("datetime:SecondsSinceFromDateTime")
@elementwise
def _dt_secondssincefromdatetime(source, destination):
    s, d = _as_dtt(source), _as_dtt(destination)
    if s is None or d is None:
        return None
    # Duration.between(destination, source).getSeconds() — floor division
    return int(_math.floor((s - d).total_seconds()))


@expr_function("datetime:TimeFromComponents")
@elementwise
def _dt_timefromcomponents(hours, mins, seconds, microseconds):
    if hours is None or mins is None or seconds is None or microseconds is None:
        return None
    return _dt.time(int(hours), int(mins), int(seconds), int(microseconds))


@expr_function("datetime:TimeFromMidnightSeconds")
@elementwise
def _dt_timefrommidnightseconds(seconds):
    s = int(seconds) if seconds is not None else 0
    base = _dt.datetime(2000, 1, 1) + _dt.timedelta(seconds=s)
    return base.time()


@expr_function("datetime:TimeOffsetByComponents")
@elementwise
def _dt_timeoffsetbycomponents(time, hour, minute, seconds):
    t = _as_time(time)
    if t is None:
        return None
    total = (
        ((t.hour + (int(hour) if hour is not None else 0)) * 60
         + t.minute + (int(minute) if minute is not None else 0)) * 60
        + t.second + (int(seconds) if seconds is not None else 0)
    ) % 86400
    return _dt.time(total // 3600, total % 3600 // 60, total % 60, t.microsecond)


@expr_function("datetime:DateTimeFromSecondsSince")
@elementwise
def _dt_datetimefromsecondssince(seconds, time):
    t = _as_dtt(time)
    if t is None:
        return None
    return t + _dt.timedelta(seconds=int(seconds) if seconds is not None else 0)


@expr_function("datetime:DateTimeFromEpoch")
@elementwise
def _dt_datetimefromepoch(epoch):
    return None if epoch is None else _dt.datetime.utcfromtimestamp(int(epoch))


@expr_function("datetime:DateTimeFromTime")
@elementwise
def _dt_datetimefromtime(time, datetime_):
    d = _as_dtt(datetime_)
    if d is None:
        return None
    t = _as_time(time)
    if t is None:
        return d
    return d.replace(hour=t.hour, minute=t.minute, second=t.second,
                     microsecond=t.microsecond)


@expr_function("datetime:DateTimeOffsetByComponents")
@elementwise
def _dt_datetimeoffsetbycomponents(datetime_, y, mo, d, h, mi, s):
    b = _as_dtt(datetime_)
    if b is None:
        return None
    b = _plus_years(b, int(y) if y is not None else 0)
    b = _plus_months(b, int(mo) if mo is not None else 0)
    return b + _dt.timedelta(
        days=int(d) if d is not None else 0,
        hours=int(h) if h is not None else 0,
        minutes=int(mi) if mi is not None else 0,
        seconds=int(s) if s is not None else 0,
    )


@expr_function("datetime:DateTimeOffsetBySeconds")
@elementwise
def _dt_datetimeoffsetbyseconds(datetime_, seconds):
    b = _as_dtt(datetime_)
    if b is None:
        return None
    return b + _dt.timedelta(seconds=int(seconds) if seconds is not None else 0)


@expr_function("datetime:EpochFromDateTime")
@elementwise
def _dt_epochfromdatetime(datetime_):
    d = _as_dtt(datetime_)
    if d is None:
        return None
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return int(_math.floor(d.timestamp()))


@expr_function("datetime:EpochFromTimestamp")
@elementwise
def _dt_epochfromtimestamp(ts):
    return _dt_epochfromdatetime.__wrapped__(ts)


@expr_function("datetime:WeekdayFromDate")
@elementwise
def _dt_weekdayfromdate(v, start_of_week="Sunday"):
    d = _as_date(v)
    if d is None:
        return None
    if start_of_week is None:
        dow_val = d.weekday() + 1  # java DayOfWeek.getValue: Mon=1..Sun=7
    else:
        target = _DOW.get(str(start_of_week).upper(), 6)
        prev_or_same = d - _dt.timedelta(days=(d.weekday() - target) % 7)
        dow_val = prev_or_same.weekday() + 1
    return 7 - dow_val + 1


@expr_function("datetime:YeardayFromDate")
@elementwise
def _dt_yeardayfromdate(v):
    d = _as_date(v)
    return None if d is None else d.timetuple().tm_yday


@expr_function("datetime:YearFromDate")
@elementwise
def _dt_yearfromdate(v):
    d = _as_date(v)
    return None if d is None else d.year


@expr_function("datetime:YearweekFromDate")
@elementwise
def _dt_yearweekfromdate(v):
    # WeekFields(MONDAY, minimalDays=7): week 1 starts at the first Monday of
    # the year; earlier days belong to the previous week-based year
    d = _as_date(v)
    if d is None:
        return None

    def first_monday(y):
        j = _dt.date(y, 1, 1)
        return j + _dt.timedelta(days=(7 - j.weekday()) % 7)

    fm = first_monday(d.year)
    if d < fm:
        fm = first_monday(d.year - 1)
    return (d - fm).days // 7 + 1


# ---------------------------------------------------------------------------
# date: remaining Dates.java corpus (reference functions/Dates.java)
# ---------------------------------------------------------------------------

_MONTH_SHORT = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONTH_LONG = ["January", "February", "March", "April", "May", "June", "July",
               "August", "September", "October", "November", "December"]
_DOW_SHORT = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_DOW_LONG = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
             "Saturday", "Sunday"]


@expr_function("date:MONTH_SHORT")
@elementwise
def _d_month_short(v):
    d = _as_dt(v)
    return None if d is None else _MONTH_SHORT[d.month - 1]


@expr_function("date:MONTH_LONG")
@elementwise
def _d_month_long(v):
    d = _as_dt(v)
    return None if d is None else _MONTH_LONG[d.month - 1]


@expr_function("date:DAY_OF_WEEK_SHORT")
@elementwise
def _d_dow_short(v):
    d = _as_dt(v)
    return None if d is None else _DOW_SHORT[d.weekday()]


@expr_function("date:DAY_OF_WEEK_LONG")
@elementwise
def _d_dow_long(v):
    d = _as_dt(v)
    return None if d is None else _DOW_LONG[d.weekday()]


@expr_function("date:DAY_OF_YEAR")
@elementwise
def _d_day_of_year(v):
    d = _as_dt(v)
    return None if d is None else d.timetuple().tm_yday


@expr_function("date:ERA")
@elementwise
def _d_era(v):
    d = _as_dt(v)
    return None if d is None else (1 if d.year > 0 else 0)


@expr_function("date:ERA_SHORT")
@elementwise
def _d_era_short(v):
    d = _as_dt(v)
    return None if d is None else ("AD" if d.year > 0 else "BC")


@expr_function("date:ERA_LONG")
@elementwise
def _d_era_long(v):
    d = _as_dt(v)
    return None if d is None else ("AD" if d.year > 0 else "BC")


@expr_function("date:DAYS_BETWEEN_NOW")
@elementwise
def _d_days_between_now(v):
    d = _as_dt(v)
    if d is None:
        return None
    now = _dt.datetime.utcnow()
    return int((now - d).total_seconds() // 86400)


@expr_function("date:SECONDS_TO_DAYS")
@elementwise
def _d_seconds_to_days(s):
    return None if s is None else int(s) // 86400


@expr_function("date:SECONDS_TO_HOURS")
@elementwise
def _d_seconds_to_hours(s):
    return None if s is None else int(s) // 3600


@expr_function("date:SECONDS_TO_MINUTES")
@elementwise
def _d_seconds_to_minutes(s):
    return None if s is None else int(s) // 60


@expr_function("date:SECONDS_TO_WEEKS")
@elementwise
def _d_seconds_to_weeks(s):
    return None if s is None else int(s) // 604800


@expr_function("date:isDate")
@elementwise
def _d_isdate(v):
    if not isinstance(v, str):
        return False
    try:
        _dt.datetime.fromisoformat(v)
        return True
    except ValueError:
        return False


@expr_function("date:isTime", "isTime")
@elementwise
def _d_istime(v):
    if not isinstance(v, str):
        return False
    try:
        _dt.time.fromisoformat(v)
        return True
    except ValueError:
        return False


# ---------------------------------------------------------------------------
# geo: (reference functions/GeoFences.java — winding-number point-in-polygon
# over GeoJSON FeatureCollection strings)
# ---------------------------------------------------------------------------

def _wn_inside(lat, lon, ring):
    """Winding number over one polygon ring ([[lon, lat], ...]) — the exact
    algorithm of GeoFences.isPointInside (reference GeoFences.java:90-117)."""
    wn = 0
    for i in range(len(ring) - 1):
        lat0, lon0 = ring[i][1], ring[i][0]
        lat1, lon1 = ring[i + 1][1], ring[i + 1][0]
        is_left = (lon1 - lon0) * (lat - lat0) - (lon - lon0) * (lat1 - lat0)
        if lat0 <= lat:
            if lat1 > lat and is_left > 0.0:
                wn += 1
        elif lat1 <= lat and is_left < 0.0:
            wn -= 1
    return wn != 0


@expr_function("geo:InFence", "geo:inFence")
@elementwise
def _geo_infence(latitude, longitude, geofences):
    if latitude is None or longitude is None or geofences is None:
        return False
    try:
        fc = _json.loads(geofences) if isinstance(geofences, str) else geofences
    except ValueError as e:
        raise ValueError(f"String {geofences!r} is not a valid Json string") from e
    feats = fc.get("features", [fc] if fc.get("geometry") else [])
    inzone = False
    for feat in feats:
        geom = feat.get("geometry", feat)
        if geom.get("type") != "Polygon":
            continue
        rings = geom.get("coordinates") or []
        if rings:
            inzone = inzone or _wn_inside(float(latitude), float(longitude), rings[0])
    return inzone


# ---------------------------------------------------------------------------
# ddl: (reference functions/DDL.java — schema manipulation. The reference
# operates on CDAP Schema/StructuredRecord objects; this engine's analog is
# Avro-style JSON schemas (dict or JSON string), which is what parse-as-avro
# registers. select/drop address fields by dotted path.)
# ---------------------------------------------------------------------------

def _ddl_schema(v):
    if isinstance(v, str):
        return _json.loads(v)
    return v


def _ddl_fields(schema):
    if isinstance(schema, dict) and schema.get("type") == "record":
        return schema.get("fields", [])
    return []


@expr_function("ddl:parse")
@elementwise
def _ddl_parse(v):
    s = _ddl_schema(v)
    if not isinstance(s, dict) or "type" not in s:
        raise ValueError("ddl:parse expects an Avro-style JSON schema")
    return s


@expr_function("ddl:parsesql")
@elementwise
def _ddl_parsesql(sql):
    """SELECT-list → record schema (reference DDL.parsesql builds a Schema
    from a SQL projection). Columns default to nullable string; 'col type'
    pairs map int/long/float/double/boolean/bytes/string."""
    if sql is None:
        return None
    m = _re.search(r"select\s+(.*?)\s+from\s", sql, _re.IGNORECASE | _re.DOTALL)
    cols = (m.group(1) if m else sql).split(",")
    fields = []
    for c in cols:
        parts = c.strip().split()
        if not parts:
            continue
        name = parts[-1] if len(parts) > 1 and parts[-2].lower() == "as" else parts[0]
        typ = (parts[1].lower() if len(parts) == 2 else "string")
        if typ not in ("int", "long", "float", "double", "boolean", "bytes", "string"):
            typ = "string"
        fields.append({"name": name.strip('"`'), "type": ["null", typ]})
    return {"type": "record", "name": "sql", "fields": fields}


@expr_function("ddl:toJson")
@elementwise
def _ddl_tojson(v):
    return _json.dumps(_ddl_schema(v), sort_keys=True)


@expr_function("ddl:hasField")
@elementwise
def _ddl_hasfield(schema, name):
    s = _ddl_schema(schema)
    return any(f.get("name") == name for f in _ddl_fields(s))


def _ddl_drop_one(schema, path):
    s = dict(_ddl_schema(schema))
    head, _, rest = path.partition(".")
    fields = []
    for f in _ddl_fields(s):
        if f.get("name") != head:
            fields.append(f)
        elif rest:
            sub = f.get("type")
            if isinstance(sub, dict) and sub.get("type") == "record":
                fields.append(dict(f, type=_ddl_drop_one(sub, rest)))
        # else: drop the field entirely
    s["fields"] = fields
    return s


@expr_function("ddl:drop")
@elementwise
def _ddl_drop(schema, *paths):
    s = _ddl_schema(schema)
    for p in paths:
        s = _ddl_drop_one(s, p)
    return s


@expr_function("ddl:select")
@elementwise
def _ddl_select(schema, path):
    s = _ddl_schema(schema)
    head, _, rest = path.partition(".")
    for f in _ddl_fields(s):
        if f.get("name") == head:
            t = f.get("type")
            if isinstance(t, list):  # nullable union → inner type
                t = next((x for x in t if x != "null"), t)
            if rest:
                if isinstance(t, dict) and t.get("type") == "record":
                    return _ddl_select.__wrapped__(t, rest)
                raise ValueError(f"path '{path}': '{head}' is not a record")
            return t
    raise ValueError(f"field '{head}' not present in schema")


# ---------------------------------------------------------------------------
# string: Apache-commons StringUtils additions (the reference binds the whole
# class; these are the methods recipes actually use)
# ---------------------------------------------------------------------------

@expr_function("string:capitalize")
@elementwise
def _su_capitalize(v):
    return None if v is None else (v[:1].upper() + v[1:] if v else v)


@expr_function("string:uncapitalize")
@elementwise
def _su_uncapitalize(v):
    return None if v is None else (v[:1].lower() + v[1:] if v else v)


@expr_function("string:swapCase")
@elementwise
def _su_swapcase(v):
    return None if v is None else v.swapcase()


@expr_function("string:reverse")
@elementwise
def _su_reverse(v):
    return None if v is None else v[::-1]


@expr_function("string:abbreviate")
@elementwise
def _su_abbreviate(v, n):
    if v is None:
        return None
    n = int(n)
    return v if len(v) <= n else v[: max(n - 3, 1)] + "..."


@expr_function("string:isAlpha")
@elementwise
def _su_isalpha(v):
    return v is not None and v != "" and v.isalpha()


@expr_function("string:isNumeric")
@elementwise
def _su_isnumeric(v):
    return v is not None and v != "" and v.isdigit()


@expr_function("string:isAlphanumeric")
@elementwise
def _su_isalnum(v):
    return v is not None and v != "" and v.isalnum()


@expr_function("string:isBlank")
@elementwise
def _su_isblank(v):
    return v is None or v.strip() == ""


@expr_function("string:left")
@elementwise
def _su_left(v, n):
    return None if v is None else v[: max(int(n), 0)]


@expr_function("string:right")
@elementwise
def _su_right(v, n):
    n = max(int(n), 0)
    return None if v is None else (v[-n:] if n else "")


@expr_function("string:mid")
@elementwise
def _su_mid(v, pos, n):
    if v is None:
        return None
    pos, n = int(pos), int(n)
    if pos < 0:
        pos = 0
    return v[pos : pos + max(n, 0)]


@expr_function("string:leftPad")
@elementwise
def _su_leftpad(v, n, c=" "):
    return None if v is None else v.rjust(int(n), str(c)[0] if c else " ")


@expr_function("string:rightPad")
@elementwise
def _su_rightpad(v, n, c=" "):
    return None if v is None else v.ljust(int(n), str(c)[0] if c else " ")


@expr_function("string:chomp")
@elementwise
def _su_chomp(v):
    if v is None:
        return None
    if v.endswith("\r\n"):
        return v[:-2]
    if v.endswith(("\n", "\r")):
        return v[:-1]
    return v


@expr_function("string:chop")
@elementwise
def _su_chop(v):
    if v is None:
        return None
    if v.endswith("\r\n"):
        return v[:-2]
    return v[:-1] if v else v


@expr_function("string:countMatches")
@elementwise
def _su_countmatches(v, sub):
    if v is None or not sub:
        return 0
    return v.count(sub)


@expr_function("string:deleteWhitespace")
@elementwise
def _su_deletewhitespace(v):
    return None if v is None else "".join(v.split())


# ---------------------------------------------------------------------------
# number: (reference functions/NumberFunctions.java)
# ---------------------------------------------------------------------------

@expr_function("number:AsDouble")
@elementwise
def _n_asdouble(v):
    return None if v is None else float(v)


@expr_function("number:AsFloat")
@elementwise
def _n_asfloat(v):
    return None if v is None else float(np.float32(v))


@expr_function("number:AsInteger")
@elementwise
def _n_asinteger(v):
    return None if v is None else int(v)


@expr_function("number:Mantissa")
@elementwise
def _n_mantissa(v):
    # fractional part (mathworld mantissa); integers → 0.0, null → 0.0
    if v is None:
        return 0.0
    from decimal import Decimal

    d = Decimal(str(v))
    return float(d - int(d))


# ---------------------------------------------------------------------------
# decimal: (reference utils/DecimalTransform.java — BigDecimal helpers)
# ---------------------------------------------------------------------------

def _dec(v):
    from decimal import Decimal

    if v is None:
        return None
    return v if hasattr(v, "as_tuple") else Decimal(str(v))


@expr_function("decimal:add")
@elementwise
def _dec_add(a, b):
    a, b = _dec(a), _dec(b)
    return None if a is None or b is None else a + b


@expr_function("decimal:subtract")
@elementwise
def _dec_subtract(a, b):
    a, b = _dec(a), _dec(b)
    return None if a is None or b is None else a - b


@expr_function("decimal:multiply")
@elementwise
def _dec_multiply(a, b):
    a, b = _dec(a), _dec(b)
    return None if a is None or b is None else a * b


@expr_function("decimal:divideq")
@elementwise
def _dec_divideq(a, b):
    a, b = _dec(a), _dec(b)
    if a is None or b is None or b == 0:
        return None
    return a / b


@expr_function("decimal:divider")
@elementwise
def _dec_divider(a, b):
    a, b = _dec(a), _dec(b)
    if a is None or b is None or b == 0:
        return None
    # Decimal // truncates toward zero, so this is BigDecimal.remainder
    # (sign follows the dividend)
    return a - (a // b) * b


@expr_function("decimal:abs")
@elementwise
def _dec_abs(v):
    d = _dec(v)
    return None if d is None else abs(d)


@expr_function("decimal:precision")
@elementwise
def _dec_precision(v):
    d = _dec(v)
    return None if d is None else len(d.as_tuple().digits)


@expr_function("decimal:scale")
@elementwise
def _dec_scale(v):
    d = _dec(v)
    return None if d is None else max(0, -d.as_tuple().exponent)


@expr_function("decimal:unscaled")
@elementwise
def _dec_unscaled(v):
    d = _dec(v)
    if d is None:
        return None
    t = d.as_tuple()
    return (-1 if t.sign else 1) * int("".join(map(str, t.digits)) or "0")


@expr_function("decimal:decimal_left")
@elementwise
def _dec_left(v, n):
    d = _dec(v)
    return None if d is None else d.scaleb(-int(n))


@expr_function("decimal:decimal_right")
@elementwise
def _dec_right(v, n):
    d = _dec(v)
    return None if d is None else d.scaleb(int(n))


@expr_function("decimal:pow")
@elementwise
def _dec_pow(v, p):
    d = _dec(v)
    return None if d is None else d ** int(p)


@expr_function("decimal:negate")
@elementwise
def _dec_negate(v):
    d = _dec(v)
    return None if d is None else -d


@expr_function("decimal:strip_zero")
@elementwise
def _dec_strip_zero(v):
    d = _dec(v)
    return None if d is None else d.normalize()


@expr_function("decimal:sign")
@elementwise
def _dec_sign(v):
    d = _dec(v)
    return None if d is None else (0 if d == 0 else (1 if d > 0 else -1))


# ---------------------------------------------------------------------------
# arithmetic: (reference utils/ArithmeticOperations.java — null-propagating
# variadic numeric ops)
# ---------------------------------------------------------------------------

@expr_function("arithmetic:add")
@elementwise
def _ar_add(*nums):
    if any(n is None for n in nums):
        return None
    return sum(nums)


@expr_function("arithmetic:minus")
@elementwise
def _ar_minus(x, y):
    return None if x is None or y is None else x - y


@expr_function("arithmetic:multiply")
@elementwise
def _ar_multiply(*nums):
    if any(n is None for n in nums):
        return None
    out = 1
    for n in nums:
        out *= n
    return out


@expr_function("arithmetic:divideq")
@elementwise
def _ar_divideq(x, y):
    if x is None or y is None or float(y) == 0:
        return None
    if isinstance(x, (int, np.integer)) and isinstance(y, (int, np.integer)):
        # Java integer division truncates toward zero; Python // floors
        q = abs(int(x)) // abs(int(y))
        return q if (x >= 0) == (y >= 0) else -q
    return x / y


@expr_function("arithmetic:divider")
@elementwise
def _ar_divider(x, y):
    if x is None or y is None or float(y) == 0:
        return None
    # Java remainder: sign follows the DIVIDEND (ArithmeticOperations
    # semantics, matching decimal:divider) — Python % follows the divisor
    if isinstance(x, (int, np.integer)) and isinstance(y, (int, np.integer)):
        return int(_math.fmod(int(x), int(y)))
    return _math.fmod(x, y)


@expr_function("arithmetic:lcm")
@elementwise
def _ar_lcm(x, y):
    if x is None or y is None:
        return None
    ix, iy = int(x), int(y)
    if ix == x and iy == y:
        return _math.lcm(abs(ix), abs(iy))
    from decimal import Decimal

    dx, dy = Decimal(str(x)), Decimal(str(y))
    scale = max(-dx.as_tuple().exponent, -dy.as_tuple().exponent, 0)
    p = 10 ** scale
    v1, v2 = int(dx * p), int(dy * p)
    return float(Decimal(_math.lcm(abs(v1), abs(v2))) / p)


@expr_function("arithmetic:equal")
@elementwise
def _ar_equal(*nums):
    if any(n is None for n in nums):
        return None
    return all(n == nums[0] for n in nums)


@expr_function("arithmetic:max")
@elementwise
def _ar_max(*nums):
    if any(n is None for n in nums):
        return None
    return max(nums)


@expr_function("arithmetic:min")
@elementwise
def _ar_min(*nums):
    if any(n is None for n in nums):
        return None
    return min(nums)


@expr_function("arithmetic:average")
@elementwise
def _ar_average(*nums):
    if any(n is None for n in nums):
        return None
    return sum(nums) / len(nums)


# ---------------------------------------------------------------------------
# escape: (reference registers org.apache.commons StringEscapeUtils)
# ---------------------------------------------------------------------------

@expr_function("escape:escapeHtml", "escape:escapeHtml4")
@elementwise
def _esc_html(v):
    import html as _html

    return None if v is None else _html.escape(v, quote=True)


@expr_function("escape:unescapeHtml", "escape:unescapeHtml4")
@elementwise
def _unesc_html(v):
    import html as _html

    return None if v is None else _html.unescape(v)


@expr_function("escape:escapeXml", "escape:escapeXml11")
@elementwise
def _esc_xml(v):
    from xml.sax.saxutils import escape as _xe

    return None if v is None else _xe(v, {'"': "&quot;", "'": "&apos;"})


@expr_function("escape:unescapeXml")
@elementwise
def _unesc_xml(v):
    from xml.sax.saxutils import unescape as _xu

    return None if v is None else _xu(v, {"&quot;": '"', "&apos;": "'"})


@expr_function("escape:escapeJava")
@elementwise
def _esc_java(v):
    if v is None:
        return None
    return v.encode("unicode_escape").decode("ascii").replace('"', '\\"')


@expr_function("escape:unescapeJava")
@elementwise
def _unesc_java(v):
    if v is None:
        return None
    return v.encode("ascii", "backslashreplace").decode("unicode_escape")


@expr_function("escape:escapeCsv")
@elementwise
def _esc_csv(v):
    if v is None:
        return None
    if any(c in v for c in ",\"\n\r"):
        return '"' + v.replace('"', '""') + '"'
    return v


@expr_function("escape:unescapeCsv")
@elementwise
def _unesc_csv(v):
    if v is None:
        return None
    if len(v) >= 2 and v.startswith('"') and v.endswith('"'):
        return v[1:-1].replace('""', '"')
    return v


# ---------------------------------------------------------------------------
# strings: (reference registers com.google.common.base.Strings)
# ---------------------------------------------------------------------------

@expr_function("strings:isNullOrEmpty")
@elementwise
def _gs_isnullorempty(v):
    return v is None or v == ""


@expr_function("strings:nullToEmpty")
@elementwise
def _gs_nulltoempty(v):
    return "" if v is None else v


@expr_function("strings:emptyToNull")
@elementwise
def _gs_emptytonull(v):
    return None if v == "" or v is None else v


@expr_function("strings:repeat")
@elementwise
def _gs_repeat(v, n):
    return None if v is None else v * int(n)


@expr_function("strings:padStart")
@elementwise
def _gs_padstart(v, n, c):
    return None if v is None else v.rjust(int(n), str(c)[0])


@expr_function("strings:padEnd")
@elementwise
def _gs_padend(v, n, c):
    return None if v is None else v.ljust(int(n), str(c)[0])


@expr_function("strings:commonPrefix")
@elementwise
def _gs_commonprefix(a, b):
    if a is None or b is None:
        return None
    i = 0
    while i < min(len(a), len(b)) and a[i] == b[i]:
        i += 1
    return a[:i]


@expr_function("strings:commonSuffix")
@elementwise
def _gs_commonsuffix(a, b):
    if a is None or b is None:
        return None
    i = 0
    while i < min(len(a), len(b)) and a[len(a) - 1 - i] == b[len(b) - 1 - i]:
        i += 1
    return a[len(a) - i:]


# ---------------------------------------------------------------------------
# bytes: (reference registers io.cdap.wrangler.utils.Bytes)
# ---------------------------------------------------------------------------

@expr_function("bytes:toString")
@elementwise
def _by_tostring(v):
    if v is None:
        return None
    return v.decode("utf-8", "replace") if isinstance(v, (bytes, bytearray)) else str(v)


@expr_function("bytes:toBytes")
@elementwise
def _by_tobytes(v):
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, bool):
        return bytes([1 if v else 0])
    if isinstance(v, int):
        return v.to_bytes(8, "big", signed=True)
    if isinstance(v, float):
        import struct as _struct

        return _struct.pack(">d", v)
    return str(v).encode("utf-8")


@expr_function("bytes:toHexString")
@elementwise
def _by_tohex(v):
    if v is None:
        return None
    b = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
    return bytes(b).hex()


@expr_function("bytes:fromHexString")
@elementwise
def _by_fromhex(v):
    return None if v is None else bytes.fromhex(v)


@expr_function("bytes:toInt")
@elementwise
def _by_toint(v):
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return int.from_bytes(v[:4], "big", signed=True)
    return int(v)


@expr_function("bytes:toLong")
@elementwise
def _by_tolong(v):
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return int.from_bytes(v[:8], "big", signed=True)
    return int(v)


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


@expr_function("json:select")
@elementwise
def _j_select_lower(v, *paths):
    # lowercase `select(json, path...)` variant: dotted paths without the
    # JsonPath `$` prefix (reference JsonFunctions.select:61-93)
    if v is None:
        return None
    obj = _json.loads(v) if isinstance(v, str) else v
    outs = []
    for p in paths:
        cur = obj
        for part in str(p).split("."):
            try:
                cur = cur[int(part)] if isinstance(cur, list) else cur[part]
            except (KeyError, IndexError, TypeError, ValueError):
                cur = None
                break
        outs.append(cur)
    return outs[0] if len(outs) == 1 else outs


@expr_function("json:drop")
@elementwise
def _j_drop(v, *fields):
    if v is None:
        return None
    obj = _json.loads(v) if isinstance(v, str) else v
    if isinstance(obj, dict):
        return {k: x for k, x in obj.items() if k not in fields}
    return obj


@expr_function("json:keysToLower")
@elementwise
def _j_keystolower(v):
    if v is None:
        return None

    def low(o):
        if isinstance(o, dict):
            return {str(k).lower(): low(x) for k, x in o.items()}
        if isinstance(o, list):
            return [low(x) for x in o]
        return o

    return low(_json.loads(v) if isinstance(v, str) else v)


@expr_function("json:join")
@elementwise
def _j_join(v, sep):
    if v is None:
        return None
    obj = _json.loads(v) if isinstance(v, str) else v
    if not isinstance(obj, (list, tuple, np.ndarray)):
        return None
    return str(sep).join(str(x) for x in obj)


@expr_function("json:IsNull")
@elementwise
def _j_isnull(v):
    if v is None:
        return True
    obj = _json.loads(v) if isinstance(v, str) else v
    return obj is None


@expr_function("json:IsObject")
@elementwise
def _j_isobject(v):
    if v is None:
        return False
    obj = _json.loads(v) if isinstance(v, str) else v
    return isinstance(obj, dict)


@expr_function("json:IsArray")
@elementwise
def _j_isarray(v):
    if v is None:
        return False
    obj = _json.loads(v) if isinstance(v, str) else v
    return isinstance(obj, (list, tuple, np.ndarray))


# ---------------------------------------------------------------------------
# dq: data-quality checks (reference functions/DataQuality.java + Types.java)
# ---------------------------------------------------------------------------

_EMAIL_RE = _re.compile(r"^[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}$")
_URL_RE = _re.compile(r"^(https?|ftp)://[^\s/$.?#].[^\s]*$", _re.I)
_IPV4_RE = _re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
_DOMAIN_RE = _re.compile(r"^(?!-)[A-Za-z0-9\-]{1,63}(?<!-)(\.[A-Za-z]{2,})+$")


@expr_function("logical:BitCompress", "BitCompress")
@elementwise
def _l_bitcompress(v):
    return None if v is None else int(str(v), 2)


@expr_function("logical:BitExpand", "BitExpand")
@elementwise
def _l_bitexpand(v):
    return None if v is None else bin(int(v) & ((1 << 64) - 1))[2:]


# card-brand prefixes per the reference's commons-validator usage
_CARD_RES = {
    "visa": _re.compile(r"^4\d{12}(\d{3})?(\d{3})?$"),
    "master": _re.compile(r"^(5[1-5]\d{14}|2(2[2-9]\d{12}|[3-6]\d{13}|7[01]\d{12}|720\d{12}))$"),
    "amex": _re.compile(r"^3[47]\d{13}$"),
    "diner": _re.compile(r"^30[0-5]\d{11}|^3095\d{10}|^36\d{12}|^3[89]\d{12}$"),
    "discover": _re.compile(r"^(6011|65\d{2}|64[4-9]\d)\d{12}$"),
    "vpay": _re.compile(r"^4\d{12,18}$"),
}


def _luhn_ok(s: str) -> bool:
    digits = [int(c) for c in s if c.isdigit()]
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


def _card_check(v, brand):
    if not v:
        return False
    s = _re.sub(r"[\s-]", "", str(v))
    return bool(_CARD_RES[brand].match(s)) and _luhn_ok(s)


@expr_function("dq:isVisa")
@elementwise
def _dq_isvisa(v):
    return _card_check(v, "visa")


@expr_function("dq:isMaster")
@elementwise
def _dq_ismaster(v):
    return _card_check(v, "master")


@expr_function("dq:isAmex")
@elementwise
def _dq_isamex(v):
    return _card_check(v, "amex")


@expr_function("dq:isDiner")
@elementwise
def _dq_isdiner(v):
    return _card_check(v, "diner")


@expr_function("dq:isDiscover")
@elementwise
def _dq_isdiscover(v):
    return _card_check(v, "discover")


@expr_function("dq:isVPay")
@elementwise
def _dq_isvpay(v):
    return _card_check(v, "vpay")


def _isbn10_ok(s: str) -> bool:
    if len(s) != 10:
        return False
    total = 0
    for i, c in enumerate(s):
        if c in "Xx":
            if i != 9:
                return False
            d = 10
        elif c.isdigit():
            d = int(c)
        else:
            return False
        total += (10 - i) * d
    return total % 11 == 0


def _isbn13_ok(s: str) -> bool:
    if len(s) != 13 or not s.isdigit():
        return False
    total = sum(int(c) * (1 if i % 2 == 0 else 3) for i, c in enumerate(s))
    return total % 10 == 0


@expr_function("dq:isISBN10")
@elementwise
def _dq_isbn10(v):
    if not v:
        return False
    return _isbn10_ok(_re.sub(r"[\s-]", "", str(v)))


@expr_function("dq:isISBN13")
@elementwise
def _dq_isbn13(v):
    if not v:
        return False
    return _isbn13_ok(_re.sub(r"[\s-]", "", str(v)))


_GENERIC_TLDS = {"com", "org", "net", "info", "biz", "name", "pro", "edu",
                 "gov", "int", "mil", "io", "dev", "app", "xyz"}
_COUNTRY_TLDS = {"us", "uk", "de", "fr", "es", "it", "nl", "jp", "cn", "in",
                 "br", "ru", "ca", "au", "ch", "se", "no", "fi", "dk", "ie",
                 "at", "be", "pl", "pt", "gr", "cz", "kr", "mx", "za", "nz"}


@expr_function("dq:isGenericTld")
@elementwise
def _dq_generic_tld(v):
    return bool(v) and str(v).lstrip(".").lower() in _GENERIC_TLDS


@expr_function("dq:isCountryTld")
@elementwise
def _dq_country_tld(v):
    return bool(v) and str(v).lstrip(".").lower() in _COUNTRY_TLDS


@expr_function("dq:isDomainTld")
@elementwise
def _dq_domain_tld(v):
    s = str(v).lstrip(".").lower() if v else ""
    return bool(s) and (s in _GENERIC_TLDS or s in _COUNTRY_TLDS)


@expr_function("dq:isnull")
@elementwise
def _dq_isnull_lower(v):
    return v is None


@expr_function("dq:isempty")
@elementwise
def _dq_isempty_lower(v):
    return v is not None and v == ""


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


@expr_function("dq:isDate", "isDate")
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


@expr_function("dq:isNumber", "dq:isNumeric", "isNumber", "isDouble")
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


@expr_function("dq:isInteger", "isInteger")
@elementwise
def _dq_isint(v):
    if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
        return True
    try:
        int(str(v))
        return True
    except (TypeError, ValueError):
        return False


@expr_function("dq:isBoolean", "isBoolean")
@elementwise
def _dq_isbool(v):
    return isinstance(v, (bool, np.bool_)) or str(v).lower() in ("true", "false")


@expr_function("dq:isEmpty", "isEmpty")
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

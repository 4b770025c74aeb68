"""Typed capture conversion (reference grok/api/Converter.java).

Single source of truth for `;type;format` conversion semantics, shared by the
single-row oracle and the vectorized parse stage:

- strict Java parse rules (``Integer.parseInt`` etc.): any failure yields the
  EMPTY STRING, not null (Converter.java:58-59),
- ``boolean`` never fails: ``Boolean.parseBoolean`` == case-insensitive
  equality with "true",
- ``float`` produces a float32 (``np.float32``) so Gson serialization matches
  ``Float.toString``; ``double`` a float64,
- ``date``/``datetime`` parse with SimpleDateFormat semantics → epoch millis
  (int). Timezone: the reference uses the JVM default; this engine PINS UTC
  (documented deviation — both oracle and Spark path use UTC),
- ``json`` parses with Gson number semantics (ALL numbers → float64) and
  returns a dict, optionally hoisting named sub-keys (Converter.java:246-269).
"""

from __future__ import annotations

import datetime as _dt
import json
import re
from typing import Any

import numpy as np

_INT_RE = re.compile(r"^[+-]?[0-9]+$")
# Java Float/Double.parseDouble: optional sign, decimal or hex, optional f/F/d/D
# suffix, leading/trailing whitespace allowed. We support the decimal subset.
_FP_RE = re.compile(r"^[+-]?((\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|Infinity|NaN)[fFdD]?$")


class ConversionError(ValueError):
    pass


def _strict_int(value: str, lo: int, hi: int) -> int:
    if not _INT_RE.match(value):
        raise ConversionError(value)
    v = int(value)
    if v < lo or v > hi:
        raise ConversionError(value)
    return v


def conv_byte(value: str) -> int:
    return _strict_int(value, -128, 127)


def conv_short(value: str) -> int:
    return _strict_int(value, -(2 ** 15), 2 ** 15 - 1)


def conv_int(value: str) -> int:
    return _strict_int(value, -(2 ** 31), 2 ** 31 - 1)


def conv_long(value: str) -> int:
    return _strict_int(value, -(2 ** 63), 2 ** 63 - 1)


def conv_boolean(value: str) -> bool:
    # Boolean.parseBoolean never throws and does NOT trim
    return isinstance(value, str) and value.lower() == "true"


def _java_fp(value: str) -> float:
    s = value.strip()
    if not _FP_RE.match(s):
        raise ConversionError(value)
    if s and s[-1] in "fFdD" and not s[-1:].isdigit() and not s.endswith("NaN"):
        s = s[:-1]
    return float(s)


def conv_float(value: str) -> np.float32:
    return np.float32(_java_fp(value))


def conv_double(value: str) -> float:
    return _java_fp(value)


def conv_string(value: str) -> str:
    return value


# ---------------------------------------------------------------------------
# SimpleDateFormat subset → tolerant parser (prefix-match, lenient numerics)
# ---------------------------------------------------------------------------

# Supported SimpleDateFormat letters and their regex fragments. Numeric fields
# in SimpleDateFormat parsing are greedy-but-bounded; we bound by typical max
# widths which is faithful for all formats used by the reference and fixtures.
_SDF_TOKEN = re.compile(r"('(?:[^']|'')*')|(([a-zA-Z])\3*)")

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _sdf_to_regex(fmt: str) -> tuple[re.Pattern, list[str]]:
    parts: list[str] = []
    fields: list[str] = []
    pos = 0
    for m in _SDF_TOKEN.finditer(fmt):
        if m.start() > pos:
            parts.append(re.escape(fmt[pos:m.start()]))
        pos = m.end()
        if m.group(1) is not None:  # quoted literal
            lit = m.group(1)[1:-1].replace("''", "'")
            parts.append(re.escape(lit if lit else "'"))
            continue
        run = m.group(2)
        c, n = run[0], len(run)
        if c == "y":
            parts.append(r"(\d{1,4})" if n != 2 else r"(\d{2})")
            fields.append("year2" if n == 2 else "year")
        elif c == "Y":  # week year (resolves through the week date)
            parts.append(r"(\d{1,4})" if n != 2 else r"(\d{2})")
            fields.append("wyear2" if n == 2 else "wyear")
        elif c in ("M", "L"):  # L: standalone month — same symbols in ENGLISH
            if n >= 3:
                parts.append("(" + "|".join(_MONTHS) + r"[a-z]*)")
                fields.append("month_name")
            else:
                parts.append(r"(\d{1,2})")
                fields.append("month")
        elif c == "d":
            parts.append(r"(\d{1,2})")
            fields.append("day")
        elif c == "D":
            parts.append(r"(\d{1,3})")
            fields.append("doy")
        elif c == "w":
            parts.append(r"(\d{1,2})")
            fields.append("week")
        elif c == "W":
            parts.append(r"(\d{1,2})")
            fields.append("wom")
        elif c == "F":
            parts.append(r"(\d{1,2})")
            fields.append("dowim")
        elif c == "u":
            parts.append(r"(\d{1,2})")
            fields.append("downum")
        elif c == "G":
            parts.append(r"([AaBb][DdCc])")
            fields.append("era")
        elif c == "H":
            parts.append(r"(\d{1,2})")
            fields.append("hour")
        elif c == "h":
            parts.append(r"(\d{1,2})")
            fields.append("hour12")
        elif c == "k":
            parts.append(r"(\d{1,2})")
            fields.append("hour24")
        elif c == "K":
            parts.append(r"(\d{1,2})")
            fields.append("hour011")
        elif c == "m":
            parts.append(r"(\d{1,2})")
            fields.append("minute")
        elif c == "s":
            parts.append(r"(\d{1,2})")
            fields.append("second")
        elif c == "S":
            parts.append(r"(\d{1,3})")
            fields.append("millis")
        elif c == "a":
            parts.append(r"([AaPp][Mm])")
            fields.append("ampm")
        elif c == "E":  # NB: 'c' (java.time standalone weekday) is ILLEGAL in
            # SimpleDateFormat — it falls to the unsupported-letter branch,
            # matching Java's IllegalArgumentException (golden: ccc → null)
            parts.append(r"([A-Za-z]+)")
            fields.append("weekday")
        elif c == "X":
            # Java ISO-8601 zone: X=±hh only, XX=±hhmm, XXX=±hh:mm (a longer
            # input under X leaves the minutes as ignored prefix-match tail)
            if n == 1:
                parts.append(r"(Z|[+-]\d{2})")
            elif n == 2:
                parts.append(r"(Z|[+-]\d{4})")
            else:
                parts.append(r"(Z|[+-]\d{2}:\d{2})")
            fields.append("tz_iso")
        elif c in ("Z",):
            parts.append(r"([+-]\d{4})")
            fields.append("tz_rfc")
        elif c == "z":
            parts.append(r"([A-Za-z]{1,5}|GMT[+-]\d{1,2}:\d{2})")
            fields.append("tz_name")
        else:
            raise ConversionError(f"unsupported SimpleDateFormat letter {c!r} in {fmt!r}")
    if pos < len(fmt):
        parts.append(re.escape(fmt[pos:]))
    return re.compile("".join(parts)), fields


_SDF_CACHE: dict[str, tuple[re.Pattern, list[str]]] = {}

_UTC = _dt.timezone.utc

# GregorianCalendar(Locale.ENGLISH): firstDayOfWeek=SUNDAY,
# minimalDaysInFirstWeek=1 — week 1 is the (Sunday-started) week containing
# Jan 1; a late-December date whose week contains NEXT year's Jan 1 belongs
# to week 1 of the next year.
_WEEKDAYS = ["Sunday", "Monday", "Tuesday", "Wednesday",
             "Thursday", "Friday", "Saturday"]


def _week1_start(year: int) -> _dt.date:
    jan1 = _dt.date(year, 1, 1)
    return jan1 - _dt.timedelta(days=(jan1.weekday() + 1) % 7)


def _woy_us(d: _dt.date) -> int:
    """Java WEEK_OF_YEAR under the US/ENGLISH rules above (1 for dates whose
    Sunday-started week contains NEXT year's Jan 1)."""
    week_start = d - _dt.timedelta(days=(d.weekday() + 1) % 7)
    if week_start + _dt.timedelta(days=6) >= _dt.date(d.year + 1, 1, 1):
        return 1  # week rolls into (and therefore contains) next Jan 1
    return (week_start - _week1_start(d.year)).days // 7 + 1


def _dow_sun0(d: _dt.date) -> int:
    """Day-of-week with Sunday=0 (Calendar.DAY_OF_WEEK - 1)."""
    return (d.weekday() + 1) % 7


def _week_year(d: _dt.date) -> int:
    """Java getWeekYear(): the year owning d's (Sunday-started) week — next
    year when the week contains next Jan 1, else the calendar year (a week
    containing Jan 1 of d.year belongs to d.year: minimalDays=1)."""
    ws = d - _dt.timedelta(days=_dow_sun0(d))
    if ws + _dt.timedelta(days=6) >= _dt.date(d.year + 1, 1, 1):
        return d.year + 1
    return d.year


def _wom_us(d: _dt.date) -> int:
    """Java WEEK_OF_MONTH (US rules): week 1 is the Sunday-started week
    containing the 1st of the month."""
    first_off = _dow_sun0(d.replace(day=1))
    return (d.day + first_off - 1) // 7 + 1


def parse_sdf_epoch_ms(value: str, fmt: str) -> int:
    """``new SimpleDateFormat(fmt, ENGLISH).parse(value).getTime()`` in UTC.

    SimpleDateFormat.parse matches a PREFIX of the input (trailing garbage
    ignored) — reproduced via ``re.match`` (anchored at start, not at end).
    """
    if fmt not in _SDF_CACHE:
        _SDF_CACHE[fmt] = _sdf_to_regex(fmt)
    rx, fields = _SDF_CACHE[fmt]
    m = rx.match(value)
    if not m:
        raise ConversionError(f"unparseable date {value!r} for {fmt!r}")
    vals = dict(zip(fields, m.groups()))
    year, month, day = 1970, 1, 1
    hour = minute = second = millis = 0
    tz = _UTC
    pm = False
    h12 = h24 = h011 = doy = week = None
    wyear = wom = dowim = downum = None
    weekday = None
    era_bc = False
    have_month = have_day = False
    for f, v in vals.items():
        if v is None:
            continue
        if f == "year":
            year = int(v)
        elif f == "year2":
            y = int(v)  # SimpleDateFormat 2-digit years: 80y window ending +20y;
            year = 2000 + y if y < 70 else 1900 + y  # fixed pivot (deviation, documented)
        elif f == "wyear":
            wyear = int(v)
        elif f == "wyear2":
            y = int(v)
            wyear = 2000 + y if y < 70 else 1900 + y
        elif f == "month":
            month = int(v)
            have_month = True
        elif f == "month_name":
            month = _MONTHS.index(v[:3].title()) + 1
            have_month = True
        elif f == "day":
            day = int(v)
            have_day = True
        elif f == "doy":
            doy = int(v)
        elif f == "week":
            week = int(v)
        elif f == "wom":
            wom = int(v)
        elif f == "dowim":
            dowim = int(v)
        elif f == "downum":
            downum = int(v)
        elif f == "era":
            era_bc = v.upper() == "BC"
        elif f == "hour":
            hour = int(v)
        elif f == "hour12":
            h12 = int(v)
        elif f == "hour24":
            h24 = int(v)
        elif f == "hour011":
            h011 = int(v)
        elif f == "minute":
            minute = int(v)
        elif f == "second":
            second = int(v)
        elif f == "millis":
            millis = int(v)
        elif f == "ampm":
            pm = v.lower() == "pm"
        elif f == "weekday":
            weekday = v
        elif f == "tz_iso":
            if v != "Z":
                s = 1 if v[0] == "+" else -1
                hh = int(v[1:3])
                mm = int(v[3:].replace(":", "") or 0)
                tz = _dt.timezone(s * _dt.timedelta(hours=hh, minutes=mm))
        elif f == "tz_rfc":
            s = 1 if v[0] == "+" else -1
            tz = _dt.timezone(s * _dt.timedelta(hours=int(v[1:3]), minutes=int(v[3:5])))
        elif f == "tz_name":
            if v.upper() in ("UTC", "GMT", "Z"):
                tz = _UTC
            # other zone names unsupported → stay UTC (pinned-UTC deviation)
    # hour-field variants, strict (setLenient(false)) Java golden semantics
    # (scripts/GenSdfGolden.java → tests/data/sdf_golden.json):
    # h∈1..12; k∈1..24 with 24→00 SAME day; K∈0..11 (no 'a' field → AM)
    if h12 is not None:
        if not 1 <= h12 <= 12:
            raise ConversionError(f"hour12 {h12} out of 1..12")
        hour = (h12 % 12) + (12 if pm else 0)
    if h24 is not None:
        if not 1 <= h24 <= 24:
            raise ConversionError(f"hour24 {h24} out of 1..24")
        hour = h24 % 24
    if h011 is not None:
        if not 0 <= h011 <= 11:
            raise ConversionError(f"hour011 {h011} out of 0..11")
        hour = h011 + (12 if pm else 0)
    if era_bc:
        # BC + pre-1582 dates need Java's hybrid Julian/Gregorian calendar;
        # out of scope (documented deviation) — fail safely to ""
        raise ConversionError("BC era unsupported")
    # resolved day-of-week for week-based resolutions: explicit E/c text or
    # numeric u (1=Mon..7=Sun), defaulting to firstDayOfWeek (Sunday)
    dow_s0 = 0
    if weekday is not None:
        wl = weekday.lower()  # Java matchString: long or short form, ignore case
        idx = next((i for i, nm in enumerate(_WEEKDAYS)
                    if wl == nm.lower() or wl == nm[:3].lower()), None)
        if idx is None:
            raise ConversionError(f"unknown weekday {weekday!r}")
        dow_s0 = idx
    elif downum is not None:
        if not 1 <= downum <= 7:
            raise ConversionError(f"day number {downum} out of 1..7")
        dow_s0 = downum % 7  # 7=Sunday → 0
    # date resolution priority (GregorianCalendar DAY_OF_MONTH group):
    # MONTH+DAY > MONTH+WEEK_OF_MONTH+DOW > MONTH+DOW_IN_MONTH+DOW >
    # DAY_OF_YEAR > (WEEK_)YEAR+WEEK_OF_YEAR+DOW; strict mode re-validates
    # every parsed field against the resolved date
    if have_day:
        pass  # direct (year, month, day)
    elif have_month and wom is not None:
        first = _dt.date(year, month, 1)
        dd = 1 - _dow_sun0(first) + (wom - 1) * 7 + dow_s0
        base = None
        if dd >= 1:
            try:
                base = _dt.date(year, month, dd)
            except ValueError:
                base = None
        if base is None:
            raise ConversionError(
                f"week-of-month {wom} has no day {dow_s0} in {year}-{month}")
        day = dd
    elif have_month and dowim is not None:
        first = _dt.date(year, month, 1)
        dd = 1 + (dow_s0 - _dow_sun0(first)) % 7 + (dowim - 1) * 7
        try:
            _dt.date(year, month, dd)
        except ValueError:
            raise ConversionError(
                f"no {dowim}th weekday {dow_s0} in {year}-{month}")
        day = dd
    elif have_month:
        pass  # (year, month, 1)
    elif doy is not None:
        base = _dt.date(year, 1, 1) + _dt.timedelta(days=doy - 1)
        if doy < 1 or base.year != year:  # doy past Dec 31 → YEAR mismatch
            raise ConversionError(f"day-of-year {doy} invalid for {year}")
        month, day = base.month, base.day
    elif wyear is not None:
        wk = week if week is not None else 1
        base = _week1_start(wyear) + _dt.timedelta(days=(wk - 1) * 7 + dow_s0)
        woy = 1 if _week_year(base) == base.year + 1 else _woy_us(base)
        if _week_year(base) != wyear or woy != wk:
            raise ConversionError(f"week {wk} invalid for week-year {wyear}")
        year, month, day = base.year, base.month, base.day
    elif week is not None:
        base = _week1_start(year) + _dt.timedelta(days=(week - 1) * 7 + dow_s0)
        if base.year != year or _woy_us(base) != week:
            raise ConversionError(f"week {week} invalid for {year}")
        month, day = base.month, base.day
    try:
        dt = _dt.datetime(year, month, day, hour, minute, second,
                          millis * 1000, tzinfo=tz)
    except ValueError as e:  # lenient SimpleDateFormat would roll over; we reject
        raise ConversionError(str(e))
    # strict cross-field validation: every parsed calendar field must agree
    # with the resolved date (fields used in resolution pass by construction)
    d = dt.date()
    if doy is not None and d.timetuple().tm_yday != doy:
        raise ConversionError(f"day-of-year {doy} inconsistent with {d}")
    if week is not None:
        woy = (1 if _week_year(d) == d.year + 1 else _woy_us(d)) \
            if wyear is not None else _woy_us(d)
        if woy != week:
            raise ConversionError(f"week {week} inconsistent with {d}")
    if wyear is not None and _week_year(d) != wyear:
        raise ConversionError(f"week-year {wyear} inconsistent with {d}")
    if wom is not None and _wom_us(d) != wom:
        raise ConversionError(f"week-of-month {wom} inconsistent with {d}")
    if dowim is not None and (d.day - 1) // 7 + 1 != dowim:
        raise ConversionError(f"dow-in-month {dowim} inconsistent with {d}")
    if downum is not None and _dow_sun0(d) != downum % 7:
        raise ConversionError(f"day number {downum} inconsistent with {d}")
    if weekday is not None and dow_s0 != _dow_sun0(d):
        raise ConversionError(f"weekday {weekday!r} inconsistent with {d}")
    return int(dt.timestamp() * 1000)


# DateFormat.getDateTimeInstance(SHORT, SHORT, ENGLISH) == "M/d/yy h:mm a"
_DEFAULT_DATETIME_FMT = "M/d/yy h:mm a"


def conv_date(value: str, fmt: str | None = None) -> int:
    return parse_sdf_epoch_ms(value, fmt or _DEFAULT_DATETIME_FMT)


def _gson_loads(value: str) -> Any:
    # Gson fromJson(..., Map.class): every JSON number becomes a Double
    return json.loads(value, parse_int=float, parse_float=float,
                      parse_constant=float)


def conv_json(value: str, fmt: str | None = None) -> dict:
    m = _gson_loads(value)
    if not isinstance(m, dict):
        raise ConversionError(value)
    if fmt is None:
        return m
    # named sub-keys hoisted into the parent (Converter.java:246-269)
    sub: dict[str, dict] = {}
    for jk in re.split(r"[;:]", fmt):
        if jk not in m:
            continue
        obj = m[jk]
        if isinstance(obj, str):
            sub[jk] = _gson_loads(obj)
        elif isinstance(obj, dict):
            sub[jk] = obj
    for k, v in sub.items():
        m.pop(k, None)
        if isinstance(v, dict):
            m.update(v)
    return m


_CONVERTERS = {
    "byte": conv_byte,
    "boolean": conv_boolean,
    "short": conv_short,
    "int": conv_int,
    "long": conv_long,
    "float": conv_float,
    "double": conv_double,
    "string": conv_string,
    "date": conv_date,
    "datetime": conv_date,
    "json": conv_json,
}


def convert_value(typ: str | None, fmt: str | None, value: str) -> Any:
    """Converter.convert value path: returns the typed value, or "" on ANY
    failure (unknown type, parse error) — Converter.java:57-59."""
    if typ is None:
        return value
    fn = _CONVERTERS.get(typ)
    if fn is None:
        return ""
    try:
        if fmt is not None and typ in ("date", "datetime", "json"):
            return fn(value, fmt)  # type: ignore[call-arg]
        if fmt is not None and typ not in ("date", "datetime", "json"):
            # IConverter.convert(value, informat) default returns null for
            # scalar types (Converter.java IConverter:131-134) → Java would
            # store null... which Gson then drops. Mirror: return None.
            return None
        return fn(value)  # type: ignore[call-arg]
    except Exception:
        return ""


def clean_string(value: str) -> str:
    """Match.cleanString (Match.java:216-231): strip symmetric quotes."""
    if value is None or value == "":
        return value
    if len(value) == 1 and value in ("\"", "'"):
        return ""
    if (value[0] == '"' and value[-1] == '"') or (value[0] == "'" and value[-1] == "'"):
        return value[1:-1]
    return value

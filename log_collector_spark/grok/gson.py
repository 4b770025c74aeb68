"""Gson-compatible JSON serialization.

The reference serializes parsed records with ``new GsonBuilder().create()``
over a ``TreeMap`` (reference: grok/api/Match.java:36,63 and
reader/file/DefaultFileReader.java:160,278), which yields:

- keys in sorted (TreeMap/String.compareTo) order,
- compact separators (no spaces),
- map entries with null values OMITTED (Gson default serializeNulls=false);
  null elements INSIDE lists are kept as ``null``,
- HTML-safe string escaping (Gson JsonWriter default): ``< > & = '`` become
  ``\\u003c \\u003e \\u0026 \\u003d \\u0027``; plus standard ``\" \\\\ \\t \\b
  \\n \\r \\f``, other control chars as ``\\uXXXX``, and U+2028/U+2029 escaped,
- Java number formatting: Long/Integer as ``123``; Double via
  ``Double.toString`` (``1.0``, ``0.001``, ``1.0E7``, ``1.0E-4``); Float via
  ``Float.toString`` (float32 shortest round-trip).

This module reproduces those rules so per-turn text equality against the
reference holds byte-for-byte.
"""

from __future__ import annotations

import math
from typing import Any

try:  # np.float32 carries the "this was a ;float capture" tag through the kernel
    import numpy as _np

    _FLOAT32_TYPES = (_np.float32,)
    _NP_INT_TYPES = (_np.integer,)
    _NP_FLOAT_TYPES = (_np.floating,)
except Exception:  # pragma: no cover
    _np = None
    _FLOAT32_TYPES = ()
    _NP_INT_TYPES = ()
    _NP_FLOAT_TYPES = ()

# Gson JsonWriter REPLACEMENT_CHARS + HTML_SAFE_REPLACEMENT_CHARS.
_ESCAPES: dict[str, str] = {
    '"': '\\"',
    "\\": "\\\\",
    "\t": "\\t",
    "\b": "\\b",
    "\n": "\\n",
    "\r": "\\r",
    "\f": "\\f",
    "<": "\\u003c",
    ">": "\\u003e",
    "&": "\\u0026",
    "=": "\\u003d",
    "'": "\\u0027",
    "\u2028": "\\u2028",
    "\u2029": "\\u2029",
}
for _i in range(0x20):
    _ESCAPES.setdefault(chr(_i), "\\u%04x" % _i)

# Translation table: fast vectorizable single-pass escape.
GSON_ESCAPE_TABLE = str.maketrans(_ESCAPES)


def gson_escape(s: str) -> str:
    """Escape a string body per Gson's HTML-safe JsonWriter (no quotes added)."""
    return s.translate(GSON_ESCAPE_TABLE)


def _sci_digits(x: float) -> tuple[str, str, int]:
    """Shortest round-trip digits of abs(x): (sign, digits, decimal_exponent).

    digits has no leading/trailing zeros beyond significance; value is
    0.digits * 10**exp in the sense digits[0] is the leading significant digit
    and exp is such that x = d.igits * 10**exp.
    """
    r = repr(abs(x))  # shortest repr that round-trips, e.g. '1e+100', '0.001'
    sign = "-" if (x < 0 or (x == 0 and math.copysign(1, x) < 0)) else ""
    if "e" in r or "E" in r:
        mant, _, exp_s = r.partition("e")
        exp = int(exp_s)
    else:
        mant, exp = r, 0
    if "." in mant:
        int_part, _, frac = mant.partition(".")
    else:
        int_part, frac = mant, ""
    digits = (int_part + frac).lstrip("0")
    if not digits:
        return sign, "0", 0
    # decimal exponent of the leading digit
    lead = exp + (len(int_part.lstrip("0")) - 1 if int_part.lstrip("0") else -(
        len(frac) - len(frac.lstrip("0")) + 1))
    digits = digits.rstrip("0") or "0"
    return sign, digits, lead


def _java_fp_str(x: float) -> str:
    """Java Double.toString / Float.toString formatting given shortest digits.

    Plain decimal for 1e-3 <= |x| < 1e7, otherwise computerized scientific
    notation 'd.dddE±x' (exponent without '+' padding, per Java).
    """
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0:
        return "-0.0" if math.copysign(1, x) < 0 else "0.0"
    sign, digits, lead = _sci_digits(x)
    ax = abs(x)
    if 1e-3 <= ax < 1e7:
        # plain notation; at least one digit on each side of the point
        point = lead + 1  # number of digits before the decimal point
        if point <= 0:
            body = "0." + "0" * (-point) + digits
        elif point >= len(digits):
            body = digits + "0" * (point - len(digits)) + ".0"
        else:
            body = digits[:point] + "." + digits[point:]
        return sign + body
    mant = digits[0] + "." + (digits[1:] or "0")
    return f"{sign}{mant}E{lead}"


def java_double_str(x: float) -> str:
    """``Double.toString`` equivalent (shortest-round-trip float64)."""
    return _java_fp_str(float(x))


def java_float_str(x: Any) -> str:
    """``Float.toString`` equivalent: shortest round-trip of the float32 value."""
    if _np is None:  # pragma: no cover
        return _java_fp_str(float(x))
    f = _np.float32(x)
    if _np.isnan(f):
        return "NaN"
    if _np.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    # repr(np.float32) is the shortest string that round-trips the float32;
    # reuse the Java layout rules on its float64 reading (same shortest digits)
    v = float(repr(f))
    sign, digits, lead = _sci_digits(v)
    ax = abs(v)
    if 1e-3 <= ax < 1e7:
        point = lead + 1
        if point <= 0:
            body = "0." + "0" * (-point) + digits
        elif point >= len(digits):
            body = digits + "0" * (point - len(digits)) + ".0"
        else:
            body = digits[:point] + "." + digits[point:]
        return sign + body
    mant = digits[0] + "." + (digits[1:] or "0")
    return f"{sign}{mant}E{lead}"


def _value(v: Any, out: list[str]) -> None:
    if v is None:
        out.append("null")
    elif v is True:
        out.append("true")
    elif v is False:
        out.append("false")
    elif isinstance(v, str):
        out.append('"')
        out.append(gson_escape(v))
        out.append('"')
    elif isinstance(v, _FLOAT32_TYPES):
        out.append(java_float_str(v))
    elif isinstance(v, int) or (_NP_INT_TYPES and isinstance(v, _NP_INT_TYPES)):
        out.append(str(int(v)))
    elif isinstance(v, float) or (_NP_FLOAT_TYPES and isinstance(v, _NP_FLOAT_TYPES)):
        out.append(java_double_str(float(v)))
    elif isinstance(v, dict):
        _obj(v, out)
    elif isinstance(v, (list, tuple)):
        out.append("[")
        for i, e in enumerate(v):
            if i:
                out.append(",")
            _value(e, out)
        out.append("]")
    else:
        raise TypeError(f"gson_dumps: unsupported type {type(v)!r}")


def _obj(d: dict, out: list[str]) -> None:
    out.append("{")
    first = True
    # TreeMap iteration order == sorted keys (String.compareTo ~ codepoint sort)
    for k in sorted(d.keys()):
        v = d[k]
        if v is None:  # Gson omits null-valued map entries
            continue
        if not first:
            out.append(",")
        first = False
        out.append('"')
        out.append(gson_escape(str(k)))
        out.append('":')
        _value(v, out)
    out.append("}")


def gson_dumps(d: dict) -> str:
    """Serialize a parsed-record dict exactly as the reference's Gson would."""
    out: list[str] = []
    _obj(d, out)
    return "".join(out)

"""Gson-compatibility serialization tests (reference Match.java toJson +
DefaultFileReader gson.toJson; number formatting per Java Double/Float.toString)."""

import numpy as np

from log_collector_spark.grok.gson import (
    gson_dumps, gson_escape, java_double_str, java_float_str,
)


def test_java_double_formatting():
    # thresholds: plain for 1e-3 <= |x| < 1e7, else scientific (Double.toString)
    cases = {
        1.0: "1.0",
        -1.0: "-1.0",
        0.0: "0.0",
        0.1: "0.1",
        0.001: "0.001",
        0.0001: "1.0E-4",
        1234567.0: "1234567.0",
        9999999.0: "9999999.0",
        1e7: "1.0E7",
        12345678.0: "1.2345678E7",
        1.5e-5: "1.5E-5",
        100.0: "100.0",
        2.5: "2.5",
        1e100: "1.0E100",
        -0.001: "-0.001",
        3.14159: "3.14159",
    }
    for v, expected in cases.items():
        assert java_double_str(v) == expected, (v, java_double_str(v))


def test_java_float_formatting():
    assert java_float_str(np.float32(1.0)) == "1.0"
    assert java_float_str(np.float32(0.1)) == "0.1"
    assert java_float_str(np.float32(1.5)) == "1.5"
    assert java_float_str(np.float32(1e10)) == "1.0E10"


def test_sorted_keys_compact_and_null_skip():
    assert gson_dumps({"b": 1, "a": "x", "z": None}) == '{"a":"x","b":1}'
    # null inside a list is kept
    assert gson_dumps({"l": ["a", None, 2]}) == '{"l":["a",null,2]}'


def test_html_safe_escaping():
    assert gson_escape("a=b<c>'d'&e") == "a\\u003db\\u003cc\\u003e\\u0027d\\u0027\\u0026e"
    assert gson_dumps({"s": 'he said "hi"\n'}) == '{"s":"he said \\"hi\\"\\n"}'
    assert gson_dumps({"s": "back\\slash"}) == '{"s":"back\\\\slash"}'


def test_number_types():
    # longs plain, doubles with .0, booleans lowercase
    assert gson_dumps({"i": 42, "d": 42.0, "t": True, "f": False}) == \
        '{"d":42.0,"f":false,"i":42,"t":true}'
    # json-sourced numbers are Double: {"a":1} round-trips as 1.0
    assert gson_dumps({"m": {"a": 1.0}}) == '{"m":{"a":1.0}}'

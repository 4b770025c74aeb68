"""Differential tests: the vectorized batch parser must be byte-identical to
the single-row oracle (which encodes reference semantics) on every corpus."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from log_collector_spark.grok.compiler import GrokCompiler
from log_collector_spark.grok.gson import gson_dumps
from log_collector_spark.grok.oracle import parse_line
from log_collector_spark.grok.vectorized import VectorizedGrokParser, sdf_epoch_ms_vec

DEMO1_EXPR = (
    r"\[%{NOTSPACE:logtype}\] "
    r"\[%{CUSTOM_TIMESTAMP_ISO8601:logtime;date;yyyy-MM-dd HH:mm:ss}\] "
    r"%{JSON:json_base_request}"
)


@pytest.fixture(scope="module")
def compiler():
    return GrokCompiler()


def assert_matches_oracle(compiled, lines, provenance=None):
    vp = VectorizedGrokParser(compiled, provenance=provenance)
    out = vp.parse_batch(pd.Series(lines, dtype=object))
    for i, line in enumerate(lines):
        rec = parse_line(compiled, line) if line is not None else {}
        if not rec:
            assert not out["parse_ok"].iloc[i], f"row {i}: oracle fail, vec ok: {line!r}"
            assert out["parsed_json"].iloc[i] is None
        else:
            assert out["parse_ok"].iloc[i], f"row {i}: oracle ok, vec fail: {line!r}"
            if provenance:
                rec = {**rec}
                rec.update(provenance)
            expected = gson_dumps(rec)
            got = out["parsed_json"].iloc[i]
            assert got == expected, f"row {i}: {line!r}\n  vec:    {got}\n  oracle: {expected}"
    return out


def test_demo1_corpus(compiler):
    cg = compiler.compile(DEMO1_EXPR)
    lines = [
        '[elk] [2017-05-24 16:51:23] {"a":1,"b":"2"}',
        '[web] [2017-05-24 16:52:05] {"path":"/x?a=1&b=<t>","n":3}',
        "garbage line",
        "",
        "   ",
        None,
        '[api] [2017-05-24 23:59:59] {"k":"v"}',
        '[x] [2017-13-45 99:99:99] {"k":1}',  # bogus date → conversion behavior
        '[y] [2017-05-24 16:51:23] -',  # JSON pattern alt branch: '-'
        '[z] [2017-05-24 16:51:23] ',  # JSON pattern alt branch: empty
        '[quoted] [2017-05-24 16:51:23] {"s":"he said \\"hi\\""}',
        '[uni] [2017-05-24 16:51:23] {"j":"日本語=<&>"}',
    ]
    out = assert_matches_oracle(cg, lines, provenance={
        "directory": "dirA", "host": "10.0.0.1", "filename": "f.log"})
    # typed column sanity
    ms = int(dt.datetime(2017, 5, 24, 16, 51, 23,
                         tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert out["logtime"].iloc[0] == ms
    assert out["logtype"].iloc[0] == "elk"


def test_typed_corpus(compiler):
    cg = compiler.compile(
        "%{WORD:w} %{NUMBER:n;int} %{NUMBER:d;double} %{NUMBER:f;float} "
        "%{WORD:b;boolean} %{NOTSPACE:l;long}")
    lines = [
        "alpha 42 1.5 2.5 true 9999999999",
        "beta 99999999999 0.001 1e8 TRUE -5",  # int overflow → ""
        "gamma 7 1.0E7 .5 false 0",
        "delta 1 NaN 3 nottrue 9223372036854775807",
        "eps 2 4 5 X 9223372036854775808",  # long overflow → ""
    ]
    assert_matches_oracle(cg, lines)


def test_duplicate_and_optional_groups(compiler):
    cg = compiler.compile(r"%{WORD:w}( %{WORD:w})?( %{WORD:other})?")
    lines = ["foo bar baz", "foo bar", "foo", "foo !"]
    assert_matches_oracle(cg, lines)


def test_unwanted_and_lists(compiler):
    # IP pattern expands to UNWANTED subcaptures + duplicate-key collection
    cg = compiler.compile(r"%{IP:ip} %{QS:q}")
    lines = ['127.0.0.1 "hello world"', "10.1.2.3 'single'", "bad x"]
    assert_matches_oracle(cg, lines)


def test_commonapachelog_typed(compiler):
    cg = compiler.compile("%{COMMONAPACHELOG_DATATYPED}")
    lines = [
        '127.0.0.1 true frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /a.gif HTTP/1.0" 200 2326',
        '10.0.0.5 false - [24/May/2017:16:51:23 +0800] '
        '"POST /api HTTP/1.1" 500 -',
        "not a log",
    ]
    assert_matches_oracle(cg, lines)


def test_sdf_vectorized_matches_scalar():
    from log_collector_spark.grok.converters import parse_sdf_epoch_ms
    cases = [
        ("2017-05-24 16:51:23", "yyyy-MM-dd HH:mm:ss"),
        ("2017-05-24T16:51:23+08:00", "yyyy-MM-dd'T'HH:mm:ssXXX"),
        ("10/Oct/2000:13:55:36 -0700", "dd/MMM/yyyy:HH:mm:ss Z"),
        ("2020-02-29 00:00:00", "yyyy-MM-dd HH:mm:ss"),  # leap day
        ("1999-12-31 23:59:59", "yyyy-MM-dd HH:mm:ss"),
        ("2017-05-24 16:51:23.987", "yyyy-MM-dd HH:mm:ss.SSS"),
    ]
    for value, fmt in cases:
        ms, ok = sdf_epoch_ms_vec(pd.Series([value], dtype="string"), fmt)
        assert ok[0], (value, fmt)
        assert ms[0] == parse_sdf_epoch_ms(value, fmt), (value, fmt)
    # invalid cases
    for value, fmt in [("2019-02-29 00:00:00", "yyyy-MM-dd HH:mm:ss"),
                       ("garbage", "yyyy-MM-dd"),
                       ("2017-13-01 00:00:00", "yyyy-MM-dd HH:mm:ss")]:
        ms, ok = sdf_epoch_ms_vec(pd.Series([value], dtype="string"), fmt)
        assert not ok[0], (value, fmt)


def test_sdf_java_golden_file():
    """Both kernels vs the REAL java.text.SimpleDateFormat, case-by-case.

    tests/data/sdf_golden.json is generated by scripts/GenSdfGolden.java
    (Locale.ENGLISH, UTC, setLenient(false), epoch 2-digit-year pivot) and
    checked in so this test needs no JVM. Covers D/w/W/F/u/k/K/E/G/Y/L plus
    strict h bounds, X/XX/XXX zone widths, and the illegal java.time-only
    letter c → whole-parse failure (reference: grok/api/Converter.java's
    SimpleDateFormat usage accepts every legal SDF letter)."""
    import json
    from pathlib import Path
    from log_collector_spark.grok.converters import (
        ConversionError, parse_sdf_epoch_ms)
    cases = json.loads(
        (Path(__file__).parent / "data" / "sdf_golden.json").read_text())
    assert len(cases) >= 40
    by_fmt: dict[str, list] = {}
    for c in cases:
        by_fmt.setdefault(c["fmt"], []).append(c)
    for fmt, cs in by_fmt.items():
        # scalar kernel
        for c in cs:
            try:
                got = parse_sdf_epoch_ms(c["input"], fmt)
            except ConversionError:
                got = None
            assert got == c["epoch_ms"], (c, got)
        # vectorized kernel, one batch per format; an illegal pattern raises
        # at compile time (like Java's constructor IllegalArgumentException)
        # and parse_batch turns that into all-rows-fail → "" (vectorized.py)
        try:
            ms, ok = sdf_epoch_ms_vec(
                pd.Series([c["input"] for c in cs], dtype=object), fmt)
        except ConversionError:
            ms, ok = np.zeros(len(cs), "int64"), np.zeros(len(cs), bool)
        for c, m, o in zip(cs, ms, ok):
            got = int(m) if o else None
            assert got == c["epoch_ms"], (c, got)


def test_json_flatten_corpus(compiler):
    """``;json`` captures: one-level flatten with putAll-overwrite semantics,
    Gson Double numbers, nested objects/lists, failure → '' — byte-equal to
    the single-row oracle (the former per-row slow path is gone)."""
    cg = compiler.compile(
        r"\[%{NOTSPACE:logtype}\] "
        r"\[%{CUSTOM_TIMESTAMP_ISO8601:logtime;date;yyyy-MM-dd HH:mm:ss}\] "
        r"%{JSON:payload;json}")
    lines = [
        '[elk] [2017-05-24 16:51:23] {"u":42,"k":"v"}',
        '[web] [2017-05-24 16:52:05] {"nested":{"a":1},"arr":[1,"x",null],"b":true}',
        '[api] [2017-05-24 16:53:00] {"logtype":"overwritten","z":0.001}',  # putAll overwrite
        '[x] [2017-05-24 16:54:00] {"n":null,"s":"he said \\"hi\\""}',  # null entry omitted
        '[y] [2017-05-24 16:55:00] -',      # JSON alt branch → conversion failure → ""
        '[z] [2017-05-24 16:56:00] [1,2]',  # non-object JSON → failure → ""
        '[big] [2017-05-24 16:57:00] {"e":1e100,"tiny":1e-7,"html":"<a=b&c>"}',
        "garbage",
        "",
        None,
    ]
    assert_matches_oracle(cg, lines, provenance={
        "directory": "dirA", "host": "h", "filename": "f.log"})


def test_json_subkey_hoist_corpus(compiler):
    """fmt-parameterized json: named sub-keys hoisted into the parent
    (Converter.java:246-269), including string-encoded sub-objects."""
    cg = compiler.compile(r"%{JSON:payload;json;inner}")
    lines = [
        '{"inner":{"x":1,"y":"z"},"keep":true}',
        '{"inner":"{\\"x\\":2}","other":3}',
        '{"no_inner":1}',
        "not json at all {",
    ]
    assert_matches_oracle(cg, lines)


def test_large_batch_consistency(compiler):
    """Bulk randomized corpus: every row must equal the oracle."""
    rng = np.random.RandomState(7)
    cg = compiler.compile(DEMO1_EXPR)
    logtypes = ["elk", "web", "api", "svc-1"]
    lines = []
    for i in range(2000):
        r = rng.rand()
        if r < 0.02:
            lines.append("malformed " + str(i))
        elif r < 0.025:
            lines.append("")
        else:
            ts = 1495644683 + int(rng.randint(0, 100000))
            t = dt.datetime.fromtimestamp(ts, dt.timezone.utc).strftime(
                "%Y-%m-%d %H:%M:%S")
            payload = '{"a":%d,"b":"x%d"}' % (i, i)
            lines.append(f"[{logtypes[i % 4]}] [{t}] {payload}")
    out = assert_matches_oracle(cg, lines)
    assert out["parse_ok"].sum() > 1900

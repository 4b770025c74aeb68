"""Property-based kernel tests (hypothesis) — SURVEY §5 depth.

No Spark session: these hammer the pure-Python semantics kernel (the single
source of truth the vectorized path must match) and the vectorized batch
parser itself with generated inputs.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
from datetime import datetime, timezone

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.grok.compiler import GrokCompiler
from log_collector_spark.grok.converters import (
    ConversionError,
    conv_int,
    conv_long,
    parse_sdf_epoch_ms,
)
from log_collector_spark.grok.gson import (
    gson_dumps,
    gson_escape,
    java_double_str,
)
from log_collector_spark.grok import oracle as O
from log_collector_spark.grok.vectorized import VectorizedGrokParser

_JAVA_PLAIN = re.compile(r"^-?\d+\.\d+$")
_JAVA_SCI = re.compile(r"^-?\d\.\d+E-?\d+$")


@given(st.floats(allow_nan=False, allow_infinity=False))
@settings(max_examples=300)
def test_java_double_str_round_trips_and_matches_layout(x):
    s = java_double_str(x)
    assert float(s) == x or (x == 0 and float(s) == 0)
    ax = abs(x)
    if x == 0 or 1e-3 <= ax < 1e7:
        assert _JAVA_PLAIN.match(s), (x, s)
    else:
        assert _JAVA_SCI.match(s), (x, s)


@given(st.text(max_size=200))
@settings(max_examples=300)
def test_gson_escape_is_json_decodable_and_lossless(s):
    esc = gson_escape(s)
    assert json.loads('"' + esc + '"') == s
    # nothing dangerous survives unescaped
    assert not re.search(r'(?<!\\)"', esc.replace('\\\\', ""))
    assert not any(ord(c) < 0x20 for c in esc)


@given(st.dictionaries(st.text(min_size=1, max_size=20),
                       st.one_of(st.none(), st.booleans(),
                                 st.integers(-2**53, 2**53),
                                 st.text(max_size=50)),
                       max_size=8))
@settings(max_examples=200)
def test_gson_dumps_sorted_keys_null_omission(d):
    out = gson_dumps(d)
    back = json.loads(out)
    assert back == {k: v for k, v in d.items() if v is not None}
    keys = list(back.keys())
    assert keys == sorted(keys)


@given(st.integers(-2**70, 2**70))
@settings(max_examples=300)
def test_int_long_converters_match_java_ranges(i):
    s = str(i)
    if -(2**31) <= i <= 2**31 - 1:
        assert conv_int(s) == i
    else:
        try:
            conv_int(s)
            assert False, "expected range failure"
        except ConversionError:
            pass
    if -(2**63) <= i <= 2**63 - 1:
        assert conv_long(s) == i
    else:
        try:
            conv_long(s)
            assert False
        except ConversionError:
            pass


@given(st.datetimes(min_value=datetime(1900, 1, 1),
                    max_value=datetime(2100, 1, 1)))
@settings(max_examples=300)
def test_sdf_parse_matches_utc_epoch(dt):
    dt = dt.replace(microsecond=0)  # the format has second granularity
    s = dt.strftime("%Y-%m-%d %H:%M:%S")
    ms = parse_sdf_epoch_ms(s, "yyyy-MM-dd HH:mm:ss")
    expected = int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)
    assert ms == expected


@given(st.datetimes(min_value=datetime(1971, 1, 1),
                    max_value=datetime(2099, 12, 31)))
# deadline=None: each example runs 5 formats through the pandas/numpy
# vectorized kernel — under a fully-loaded suite (32 Spark workers) a single
# example can blow hypothesis's 200 ms wall deadline and flag a spurious
# Flaky/DeadlineExceeded (seen in the r3 full-suite run; passes in isolation)
@settings(max_examples=200, deadline=None)
def test_sdf_extended_letters_roundtrip(dt):
    """D (day-of-year), k (1-24), K (0-11 + am/pm), E (weekday) parse back to
    the generating instant, scalar == vectorized (strict Java semantics pinned
    by tests/data/sdf_golden.json)."""
    import pandas as pd
    from log_collector_spark.grok.vectorized import sdf_epoch_ms_vec
    d = dt.date()
    midnight = int(datetime(d.year, d.month, d.day,
                            tzinfo=timezone.utc).timestamp() * 1000)
    k = 24 if dt.hour == 0 else dt.hour          # k=24 is 00:xx SAME day
    kk = midnight + (dt.hour * 3600 + dt.minute * 60) * 1000
    cases = [
        (f"{d.year} {d.timetuple().tm_yday:03d}", "yyyy DDD", midnight),
        (f"{d:%Y-%m-%d} {k:02d}:{dt.minute:02d}", "yyyy-MM-dd kk:mm", kk),
        (f"{d:%Y-%m-%d} {dt.hour % 12:02d}:{dt.minute:02d} "
         f"{'PM' if dt.hour >= 12 else 'AM'}", "yyyy-MM-dd KK:mm a", kk),
        (f"{d:%A} {d:%Y-%m-%d}", "EEEE yyyy-MM-dd", midnight),
        (f"{d:%a} {d:%Y-%m-%d}", "EEE yyyy-MM-dd", midnight),
    ]
    for value, fmt, expected in cases:
        assert parse_sdf_epoch_ms(value, fmt) == expected, (value, fmt)
        ms, ok = sdf_epoch_ms_vec(pd.Series([value], dtype=object), fmt)
        assert ok[0] and ms[0] == expected, (value, fmt)
    # strict: the WRONG weekday for the same date must fail both kernels
    wrong = f"{'Mon' if d.strftime('%a') != 'Mon' else 'Tue'} {d:%Y-%m-%d}"
    try:
        parse_sdf_epoch_ms(wrong, "EEE yyyy-MM-dd")
        assert False, wrong
    except ConversionError:
        pass
    _, ok = sdf_epoch_ms_vec(pd.Series([wrong], dtype=object),
                             "EEE yyyy-MM-dd")
    assert not ok[0], wrong


_EXPR = (r"\[%{NOTSPACE:logtype}\] "
         r"\[%{CUSTOM_TIMESTAMP_ISO8601:logtime;date;yyyy-MM-dd HH:mm:ss}\] "
         r"%{JSON:payload}")
_COMPILED = GrokCompiler().compile(_EXPR)
_PARSER = VectorizedGrokParser(
    _COMPILED, provenance={"directory": "d", "host": "h", "filename": "f"})

_line = st.one_of(
    st.builds(lambda t, p: f"[{t}] [2023-11-15 00:{p:02d}:59] " +
              '{"x":' + str(p) + "}",
              st.text(alphabet="abcxyz", min_size=1, max_size=8),
              st.integers(0, 59)),
    st.text(max_size=60),  # arbitrary garbage
    st.just(""),
)


@given(st.lists(_line, min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_vectorized_batch_equals_single_row_oracle(lines):
    out = _PARSER.parse_batch(pd.Series(lines, dtype=object))
    for i, line in enumerate(lines):
        rec = O.parse_line(_COMPILED, line) if line and line.strip() else {}
        if rec:
            expected = gson_dumps(
                {**rec, "directory": "d", "host": "h", "filename": "f"})
            assert bool(out["parse_ok"].iloc[i])
            assert out["parsed_json"].iloc[i] == expected, (i, line)
        else:
            assert not bool(out["parse_ok"].iloc[i])
            assert out["parsed_json"].iloc[i] is None


@given(st.integers(0, 2**40), st.integers(1, 400), st.integers(1, 4),
       st.sampled_from([8, 16]))
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_any_shape(seed, n, channels, bits):
    """decode(encode-like bytes) over arbitrary PCM shapes: totals always
    equal the raw sample arithmetic — the parser never mis-frames."""
    import struct

    from log_collector_spark.textops import multimodal as M

    rng_vals = [((seed + i * 7919) % (256 if bits == 8 else 65536))
                for i in range(n * channels)]
    if bits == 16:
        samples = [v - 32768 for v in rng_vals]
        data = struct.pack("<%dh" % len(samples), *samples)
    else:
        samples = [v - 128 for v in rng_vals]
        data = bytes(rng_vals)
    rate = 8000
    fmt = struct.pack("<IHHIIHH", 16, 1, channels, rate,
                      rate * channels * bits // 8,
                      channels * bits // 8, bits)
    wav = (b"RIFF" + struct.pack("<I", 28 + len(data)) + b"WAVE"
           + b"fmt " + fmt + b"data" + struct.pack("<I", len(data)) + data)
    f = M.decode_wav(wav)
    assert f["n_channels"] == channels and f["bits"] == bits
    assert f["n_samples"] == n
    assert f["sample_sum"] == sum(samples)
    assert f["sample_min"] == min(samples)
    assert f["sample_max"] == max(samples)


@given(st.integers(1, 40), st.integers(1, 30), st.integers(0, 2**32))
@settings(max_examples=60, deadline=None)
def test_ppm_roundtrip_any_dims(w, h, seed):
    from log_collector_spark.textops import multimodal as M

    px = bytes(((seed + i) * 2654435761) % 256 for i in range(w * h * 3))
    img = f"P6\n{w} {h}\n255\n".encode() + px
    f = M.decode_ppm(img)
    assert (f["width"], f["height"]) == (w, h)
    assert f["pixel_sum"] == sum(px)
    assert f["pixel_min"] == min(px) and f["pixel_max"] == max(px)


@given(st.lists(st.tuples(st.integers(0, 10**12), st.booleans()),
                min_size=0, max_size=200))
@settings(max_examples=60, deadline=None)
def test_reader_metrics_deltas_always_reconcile(ops):
    """ReaderMetricsState invariant: across ANY interleaving of increments
    and ticks, the sum of emitted deltas equals the cumulative totals, and
    raw datapoints always report the current cumulative per bucket."""
    from log_collector_spark.operators.sinks import ReaderMetricsState

    rm = ReaderMetricsState()
    emitted_s = emitted_e = 0
    now = 10**13
    for i, (ts, is_err) in enumerate(ops):
        if is_err:
            rm.increment_error()
        else:
            rm.increment_success(ts)
        if i % 7 == 6:  # periodic tick
            emitted_s += rm.success_delta()
            emitted_e += rm.error_delta()
            for bucket, cum in rm.all_success_datapoints(now):
                assert rm.success_map[bucket] == cum
    emitted_s += rm.success_delta()
    emitted_e += rm.error_delta()
    assert emitted_s == rm.success_total
    assert emitted_e == rm.error_total
    # a second immediate tick emits zero deltas and zero changed datapoints
    assert rm.success_delta() == 0 and rm.error_delta() == 0
    assert rm.all_success_datapoints(now) == []


@given(st.lists(st.integers(1, 50), min_size=1, max_size=80))
@settings(max_examples=100, deadline=None)
def test_gini_histogram_form_equals_sorted_definition(xs):
    """The histogram-form Gini (behavior.activity_gini's math) equals the
    classic sorted-rank definition on any multiset of positive counts."""
    from collections import Counter

    n, sx = len(xs), sum(xs)
    s = sorted(xs)
    six_sorted = sum((i + 1) * x for i, x in enumerate(s))
    expected = (2 * six_sorted - (n + 1) * sx) * 1000 // (n * sx)

    hist = Counter(xs)
    c_prev, six_hist = 0, 0
    for v in sorted(hist):
        m = hist[v]
        six_hist += v * (m * c_prev + m * (m + 1) // 2)
        c_prev += m
    got = (2 * six_hist - (n + 1) * sx) * 1000 // (n * sx)
    assert got == expected
    assert 0 <= got < 1000


@given(st.integers(1, 12), st.integers(1, 10), st.integers(1, 4),
       st.data())
@settings(max_examples=60, deadline=None)
def test_png_unfilter_inverts_an_independent_filter(w, h, channels, data):
    """PNG filter/unfilter as a PROPERTY: arbitrary pixels + arbitrary
    per-row filter types, filtered by an in-test implementation written
    straight from the spec (independent of the package encoder, so a
    matched encoder/decoder sign error cannot cancel), must decode back
    to the original bytes through the package's decode_png."""
    import struct
    import zlib

    from log_collector_spark.textops import multimodal as M

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    px = bytes(data.draw(st.integers(0, 255)) for _ in range(h * stride))
    filters = [data.draw(st.integers(0, 4)) for _ in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prior = bytes(stride)
    for y in range(h):
        row = px[y * stride:(y + 1) * stride]
        ft = filters[y]
        raw.append(ft)
        for x in range(stride):
            a = row[x - channels] if x >= channels else 0
            b = prior[x]
            c = prior[x - channels] if x >= channels else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2,
                    4: paeth(a, b, c)}[ft]
            raw.append((row[x] - pred) & 0xFF)
        prior = row

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    png = (M._PNG_SIG + M._png_chunk(b"IHDR", ihdr)
           + M._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + M._png_chunk(b"IEND", b""))
    f = M.decode_png(png)
    assert (f["width"], f["height"], f["channels"]) == (w, h, channels)
    assert f["pixel_sum"] == sum(px)
    assert f["pixel_min"] == min(px)
    assert f["pixel_max"] == max(px)

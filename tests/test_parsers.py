"""Table-driven parser tests — the reference's per-operator test style
(pkg/stanza/operator/parser/regex/parser_test.go:32-160)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages import (
    CsvParser,
    JsonParser,
    KeyValueParser,
    RegexParser,
    SeverityParser,
    SyslogParser,
    TimeParser,
    TraceParser,
    UriParser,
)

LOG_RE = r"^(?P<level>[A-Z]+) lat=(?P<lat>\d+)$"


def tbl(texts, **extra):
    return pa.table({"text": pa.array(texts, type=pa.string()), **extra})


class TestRegexParser:
    def test_basic(self):
        out = RegexParser(LOG_RE, types={"lat": "int64"})(tbl(["INFO lat=5", "nope"]))
        assert out["attributes.level"].to_pylist() == ["INFO", None]
        assert out["attributes.lat"].to_pylist() == [5, None]

    def test_requires_named_groups(self):
        with pytest.raises(ValueError):
            RegexParser(r"^[A-Z]+$")

    def test_on_error_drop(self):
        out = RegexParser(LOG_RE, on_error="drop")(tbl(["INFO lat=5", "nope", "WARN lat=9"]))
        assert out.num_rows == 2
        assert out["attributes.level"].to_pylist() == ["INFO", "WARN"]

    def test_send_keeps_prior_values(self):
        # a second parser must not null out fields parsed by the first
        t = tbl(["INFO lat=5", "k=v"])
        t = RegexParser(LOG_RE)(t)
        t = KeyValueParser(fields=["k"])(t)
        assert t["attributes.level"].to_pylist() == ["INFO", None]
        assert t["attributes.k"].to_pylist() == [None, "v"]

    def test_if_expr_gate(self):
        out = RegexParser(LOG_RE, if_expr='text != "INFO lat=5"')(
            tbl(["INFO lat=5", "WARN lat=9"])
        )
        assert out["attributes.level"].to_pylist() == [None, "WARN"]

    def test_null_input_not_error(self):
        out = RegexParser(LOG_RE, on_error="drop")(tbl([None, "INFO lat=1"]))
        assert out.num_rows == 2  # null input is not a parse error


class TestJsonParser:
    def test_typed_fields(self):
        out = JsonParser(fields={"event": "string", "n": "int64"})(
            tbl(['{"event": "click", "n": 3}', "not json", '{"event": "x"}'])
        )
        assert out["attributes.event"].to_pylist() == ["click", None, "x"]
        assert out["attributes.n"].to_pylist() == [3, None, None]

    def test_on_error_drop(self):
        out = JsonParser(fields={"event": "string"}, on_error="drop")(
            tbl(['{"event": "a"}', "{broken", "[1,2]"])
        )
        assert out.num_rows == 1

    def test_keep_rest_spill(self):
        out = JsonParser(fields={"a": "int64"}, keep_rest=True)(
            tbl(['{"a": 1, "z": "q", "y": 2}'])
        )
        assert out["attributes.__rest"].to_pylist() == ['{"y": 2, "z": "q"}']


class TestKeyValueParser:
    def test_static_fields(self):
        out = KeyValueParser(fields=["a", "b"], types={"b": "int64"})(
            tbl(["a=x b=2", "b=9", "junk"])
        )
        assert out["attributes.a"].to_pylist() == ["x", None, None]
        assert out["attributes.b"].to_pylist() == [2, 9, None]

    def test_dynamic_spill(self):
        out = KeyValueParser()(tbl(["a=1 b=2"]))
        assert out["attributes.__kv"].to_pylist() == ['{"a": "1", "b": "2"}']

    def test_custom_delims(self):
        out = KeyValueParser(fields=["k"], delimiter=":", pair_delimiter=",")(
            tbl(["k:v,x:y"])
        )
        assert out["attributes.k"].to_pylist() == ["v"]


class TestCsvParser:
    def test_static_header(self):
        out = CsvParser(header=["a", "b", "c"], types={"b": "int64"})(
            tbl(["x,2,z", "short,row"])
        )
        assert out["attributes.a"].to_pylist() == ["x", None]
        assert out["attributes.b"].to_pylist() == [2, None]

    def test_drop_bad_rows(self):
        out = CsvParser(header=["a", "b"], on_error="drop")(tbl(["1,2", "1,2,3"]))
        assert out.num_rows == 1


class TestSeverityParser:
    def test_preset_and_aliases(self):
        t = pa.table({"lvl": ["ERROR", "warn", "Informational", "catastrophe", "junk", None]})
        out = SeverityParser(parse_from="lvl")(t)
        assert out["severity_number"].to_pylist() == [17, 13, 9, 24, 0, 0]
        assert out["severity_text"].to_pylist() == ["ERROR", "WARN", "INFO", "FATAL4", "", ""]

    def test_custom_mapping(self):
        t = pa.table({"lvl": ["oops"]})
        out = SeverityParser(parse_from="lvl", mapping={"oops": 18})(t)
        assert out["severity_number"].to_pylist() == [18]
        assert out["severity_text"].to_pylist() == ["ERROR2"]


class TestTimeParser:
    def test_strptime(self):
        t = pa.table({"when": ["2024-03-01 10:00:05", "bad"]})
        out = TimeParser("when", layout="%Y-%m-%d %H:%M:%S")(t)
        vals = out["event_ts"].to_pylist()
        assert vals[0].year == 2024 and vals[0].second == 5
        assert vals[1] is None

    def test_epoch_ms(self):
        t = pa.table({"e": pa.array([1700000000000], type=pa.int64())})
        out = TimeParser("e", layout_type="epoch", layout="ms")(t)
        assert out["event_ts"].to_pylist()[0].year == 2023

    def test_epoch_float_seconds(self):
        t = pa.table({"e": pa.array([1700000000.5])})
        out = TimeParser("e", layout_type="epoch", layout="s")(t)
        assert out["event_ts"].to_pylist()[0].microsecond == 500000


class TestTraceParser:
    def test_hex_decode(self):
        t = pa.table({"tid": ["0af7651916cd43dd8448eb211c80319c", "zz"],
                      "sid": ["b7ad6b7169203331", None]})
        out = TraceParser(trace_id_from="tid", span_id_from="sid")(t)
        assert out["trace_id"].to_pylist()[0] == bytes.fromhex("0af7651916cd43dd8448eb211c80319c")
        assert out["trace_id"].to_pylist()[1] is None
        assert out["span_id"].to_pylist()[1] is None


class TestUriParser:
    def test_parse(self):
        out = UriParser()(tbl(["https://example.com:8080/p/q?x=1"]))
        assert out["attributes.uri.scheme"].to_pylist() == ["https"]
        assert out["attributes.uri.host"].to_pylist() == ["example.com"]
        assert out["attributes.uri.port"].to_pylist() == [8080]
        assert out["attributes.uri.path"].to_pylist() == ["/p/q"]
        assert out["attributes.uri.query"].to_pylist() == ["x=1"]


class TestSyslogParser:
    def test_rfc3164(self):
        out = SyslogParser()(tbl(["<34>Oct 11 22:14:15 host1 app[123]: boom", "nope"]))
        assert out["attributes.hostname"].to_pylist() == ["host1", None]
        assert out["attributes.appname"].to_pylist() == ["app", None]
        assert out["attributes.message"].to_pylist() == ["boom", None]
        assert out["attributes.facility"].to_pylist()[0] == 4
        assert out["severity_number"].to_pylist()[0] == 18  # pri 34 → sev 2 crit → Error2


class TestCsvDynamicHeader:
    def test_header_attribute_mode(self):
        t = pa.table(
            {
                "text": ["1,2", "x,y,z", "7"],
                "hdr": ["a,b", "p,q,r", "only"],
            }
        )
        out = CsvParser(header_attribute="hdr")(t)
        vals = out["attributes.__csv"].to_pylist()
        import json

        assert json.loads(vals[0]) == {"a": "1", "b": "2"}
        assert json.loads(vals[1]) == {"p": "x", "q": "y", "r": "z"}
        assert json.loads(vals[2]) == {"only": "7"}

    def test_header_mismatch_is_error(self):
        t = pa.table({"text": ["1,2,3"], "hdr": ["a,b"]})
        out = CsvParser(header_attribute="hdr", on_error="drop")(t)
        assert out.num_rows == 0


class TestSeverityHttpRanges:
    def test_range_tokens(self):
        t = pa.table({"code": ["204", "404", "500", "999", "ERROR", None]})
        out = SeverityParser(
            parse_from="code", mapping={"2xx": 9, "4xx": 13, "5xx": 17}
        )(t)
        assert out["severity_number"].to_pylist() == [9, 13, 17, 0, 17, 0]


def test_recombine_max_log_size():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.recombine import recombine

    t = pa.table(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": pa.array(range(4), type=pa.int32()),
            "text": ["aaaa", "bbbb", "cccc", "dddd"],
        }
    )
    out = recombine(rd.from_arrow(t), max_log_size=10).to_pandas()
    assert all(len(s) <= 10 for s in out["text"])
    assert out["n_combined"].sum() == 4


class TestDeadLetterChannel:
    def test_mark_errors_column(self):
        from opentelemetry_collector_contrib_ray.stages.base import DEAD_LETTER_COL

        out = RegexParser(LOG_RE, mark_errors=True)(
            tbl(["INFO lat=5", "nope", None])
        )
        assert out[DEAD_LETTER_COL].to_pylist() == [False, True, False]

    def test_errors_accumulate_across_ops(self):
        from opentelemetry_collector_contrib_ray.stages.base import DEAD_LETTER_COL

        t = tbl(["INFO lat=5", "{broken", "k=v"])
        t = RegexParser(LOG_RE, mark_errors=True)(t)
        t = JsonParser(fields={"e": "string"}, mark_errors=True,
                       if_expr='IsMatch(text, "^\\\\{")')(t)
        # row0: regex ok; row1: regex err + json err; row2: regex err
        assert t[DEAD_LETTER_COL].to_pylist() == [False, True, True]

    def test_dead_letter_split(self):
        import ray.data as rd

        from opentelemetry_collector_contrib_ray.stages.base import dead_letter_split

        t = RegexParser(LOG_RE, mark_errors=True)(tbl(["INFO lat=5", "nope"]))
        clean, dead = dead_letter_split(rd.from_arrow(t))
        assert clean.count() == 1 and dead.count() == 1
        assert dead.to_pandas()["text"].tolist() == ["nope"]

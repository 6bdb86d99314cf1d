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


class TestCsvQuotes:
    """Mirrors the reference quote cases (csv/parser_test.go:
    comma-in-quotes, quotes-in-quotes, lazy, ignore)."""

    HDR = ["name", "address", "age", "phone", "position"]

    def test_comma_in_quotes(self):
        out = CsvParser(header=self.HDR)(
            tbl(['stanza,"Evergreen,49508",1,555-5555,agent'])
        )
        assert out["attributes.address"].to_pylist() == ["Evergreen,49508"]
        assert out["attributes.position"].to_pylist() == ["agent"]

    def test_quotes_in_quotes(self):
        out = CsvParser(header=self.HDR)(
            tbl(['"bob ""the man""",Evergreen,1,555-5555,agent'])
        )
        assert out["attributes.name"].to_pylist() == ['bob "the man"']

    def test_newline_in_quoted_field(self):
        out = CsvParser(header=["a", "b", "c"])(tbl(['x,"line1\nline2",z']))
        assert out["attributes.b"].to_pylist() == ["line1\nline2"]

    def test_strict_bare_quote_is_error(self):
        out = CsvParser(header=["name", "age"], on_error="drop")(
            tbl(['stanza "log parser",1', 'ok,2'])
        )
        assert out.num_rows == 1
        assert out["attributes.name"].to_pylist() == ["ok"]

    def test_lazy_quotes(self):
        out = CsvParser(header=["name", "age", "height", "number"], lazy_quotes=True)(
            tbl(['stanza "log parser",1,6ft,5'])
        )
        # Go lazy csv keeps both bare quotes literally (parser_test.go
        # parse-with-lazy-quotes expects `stanza "log parser"`)
        assert out["attributes.name"].to_pylist() == ['stanza "log parser"']
        assert out["attributes.number"].to_pylist() == ["5"]

    def test_ignore_quotes(self):
        out = CsvParser(header=["a", "b", "c"], ignore_quotes=True)(
            tbl(['x,"y,z']))
        assert out["attributes.b"].to_pylist() == ['"y']

    def test_lazy_and_ignore_mutually_exclusive(self):
        with pytest.raises(ValueError):
            CsvParser(header=["a"], lazy_quotes=True, ignore_quotes=True)

    def test_unquoted_rows_stay_vectorized_path(self):
        out = CsvParser(header=["a", "b"])(tbl(["1,2", "3,4", '5,"6,6"']))
        assert out["attributes.a"].to_pylist() == ["1", "3", "5"]
        assert out["attributes.b"].to_pylist() == ["2", "4", "6,6"]


class TestTimeParserTz:
    def test_gotime_layout_translation(self):
        from opentelemetry_collector_contrib_ray.stages.parsers import go_layout_to_strptime

        assert go_layout_to_strptime("2006-01-02 15:04:05") == "%Y-%m-%d %H:%M:%S"
        assert go_layout_to_strptime("2006-01-02T15:04:05Z07:00") == "%Y-%m-%dT%H:%M:%S%z"
        assert go_layout_to_strptime("Jan _2 15:04:05") == "%b %d %H:%M:%S"
        assert go_layout_to_strptime("01/02/2006 03:04:05 PM") == "%m/%d/%Y %I:%M:%S %p"
        assert go_layout_to_strptime("2006-01-02 15:04:05.000") == "%Y-%m-%d %H:%M:%S.%f"

    def test_gotime_parse(self):
        t = pa.table({"when": ["2024-03-01 10:30:00", "bad"]})
        out = TimeParser("when", layout_type="gotime", layout="2006-01-02 15:04:05")(t)
        vals = out["event_ts"].to_pylist()
        assert str(vals[0]) == "2024-03-01 10:30:00"
        assert vals[1] is None

    def test_location_non_utc(self):
        # 10:30 in New York (EST, UTC-5 in winter) = 15:30 UTC
        t = pa.table({"when": ["2024-01-15 10:30:00"]})
        out = TimeParser("when", layout="%Y-%m-%d %H:%M:%S",
                         location="America/New_York")(t)
        assert str(out["event_ts"].to_pylist()[0]) == "2024-01-15 15:30:00"
        # and in summer (EDT, UTC-4)
        t2 = pa.table({"when": ["2024-07-15 10:30:00"]})
        out2 = TimeParser("when", layout="%Y-%m-%d %H:%M:%S",
                          location="America/New_York")(t2)
        assert str(out2["event_ts"].to_pylist()[0]) == "2024-07-15 14:30:00"

    def test_zone_offset_in_layout(self):
        t = pa.table({"when": ["2024-01-15T10:30:00+02:00"]})
        out = TimeParser("when", layout_type="gotime",
                         layout="2006-01-02T15:04:05Z07:00")(t)
        assert str(out["event_ts"].to_pylist()[0]) == "2024-01-15 08:30:00"

    def test_fractional_seconds(self):
        t = pa.table({"when": ["2024-01-15 10:30:00.123"]})
        out = TimeParser("when", layout_type="gotime",
                         layout="2006-01-02 15:04:05.000")(t)
        assert str(out["event_ts"].to_pylist()[0]) == "2024-01-15 10:30:00.123000"

    def test_invalid_location_raises(self):
        with pytest.raises(Exception):
            TimeParser("when", location="Not/AZone")


class TestJsonDynamicMap:
    def test_arbitrary_object_to_map(self):
        out = JsonParser()(tbl(['{"a": 1, "b": "x", "c": {"d": 2}}', "not json", None]))
        maps = out["attributes.__map"].to_pylist()
        assert dict(maps[0]) == {"a": "1", "b": "x", "c": '{"d": 2}'}
        assert maps[1] is None and maps[2] is None

    def test_dynamic_map_error_mask(self):
        p = JsonParser(on_error="drop")
        out = p(tbl(['{"k": "v"}', "nope"]))
        assert out.num_rows == 1


class TestUriQueryParams:
    def test_query_param_map(self):
        import json as _json

        out = UriParser()(tbl([
            "https://example.com/p?x=1&y=2&y=3",
            "https://example.com/noquery",
        ]))
        qp = out["attributes.uri.query_params"].to_pylist()
        assert _json.loads(qp[0]) == {"x": ["1"], "y": ["2", "3"]}
        assert qp[1] is None


def test_recombine_is_last_entry():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.recombine import recombine

    t = pa.table({
        "conv_id": ["c"] * 6,
        "turn_idx": pa.array(range(6), type=pa.int32()),
        "text": ["line1", "line2", "END", "a", "b", "END"],
    })
    out = recombine(rd.from_arrow(t), is_last_entry="text == 'END'").to_pandas()
    out = out.sort_values("turn_idx").reset_index(drop=True)
    assert out["text"].tolist() == ["line1\nline2\nEND", "a\nb\nEND"]
    assert out["n_combined"].tolist() == [3, 3]


def test_recombine_is_last_entry_trailing_unflushed():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.recombine import recombine

    t = pa.table({
        "conv_id": ["c"] * 4,
        "turn_idx": pa.array(range(4), type=pa.int32()),
        "text": ["x", "END", "tail1", "tail2"],
    })
    out = recombine(rd.from_arrow(t), is_last_entry="text == 'END'").to_pandas()
    out = out.sort_values("turn_idx").reset_index(drop=True)
    # end-of-stream flushes the open batch (batch semantics for the
    # reference's force_flush_period timer)
    assert out["text"].tolist() == ["x\nEND", "tail1\ntail2"]


def test_recombine_first_last_mutually_exclusive():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.recombine import recombine

    with pytest.raises(ValueError):
        recombine(None, is_first_entry="a", is_last_entry="b")


class TestJsonArrayParser:
    def _p(self, **kw):
        from opentelemetry_collector_contrib_ray.stages import JsonArrayParser

        return JsonArrayParser(**kw)

    def test_to_array_column(self):
        out = self._p()(tbl(['[1, "x", true, null, {"a": 2}]', "not json", None]))
        arrs = out["attributes.__array"].to_pylist()
        assert arrs[0] == ["1", "x", "true", None, '{"a": 2}']
        assert arrs[1] is None and arrs[2] is None

    def test_header_mode_typed(self):
        out = self._p(header="name,age", types={"age": "int64"})(
            tbl(['["bob", 42]', '["solo"]'])
        )
        assert out["attributes.name"].to_pylist() == ["bob", None]
        assert out["attributes.age"].to_pylist() == [42, None]

    def test_length_mismatch_is_error(self):
        out = self._p(header=["a", "b"], on_error="drop")(tbl(['[1, 2]', '[1]']))
        assert out.num_rows == 1

    def test_nested_object_stringified(self):
        # reference flattens nested values to strings (parser.go:56-58)
        out = self._p(header=["x"])(tbl(['[{"k": [1, 2]}]']))
        import json as _json

        assert _json.loads(out["attributes.x"].to_pylist()[0]) == {"k": [1, 2]}

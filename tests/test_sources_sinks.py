import json

import pandas as pd

import pyarrow as pa
import ray.data as rd

from opentelemetry_collector_contrib_ray.sources.otlp_json import (
    decode_otlp_json_lines,
    read_otlp_json_logs,
)
from opentelemetry_collector_contrib_ray.stages.sinks import (
    drop_sink,
    write_grouped_parquet,
    write_time_partitioned,
)


def otlp_line():
    return json.dumps(
        {
            "resourceLogs": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "service.name", "value": {"stringValue": "svc-a"}}
                        ]
                    },
                    "scopeLogs": [
                        {
                            "scope": {"name": "lib"},
                            "logRecords": [
                                {
                                    "timeUnixNano": "1700000000000000000",
                                    "severityNumber": 17,
                                    "severityText": "ERROR",
                                    "body": {"stringValue": "boom"},
                                    "attributes": [
                                        {"key": "code", "value": {"intValue": "500"}}
                                    ],
                                    "traceId": "0af7651916cd43dd8448eb211c80319c",
                                },
                                {
                                    "severityNumber": 9,
                                    "body": {"stringValue": "fine"},
                                },
                            ],
                        }
                    ],
                }
            ]
        }
    )


def test_decode_otlp_json_lines():
    t = pa.table({"text": [otlp_line(), "", "not json"]})
    out = decode_otlp_json_lines(t)
    assert out.num_rows == 2
    assert out["resource.service.name"].to_pylist() == ["svc-a", "svc-a"]
    assert out["severity_number"].to_pylist() == [17, 9]
    assert out["body"].to_pylist() == ["boom", "fine"]
    assert out["attributes.code"].to_pylist() == [500, None]
    assert out["scope_name"].to_pylist() == ["lib", "lib"]


def test_read_otlp_json_logs(tmp_path):
    p = tmp_path / "logs.jsonl"
    p.write_text(otlp_line() + "\n" + otlp_line() + "\n")
    ds = read_otlp_json_logs(str(p))
    assert ds.count() == 4


def test_grouped_and_time_partitioned_sinks(tmp_path):
    import numpy as np

    t = pa.table(
        {
            "k": ["a", "b", "a", "b"],
            "ts": pa.array(
                np.array(
                    ["2024-01-01T01:00", "2024-01-02T05:00",
                     "2024-02-03T09:00", "2024-02-03T10:00"],
                    dtype="datetime64[us]",
                )
            ),
            "v": [1, 2, 3, 4],
        }
    )
    write_grouped_parquet(rd.from_arrow(t), str(tmp_path / "g"), ["k"])
    assert (tmp_path / "g" / "k=a").is_dir() and (tmp_path / "g" / "k=b").is_dir()

    write_time_partitioned(rd.from_arrow(t), str(tmp_path / "tp"), "ts", "day")
    assert (tmp_path / "tp" / "year=2024" / "month=1" / "day=1").is_dir() or (
        tmp_path / "tp" / "year=2024" / "month=01" / "day=01"
    ).is_dir()

    assert drop_sink(rd.from_arrow(t)) == 4


class TestReadLines:
    def _write(self, tmp_path, name, data: bytes):
        p = tmp_path / name
        p.write_bytes(data)
        return str(p)

    def test_plain_lines_and_file_attrs(self, tmp_path):
        from opentelemetry_collector_contrib_ray.sources.readers import read_lines

        p = self._write(tmp_path, "a.log", b"one\ntwo\nthree\n")
        out = read_lines(p).to_pandas()
        assert out["text"].tolist() == ["one", "two", "three"]
        assert out["log.file.name"].unique().tolist() == ["a.log"]

    def test_non_utf8_encoding(self, tmp_path):
        from opentelemetry_collector_contrib_ray.sources.readers import read_lines

        p = self._write(tmp_path, "l1.log", "café\nöl\n".encode("latin-1"))
        out = read_lines(p, encoding="latin-1").to_pandas()
        assert out["text"].tolist() == ["café", "öl"]

    def test_multiline_start_pattern(self, tmp_path):
        from opentelemetry_collector_contrib_ray.sources.readers import read_lines

        data = (
            b"2024-01-01 ERROR boom\n  at Foo.java:1\n  at Bar.java:2\n"
            b"2024-01-01 INFO ok\n"
        )
        p = self._write(tmp_path, "m.log", data)
        out = read_lines(p, line_start_pattern=r"^\d{4}-\d{2}-\d{2} ").to_pandas()
        assert len(out) == 2
        assert out["text"][0] == "2024-01-01 ERROR boom\n  at Foo.java:1\n  at Bar.java:2"
        assert out["text"][1] == "2024-01-01 INFO ok"

    def test_multiline_end_pattern(self, tmp_path):
        from opentelemetry_collector_contrib_ray.sources.readers import read_lines

        data = b"part1\npart2 END\nnext START\ntail END\nleftover\n"
        p = self._write(tmp_path, "e.log", data)
        out = read_lines(p, line_end_pattern=r"END$").to_pandas()
        assert out["text"].tolist() == [
            "part1\npart2 END", "next START\ntail END", "leftover",
        ]

    def test_start_and_end_mutually_exclusive(self, tmp_path):
        from opentelemetry_collector_contrib_ray.sources.readers import read_lines

        import pytest as _pytest

        with _pytest.raises(ValueError):
            read_lines("x", line_start_pattern="a", line_end_pattern="b")

    def test_file_header_metadata(self, tmp_path):
        # fileconsumer/internal/header/reader.go:46-71 — leading lines
        # matching the pattern are consumed through metadata_operators
        # and their attributes attach to every entry of that file.
        from opentelemetry_collector_contrib_ray.sources.readers import read_lines
        from opentelemetry_collector_contrib_ray.stages.parsers import RegexParser

        p1 = self._write(
            tmp_path, "h1.log",
            b"#env: prod\n#version: 3\nline one\nline two\n",
        )
        p2 = self._write(tmp_path, "h2.log", b"#env: dev\nonly line\n")
        ops = [RegexParser(pattern=r"^#(?P<hk>\w+): (?P<hv>\S+)",
                           parse_from="text", prefix="")]

        def kv_promote(t):
            # turn (hk, hv) rows into per-key attr columns
            import pyarrow as _pa
            cols = {"text": t["text"]}
            for k, v in zip(t["hk"].to_pylist(), t["hv"].to_pylist()):
                cols[f"header.{k}"] = _pa.array(
                    [v if kk == k else None
                     for kk in t["hk"].to_pylist()])
            return _pa.table(cols)

        out = read_lines([p1, p2], header_pattern=r"^#",
                         header_ops=ops + [kv_promote]).to_pandas()
        out = out.sort_values(["log.file.name", "text"]).reset_index(drop=True)
        assert out["text"].tolist() == ["line one", "line two", "only line"]
        assert out["header.env"].tolist() == ["prod", "prod", "dev"]
        assert out["header.version"].tolist()[:2] == ["3", "3"]
        import pandas as _pd

        assert _pd.isna(out["header.version"].tolist()[2])

    def test_header_requires_both_params(self, tmp_path):
        import pytest as _pytest

        from opentelemetry_collector_contrib_ray.sources.readers import read_lines

        with _pytest.raises(ValueError):
            read_lines("x", header_pattern="^#")

    def test_octet_counting_framing(self, tmp_path):
        # RFC6587 octet counting (parser/syslog/parser.go:300): each
        # message prefixed with its byte length.
        from opentelemetry_collector_contrib_ray.sources.readers import read_lines

        m1 = b"<34>1 2024-01-01T00:00:00Z host app - - - hi"
        m2 = b"<13>1 2024-01-01T00:00:01Z host app - - - caf\xc3\xa9"
        data = str(len(m1)).encode() + b" " + m1 + str(len(m2)).encode() + b" " + m2
        p = self._write(tmp_path, "oc.log", data)
        out = read_lines(p, framing="octet_counting").to_pandas()
        assert out["text"].tolist() == [
            m1.decode(), "<13>1 2024-01-01T00:00:01Z host app - - - café",
        ]

    def test_octet_counting_malformed_tail(self, tmp_path):
        from opentelemetry_collector_contrib_ray.sources.readers import read_lines

        p = self._write(tmp_path, "bad.log", b"5 hellogarbage-no-prefix")
        out = read_lines(p, framing="octet_counting").to_pandas()
        assert out["text"].tolist() == ["hello", "garbage-no-prefix"]

    def test_non_transparent_framing(self, tmp_path):
        from opentelemetry_collector_contrib_ray.sources.readers import read_lines

        p = self._write(tmp_path, "nt.log", b"<34>1 msg one\x00<34>1 msg two\x00")
        out = read_lines(p, framing="non_transparent").to_pandas()
        assert out["text"].tolist() == ["<34>1 msg one", "<34>1 msg two"]

    def test_framing_excludes_patterns(self, tmp_path):
        import pytest as _pytest

        from opentelemetry_collector_contrib_ray.sources.readers import read_lines

        with _pytest.raises(ValueError):
            read_lines("x", framing="octet_counting", line_start_pattern="a")
        with _pytest.raises(ValueError):
            read_lines("x", framing="bogus")


class TestFailoverWrite:
    def test_falls_to_next_level(self, tmp_path):
        import ray.data as rd

        from opentelemetry_collector_contrib_ray.stages.sinks import failover_write

        ds = rd.range(10)
        calls = []

        def bad(ds):
            calls.append("bad")
            raise OSError("primary down")

        def good(ds):
            calls.append("good")
            ds.write_parquet(str(tmp_path / "out"))
            return "written"

        level, res = failover_write(ds, [bad, good], max_retries=2)
        assert level == 1 and res == "written"
        assert calls == ["bad", "bad", "good"]

    def test_all_levels_fail(self):
        import pytest as _pytest
        import ray.data as rd

        from opentelemetry_collector_contrib_ray.stages.sinks import failover_write

        def bad(ds):
            raise OSError("down")

        with _pytest.raises(RuntimeError, match="failover levels failed"):
            failover_write(rd.range(1), [bad, bad])


def test_otlp_json_round_trip(tmp_path):
    # fileexporter marshal → otlpjsonfilereceiver parse round-trip
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.sources.otlp_json import (
        read_otlp_json_logs,
        write_otlp_json_logs,
    )

    t = pa.table({
        "resource.service.name": ["svc-a", "svc-a", "svc-b"],
        "scope_name": ["lib", "lib", "lib2"],
        "time_unix_nano": [1700000000000000000, 1700000000000000001, 0],
        "observed_time_unix_nano": [0, 0, 0],
        "severity_number": [17, 9, 0],
        "severity_text": ["ERROR", "INFO", ""],
        "body": ["boom", "fine", "third"],
        "attributes.code": [500, None, 404],
        "trace_id": ["0af7651916cd43dd8448eb211c80319c", "", ""],
        "span_id": ["", "", ""],
    })
    out = str(tmp_path / "otlp")
    n_files = write_otlp_json_logs(rd.from_arrow(t).repartition(2), out)
    assert n_files >= 1

    back = read_otlp_json_logs(out + "/").to_pandas()
    back = back.sort_values("body").reset_index(drop=True)
    assert back["body"].tolist() == ["boom", "fine", "third"]
    got = back.set_index("body")
    assert got.loc["boom", "severity_number"] == 17
    assert got.loc["boom", "attributes.code"] == 500
    assert got.loc["boom", "resource.service.name"] == "svc-a"
    assert got.loc["third", "resource.service.name"] == "svc-b"
    assert got.loc["boom", "trace_id"] == "0af7651916cd43dd8448eb211c80319c"


def test_otlp_proto_roundtrip_pure():
    """Wire-format round trip without Ray: every AnyValue variant,
    negative ints, resource/scope grouping, trace/span id bytes."""
    from opentelemetry_collector_contrib_ray.sources.otlp_proto import (
        decode_logs_data,
        encode_otlp_proto_batch,
    )

    t = pa.table({
        "body": ["hello", "world", None],
        "attributes.level": ["INFO", "ERROR", "WARN"],
        "attributes.latency_ms": [12, -3456, None],
        "attributes.ok": [True, False, None],
        "attributes.score": [1.5, -2.25, None],
        "resource.service": ["a-svc", "a-svc", "b-svc"],
        "scope_name": ["s1", "s1", "s2"],
        "time_unix_nano": [1700000000000000001, 1700000000000000002, 0],
        "severity_number": [9, 17, 0],
        "severity_text": ["INFO", "ERROR", ""],
        "trace_id": ["0102030405060708090a0b0c0d0e0f10", "", ""],
        "span_id": ["0102030405060708", "", ""],
    })
    rows = decode_logs_data(encode_otlp_proto_batch(t))
    assert len(rows) == 3
    rows.sort(key=lambda r: (r.get("resource.service") or "", r["body"] or ""))
    r0, r1, r2 = rows
    assert r0["body"] == "hello" and r0["attributes.latency_ms"] == 12
    assert r0["attributes.ok"] is True and r0["attributes.score"] == 1.5
    assert r0["time_unix_nano"] == 1700000000000000001
    assert r0["trace_id"] == "0102030405060708090a0b0c0d0e0f10"
    assert r0["span_id"] == "0102030405060708"
    assert r1["attributes.latency_ms"] == -3456  # two's-complement varint
    assert r1["attributes.ok"] is False and r1["attributes.score"] == -2.25
    assert r1["severity_number"] == 17
    assert r2["resource.service"] == "b-svc" and r2["scope_name"] == "s2"
    assert r2["severity_number"] == 0 and r2["trace_id"] == ""


def test_otlp_proto_decoder_skips_unknown_fields():
    """Files written by the reference collector carry fields we don't
    model (flags fixed32, dropped counts varint, schema_url) — the
    decoder must skip them by wire type."""
    import struct

    from opentelemetry_collector_contrib_ray.sources.otlp_proto import (
        _ld,
        _tag,
        _varint,
        decode_logs_data,
        encode_otlp_proto_batch,
    )

    t = pa.table({"body": ["x"], "attributes.k": ["v"], "scope_name": ["s"]})
    buf = bytearray(encode_otlp_proto_batch(t))
    # splice extra unknown fields into the LogRecord: flags (8, fixed32),
    # dropped_attributes_count (7, varint) — rebuild the nesting around it
    rec = _ld(5, _ld(1, b"x")) + _ld(6, _ld(1, b"k") + _ld(2, _ld(1, b"v")))
    rec += _tag(8, 5) + struct.pack("<I", 1)      # flags
    rec += _tag(7, 0) + _varint(3)                # dropped count
    sl = _ld(1, _ld(1, b"s")) + _ld(2, rec) + _ld(3, b"https://schema")
    full = _ld(1, _ld(2, sl) + _ld(3, b"https://schema"))
    rows = decode_logs_data(bytes(full))
    assert rows == [{
        "scope_name": "s", "time_unix_nano": 0, "observed_time_unix_nano": 0,
        "severity_number": 0, "severity_text": "", "body": "x",
        "trace_id": "", "span_id": "", "attributes.k": "v",
    }]


def test_otlp_proto_file_sink_and_source(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.sources.otlp_proto import (
        read_otlp_proto_logs,
        write_otlp_proto_logs,
    )
    import ray.data as rd

    df = pd.DataFrame({
        "body": [f"m{i}" for i in range(50)],
        "attributes.level": ["INFO", "ERROR"] * 25,
        "resource.service": ["svc"] * 50,
        "scope_name": ["sc"] * 50,
    })
    ds = rd.from_pandas(df).repartition(4)
    n_files = write_otlp_proto_logs(ds, str(tmp_path / "pb"))
    assert n_files >= 1
    import glob

    back = read_otlp_proto_logs(sorted(glob.glob(str(tmp_path / "pb" / "*.pb"))))
    got = back.to_pandas()
    assert len(got) == 50
    assert sorted(got["body"]) == sorted(df["body"])
    assert (got["resource.service"] == "svc").all()
    counts = got["attributes.level"].value_counts()
    assert counts["INFO"] == 25 and counts["ERROR"] == 25


def test_otlp_proto_traces_codec_pure():
    """Span tree wire pins: id byte round-trips, fixed64 nanos, nested
    Status{message,code}, attrs, resource/scope envelope, and the
    parent_span_id presence rule (absent ↔ empty hex)."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.sources.otlp_proto import (
        decode_traces_data, encode_otlp_proto_spans)

    t = pa.table({
        "trace_id": ["0af7651916cd43dd8448eb211c80319c"] * 2,
        "span_id": ["b7ad6b7169203331", "00f067aa0ba902b7"],
        "parent_span_id": ["", "b7ad6b7169203331"],
        "name": ["GET /", "SELECT"],
        "kind": pa.array([2, 3], pa.int64()),
        "start_time_unix_nano": pa.array(
            [1544712660000000000, 1544712661000000000], pa.int64()),
        "end_time_unix_nano": pa.array(
            [1544712661000000000, 1544712662000000000], pa.int64()),
        "status.code": pa.array([0, 2], pa.int64()),
        "status.message": ["", "boom"],
        "attributes.http_status": pa.array([200, 500], pa.int64()),
        "resource.service": ["api", "api"],
        "scope_name": ["otelray", "otelray"],
    })
    rows = sorted(decode_traces_data(encode_otlp_proto_spans(t)),
                  key=lambda r: r["span_id"])
    assert len(rows) == 2
    child = [r for r in rows if r["span_id"] == "00f067aa0ba902b7"][0]
    root = [r for r in rows if r["span_id"] == "b7ad6b7169203331"][0]
    assert child["parent_span_id"] == "b7ad6b7169203331"
    assert root["parent_span_id"] == ""
    assert child["status.code"] == 2 and child["status.message"] == "boom"
    assert root["status.code"] == 0 and root["status.message"] == ""
    assert child["kind"] == 3 and child["name"] == "SELECT"
    assert child["end_time_unix_nano"] == 1544712662000000000
    assert child["attributes.http_status"] == 500
    assert child["resource.service"] == "api"
    assert child["scope_name"] == "otelray"


def test_otlp_proto_metrics_codec_pure():
    """Metric tree wire pins: the Gauge/Sum oneof (temporality and
    monotonic exist ONLY inside Sum), sfixed64 negative int values,
    double values, per-metric datapoint regrouping."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.sources.otlp_proto import (
        decode_metrics_data, encode_otlp_proto_metrics)

    m = pa.table({
        "metric_name": ["req_count", "req_count", "temp"],
        "unit": ["1", "1", "C"],
        "type": pa.array([2, 2, 1], pa.int64()),
        "aggregation_temporality": pa.array([2, 2, 0], pa.int64()),
        "is_monotonic": pa.array([True, True, False]),
        "time_unix_nano": pa.array([10, 20, 30], pa.int64()),
        "start_time_unix_nano": pa.array([1, 1, 0], pa.int64()),
        "value_int": pa.array([10, -5, None], pa.int64()),
        "value_double": pa.array([None, None, 21.5], pa.float64()),
        "attributes.host": ["a", "b", "a"],
        "resource.service": ["api"] * 3,
        "scope_name": ["otelray"] * 3,
    })
    rows = decode_metrics_data(encode_otlp_proto_metrics(m))
    assert len(rows) == 3
    sums = sorted((r for r in rows if r["metric_name"] == "req_count"),
                  key=lambda r: r["time_unix_nano"])
    assert [r["value_int"] for r in sums] == [10, -5]  # sfixed64 sign
    assert all(r["type"] == 2 and r["aggregation_temporality"] == 2
               and r["is_monotonic"] for r in sums)
    assert {r["attributes.host"] for r in sums} == {"a", "b"}
    g = [r for r in rows if r["metric_name"] == "temp"][0]
    assert g["type"] == 1 and g["value_double"] == 21.5
    assert g["value_int"] is None
    assert g["aggregation_temporality"] == 0 and not g["is_monotonic"]
    assert g["unit"] == "C" and g["start_time_unix_nano"] == 0


def test_otlp_proto_traces_decoder_skips_unknown_fields():
    """A TracesData written by the reference collector carries fields
    this flat model doesn't track (dropped counts, schema_url, links)
    — the decoder must skip them by wire type, not break."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.sources.otlp_proto import (
        _ld, _tag, _varint, decode_traces_data, encode_otlp_proto_spans)

    t = pa.table({
        "span_id": ["b7ad6b7169203331"],
        "name": ["op"],
        "kind": pa.array([1], pa.int64()),
        "scope_name": ["s"],
    })
    buf = bytearray(encode_otlp_proto_spans(t))
    # append an unknown varint field (10: dropped_attributes_count)
    # inside a fresh top-level ResourceSpans with one span
    span = _ld(2, b"\x62\x02op") + _tag(10, 0) + _varint(7)
    extra_span = _ld(5, b"op2") + _tag(10, 0) + _varint(3)
    sl = _ld(2, extra_span)
    rl = _ld(2, sl) + _ld(3, b"https://schema")  # 3: schema_url
    buf += _ld(1, bytes(rl))
    rows = decode_traces_data(bytes(buf))
    assert {r["name"] for r in rows} == {"op", "op2"}


def test_otlp_proto_histogram_codec_pure():
    """Histogram tree wire pins: packed fixed64 bucket_counts / packed
    double explicit_bounds survive the roundtrip in order, count is
    fixed64, sum/min/max are doubles, temporality rides the Histogram
    message (field 2), and a mixed Gauge+Histogram stream keeps each
    metric's own datapoint shape."""
    import struct

    import numpy as np
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.sources.otlp_proto import (
        _enc_histogram_dp,
        decode_metrics_data,
        encode_otlp_proto_metrics,
    )

    # exact wire bytes of one minimal dp: time=1, count=2, buckets [1,2]
    raw = _enc_histogram_dp({"time_unix_nano": 1, "hist_count": 2,
                             "bucket_counts": [1, 2],
                             "explicit_bounds": [10.0]})
    expect = (
        bytes([0x19]) + struct.pack("<Q", 1)      # f3 fixed64 time
        + bytes([0x21]) + struct.pack("<Q", 2)    # f4 fixed64 count
        + bytes([0x32, 16]) + struct.pack("<QQ", 1, 2)  # f6 packed
        + bytes([0x3A, 8]) + struct.pack("<d", 10.0)    # f7 packed
    )
    assert raw == expect

    t = pa.table({
        "metric_name": ["hist", "hist", "g"],
        "type": pa.array([3, 3, 1], pa.int64()),
        "aggregation_temporality": pa.array([2, 2, 0], pa.int64()),
        "time_unix_nano": pa.array([111, 222, 333], pa.int64()),
        "hist_count": pa.array([6, 0, None], pa.int64()),
        "hist_sum": pa.array([12.5, 0.0, None], pa.float64()),
        "bucket_counts": pa.array([[1, 2, 3], [0, 0, 0], None],
                                  pa.list_(pa.int64())),
        "explicit_bounds": pa.array([[10.0, 100.0], [10.0, 100.0], None],
                                    pa.list_(pa.float64())),
        "hist_min": pa.array([0.5, None, None], pa.float64()),
        "hist_max": pa.array([99.0, None, None], pa.float64()),
        "value_int": pa.array([None, None, 7], pa.int64()),
        "scope_name": ["s"] * 3,
    })
    rows = sorted(decode_metrics_data(encode_otlp_proto_metrics(t)),
                  key=lambda r: r["time_unix_nano"])
    assert rows[0]["bucket_counts"] == [1, 2, 3]
    assert rows[0]["explicit_bounds"] == [10.0, 100.0]
    assert rows[0]["hist_count"] == 6 and rows[0]["hist_max"] == 99.0
    assert rows[0]["aggregation_temporality"] == 2
    assert rows[0]["type"] == 3
    assert rows[1]["bucket_counts"] == [0, 0, 0]
    assert rows[1]["hist_count"] == 0
    assert rows[2]["type"] == 1 and rows[2]["value_int"] == 7
    assert "bucket_counts" not in rows[2]

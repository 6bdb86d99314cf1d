"""Table-driven OTTL converter tests (ottlfuncs/functions.go:35-83;
style of pkg/ottl/e2e/e2e_test.go)."""

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.expr import compile_expr


@pytest.fixture
def t():
    return pa.table(
        {
            "s": ["Hello World", "abc", ""],
            "num_s": ["42", "3.9", "-7"],
            "f": pa.array([1.5, 2.0, 1e6]),
            "i": pa.array([1, 2, 3], type=pa.int64()),
            "b64": ["aGVsbG8=", "d29ybGQ=", "eA=="],
            "hexid": ["0af7651916cd43dd8448eb211c80319c"] * 3,
            "ts": pa.array(
                np.array(["2024-03-05T10:30:45", "2024-01-01T00:00:00",
                          "2025-12-31T23:59:59"], dtype="datetime64[us]")
            ),
            "dur": ["1h30m", "250ms", "2s"],
            "csvline": ["a,b,c", "1,2,3", "x,y,z"],
            "kvline": ["k1=v1 k2=v2", "a=1", "z=9"],
            "xml": ['<a href="x">hi</a>', "<b>t</b>", "bad<"],
        }
    )


def ev(src, t):
    v = compile_expr(src)(t)
    return v.to_pylist() if hasattr(v, "to_pylist") else v


def test_type_converters(t):
    assert ev("Int(num_s)", t) == [42, 3, -7]
    assert ev("Double(i)", t) == [1.0, 2.0, 3.0]
    assert ev("String(i)", t) == ["1", "2", "3"]
    assert ev("IsString(s)", t) == [True] * 3
    assert ev("IsInt(i)", t) == [True] * 3
    assert ev("IsDouble(f)", t) == [True] * 3
    assert ev("IsBool(i)", t) == [False] * 3


def test_string_converters(t):
    assert ev('ConvertCase(s, "upper")', t) == ["HELLO WORLD", "ABC", ""]
    assert ev('ConvertCase(s, "lower")', t) == ["hello world", "abc", ""]
    assert ev('Substring(s, 0, 5)', t) == ["Hello", "abc", ""]
    assert ev("Len(s)", t) == [11, 3, 0]
    assert ev('Concat("-", s, num_s)', t) == ["Hello World-42", "abc-3.9", "--7"]
    assert ev('Split(s, " ")', t)[0] == ["Hello", "World"]
    assert ev("Base64Decode(b64)", t) == ["hello", "world", "x"]


def test_hash_converters(t):
    import hashlib

    assert ev("SHA1(s)", t)[0] == hashlib.sha1(b"Hello World").hexdigest()
    assert ev("SHA256(s)", t)[1] == hashlib.sha256(b"abc").hexdigest()
    fnv = ev("FNV(s)", t)
    assert len(set(fnv)) == 3  # distinct, deterministic
    assert ev("FNV(s)", t) == fnv
    # known FNV-1a 64-bit vector: fnv1a64("a") = 0xaf63dc4c8601ec8c
    import pyarrow as pa

    va = ev("FNV(s)", pa.table({"s": ["a"]}))[0]
    assert va & 0xFFFFFFFFFFFFFFFF == 0xAF63DC4C8601EC8C


def test_time_converters(t):
    assert ev("Hour(ts)", t) == [10, 0, 23]
    assert ev("UnixSeconds(ts)", t)[1] == 1704067200
    assert ev("UnixMilli(ts)", t)[1] == 1704067200000
    assert ev("UnixMicro(ts)", t)[1] == 1704067200000000
    assert ev("UnixNano(ts)", t)[1] == 1704067200000000000
    trunc = ev('TruncateTime(ts, "1h")', t)
    assert trunc[0].minute == 0 and trunc[0].hour == 10
    unix = ev("Unix(i)", t)  # epoch seconds → timestamp
    assert unix[0].year == 1970
    parsed = ev('Time(num_s, "%Y")', t)
    assert parsed[0].year == 42 and parsed[1] is None  # "3.9" → error→null


def test_duration_converters(t):
    assert ev("Seconds(dur)", t) == [5400.0, 0.25, 2.0]
    assert ev("Milliseconds(dur)", t)[1] == 250.0
    assert ev("Minutes(dur)", t)[0] == 90.0
    assert ev("Hours(dur)", t)[0] == 1.5
    assert abs(ev("Nanoseconds(dur)", t)[2] - 2e9) < 1
    assert abs(ev("Microseconds(dur)", t)[1] - 250000) < 1


def test_parse_converters(t):
    csv = ev('ParseCSV(csvline, "x,y,z")', t)
    assert csv[0] == {"x": "a", "y": "b", "z": "c"}
    kv = ev("ParseKeyValue(kvline)", t)
    # arrow unions struct keys across rows; absent keys are None
    assert {k: v for k, v in kv[0].items() if v is not None} == {"k1": "v1", "k2": "v2"}
    js = ev('ParseJSON(num_s)', t)
    assert js[0] == 42.0  # arrow unifies mixed numerics to float
    xml = ev("ParseXML(xml)", t)
    assert xml[0]["tag"] == "a" and xml[0]["attributes"] == {"href": "x"}
    assert xml[2] is None


def test_trace_converters(t):
    tid = ev("TraceID(hexid)", t)
    assert tid[0] == bytes.fromhex("0af7651916cd43dd8448eb211c80319c")


def test_regex_converters(t):
    assert ev('IsMatch(s, "^Hello")', t) == [True, False, False]
    ext = ev('ExtractPatterns(s, "(?P<w>\\\\w+)")', t)
    assert ext[0] == {"w": "Hello"}


def test_misc(t):
    assert ev("Log(f)", t)[1] == pytest.approx(np.log(2.0))
    u = ev("UUID()", t)
    assert len(u) == 3 and len(set(u)) == 3 and len(u[0]) == 36

"""Property-based round-trips for the parser layer.

CSV strict mode is checked against Python's stdlib ``csv`` module
(itself RFC-4180): any field set the writer emits, the parser must
recover exactly — including embedded delimiters, doubled quotes and
newlines inside quoted fields.
"""

import csv
import io

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_ray.stages.parsers import CsvParser

field = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\r\x00",
        max_codepoint=0x2FF,
    ),
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(rows=st.lists(st.tuples(field, field, field), min_size=1, max_size=8))
def test_csv_strict_matches_stdlib(rows):
    lines = []
    for r in rows:
        buf = io.StringIO()
        csv.writer(buf, lineterminator="").writerow(r)
        lines.append(buf.getvalue())
    t = pa.table({"text": pa.array(lines, type=pa.string())})
    out = CsvParser(header=["a", "b", "c"])(t)
    for j, name in enumerate(["a", "b", "c"]):
        got = out[f"attributes.{name}"].to_pylist()
        want = [r[j] for r in rows]
        assert got == want, (lines, name, got, want)


@settings(max_examples=80, deadline=None)
@given(rows=st.lists(st.tuples(field, field), min_size=1, max_size=6),
       delim=st.sampled_from([",", ";", "\t", "|"]))
def test_csv_strict_alt_delimiters(rows, delim):
    lines = []
    for r in rows:
        buf = io.StringIO()
        csv.writer(buf, delimiter=delim, lineterminator="").writerow(r)
        lines.append(buf.getvalue())
    t = pa.table({"text": pa.array(lines, type=pa.string())})
    out = CsvParser(header=["a", "b"], delimiter=delim)(t)
    for j, name in enumerate(["a", "b"]):
        assert out[f"attributes.{name}"].to_pylist() == [r[j] for r in rows]


# ---------------------------------------------------------------------------
# JsonParser fast path: the strict flat-JSON detector routes ~90% of
# rows through RE2 extraction — fast and slow paths must agree exactly
# on any mix of valid/broken/edge-case rows (parsers.py _transform_fast).

import json

import opentelemetry_collector_contrib_ray.stages.parsers as parsers_mod
from opentelemetry_collector_contrib_ray.stages.parsers import JsonParser, RegexParser

_JSON_EDGE_ROWS = [
    '{"event": "timeout", "latency_ms": 982, "tags": ["a", "b"]}',
    "{broken json", None, "{}", '{"event": "x"}',
    '{"latency_ms": 98.7}', '{"event": null, "latency_ms": null}',
    '{"event": "a", "event": "b"}', '{"event": "e\\nescape"}',
    '{"note": "event", "event": "real"}', '{"latency_ms": 01}',
    '{"latency_ms": -0.5e3}', '{"event":"tight","latency_ms":7}',
    '{ "event" : "spaced" , "latency_ms" : 8 }', '{"event": "trail",}',
    "not json at all", '{"unrelated": "x"}', "[1,2,3]", '{"event": ""}',
    '{"latency_ms": 1e3}', '{"latency_ms": 9999999999999}',
    '{"event": "dup", "latency_ms": 1, "latency_ms": 2}',
    '{"x": "contains \\"event\\": fake"}',
]


def _json_fast_slow(rows, gate_expr):
    args = dict(fields={"event": "string", "latency_ms": "int64"},
                prefix="attributes.", if_expr=gate_expr, on_error="send")
    t = pa.table({"text": pa.array(rows, type=pa.string()),
                  "attributes.event": pa.array(["OLD"] * len(rows))})
    fast = JsonParser(**args)(t)
    saved = parsers_mod._JSON_FAST_TYPES
    parsers_mod._JSON_FAST_TYPES = ()  # force the per-row slow path
    try:
        slow = JsonParser(**args)(t)
    finally:
        parsers_mod._JSON_FAST_TYPES = saved
    return fast, slow


def test_json_fast_path_matches_slow_on_edge_rows():
    for gate in (None, 'IsMatch(text, "^\\\\{")'):
        fast, slow = _json_fast_slow(_JSON_EDGE_ROWS, gate)
        for c in ("attributes.event", "attributes.latency_ms"):
            assert fast[c].to_pylist() == slow[c].to_pylist(), (gate, c)
            assert fast.schema.field(c).type == slow.schema.field(c).type


_jstr = st.text(alphabet=st.characters(codec="utf-8", max_codepoint=0x2FF,
                                       exclude_characters='"\\\x00'),
                max_size=8)


@st.composite
def _flat_obj(draw):
    # homogeneous per-key types (string event / int latency), matching
    # a typed log corpus; the slow path's whole-column-null fallback on
    # MIXED-type columns is a documented degeneracy the fast path
    # improves on row-locally, so mixed types can't be equality-tested
    d = {}
    if draw(st.booleans()):
        d["event"] = draw(st.one_of(_jstr, st.none()))
    if draw(st.booleans()):
        d["latency_ms"] = draw(st.one_of(st.integers(-10**6, 10**6), st.none()))
    if draw(st.booleans()):
        d["note"] = draw(st.one_of(_jstr, st.integers(), st.booleans(), st.none()))
    return json.dumps(d)


@settings(max_examples=120, deadline=None)
@given(objs=st.lists(
    st.one_of(
        _flat_obj(),
        # malformed rows only — '{"event": [1,2]}' (valid JSON, array
        # value) is intentionally excluded: the slow path nulls the
        # whole column on mixed scalar/array batches while the fast
        # path stays row-local (see test_json_fast_path_array_value)
        st.sampled_from(["{nope", "", "[]", "null"]),
    ),
    min_size=1, max_size=12))
def test_json_fast_path_matches_slow_property(objs):
    # randomized flat objects + malformed rows: fast == slow, both gates
    for gate in (None, 'IsMatch(text, "^\\\\{")'):
        fast, slow = _json_fast_slow(objs, gate)
        assert fast.column_names == slow.column_names, (gate, objs)
        for c in ("attributes.event", "attributes.latency_ms"):
            if c not in fast.column_names:  # gate excluded every row
                continue
            assert fast[c].to_pylist() == slow[c].to_pylist(), (gate, c, objs)


def test_regex_digit_pure_cast_overflow_falls_back():
    # digit-pure group with a value past int64: the direct cast raises
    # internally and the guarded float64 path takes over (no crash)
    out = RegexParser(r"^v=(?P<v>\d+)$", types={"v": "int64"})(
        pa.table({"text": pa.array(["v=12", "v=99999999999999999999999999"],
                                   type=pa.string())}))
    vals = out["attributes.v"].to_pylist()
    assert vals[0] == 12
    assert vals[1] is not None  # float64-truncated, same as pre-fast-path


def test_is_match_prefix_literal_equivalence():
    from opentelemetry_collector_contrib_ray.functions.converters import _prefix_literal
    assert _prefix_literal("^latency_ms=") == "latency_ms="
    assert _prefix_literal("^\\{") == "{"
    assert _prefix_literal("^a\\.b") == "a.b"
    assert _prefix_literal("^a.b") is None      # '.' is a metachar
    assert _prefix_literal("^\\d+") is None     # class escape
    assert _prefix_literal("latency") is None   # unanchored
    assert _prefix_literal("^abc$") is None     # end anchor


def test_json_fast_path_array_value():
    """An array value for an extracted key demotes ONLY that row to the
    per-row path; neighbors keep their correct values. (The slow path's
    whole-column-null fallback on mixed scalar/array batches is the
    degeneracy the fast path improves on row-locally — so this case is
    checked against json.loads ground truth, not the slow path.)"""
    rows = ['{"event": ""}', '{"event": [1,2]}', '{"event": "ok"}']
    out = JsonParser(fields={"event": "string", "latency_ms": "int64"},
                     prefix="attributes.",
                     if_expr='IsMatch(text, "^\\\\{")')(
        pa.table({"text": pa.array(rows, type=pa.string())}))
    assert out["attributes.event"].to_pylist() == ["", None, "ok"]

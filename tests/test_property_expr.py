"""Property tests: expression compiler vs row-at-a-time python oracle
(FIXTURES.md §6 — parser edge-case property tests)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_ray.expr import compile_mask
from opentelemetry_collector_contrib_ray.stages.parsers import KeyValueParser, RegexParser

ints = st.lists(st.one_of(st.integers(-10**6, 10**6), st.none()), min_size=1, max_size=50)
OPS = ["==", "!=", "<", "<=", ">", ">="]


@given(vals=ints, op=st.sampled_from(OPS), lit=st.integers(-100, 100))
@settings(max_examples=60, deadline=None)
def test_int_comparison_matches_python(vals, op, lit):
    t = pa.table({"x": pa.array(vals, type=pa.int64())})
    got = compile_mask(f"x {op} {lit}")(t).to_pylist()
    py = {
        "==": lambda a: a == lit, "!=": lambda a: a != lit,
        "<": lambda a: a < lit, "<=": lambda a: a <= lit,
        ">": lambda a: a > lit, ">=": lambda a: a >= lit,
    }[op]
    expected = [False if v is None else py(v) for v in vals]
    assert got == expected


@given(vals=ints, a=st.integers(-50, 50), b=st.integers(-50, 50))
@settings(max_examples=40, deadline=None)
def test_and_or_not_match_python(vals, a, b):
    t = pa.table({"x": pa.array(vals, type=pa.int64())})
    got = compile_mask(f"x > {a} and not (x > {b})")(t).to_pylist()
    expected = [False if v is None else (v > a and not (v > b)) for v in vals]
    assert got == expected


texts = st.lists(
    st.one_of(st.none(), st.text(alphabet="abc=xy z0159", max_size=20)),
    min_size=1, max_size=30,
)


@given(texts=texts)
@settings(max_examples=50, deadline=None)
def test_kv_parser_never_raises_and_matches_python(texts):
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    out = KeyValueParser(fields=["a"])(t)
    import re

    rx = re.compile(r"(?:^| )a=([^ ]*)")
    expected = [None if s is None else (rx.search(s).group(1) if rx.search(s) else None) for s in texts]
    assert out["attributes.a"].to_pylist() == expected


@given(texts=texts)
@settings(max_examples=50, deadline=None)
def test_regex_parser_drop_mode_drops_exactly_nonmatching(texts):
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    p = RegexParser(r"^(?P<k>[a-z]+)=(?P<v>[a-z0-9]*)$", on_error="drop")
    out = p(t)
    import re

    rx = re.compile(r"^(?P<k>[a-z]+)=(?P<v>[a-z0-9]*)$")
    keep = [s for s in texts if s is None or rx.match(s)]
    assert out.num_rows == len(keep)

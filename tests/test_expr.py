import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.expr import compile_expr, compile_mask


@pytest.fixture
def t():
    return pa.table(
        {
            "severity_number": pa.array([0, 17, 21, None], type=pa.int64()),
            "role": ["user", "tool", "system", "tool"],
            "attributes.status": pa.array([200, 500, 503, None], type=pa.int64()),
            "text": ["a ERROR b", "x", "y", "z"],
            "f": pa.array([0.5, 1.5, 2.5, 3.5]),
        }
    )


CASES = [
    ("severity_number >= 17", [False, True, True, False]),
    ('severity_number >= 17 and role != "system"', [False, True, False, False]),
    ('attributes.status >= 500 or role == "tool"', [False, True, True, True]),
    ('IsMatch(text, "ERROR")', [True, False, False, False]),
    ("missing.col == 5", [False, False, False, False]),
    ('not (role == "user")', [False, True, True, True]),
    ('attributes["status"] < 501', [True, True, False, False]),
    ("severity_number + 1 > 17", [False, True, True, False]),
    ("f * 2 >= 3.0", [False, True, True, True]),
    ("true", [True, True, True, True]),
    # reference nil semantics (compare.go:174-185): nil equals nil only
    ("severity_number == nil", [False, False, False, True]),
    ("severity_number != nil", [True, True, True, False]),
    ("missing.col == nil", [True, True, True, True]),
    ("severity_number > nil", [False, False, False, False]),
    ("nil == nil", [True, True, True, True]),
    # OTTL log-context enum symbols (ottllog/log.go:111-138)
    ("severity_number >= SEVERITY_NUMBER_ERROR", [False, True, True, False]),
    ("severity_number == SEVERITY_NUMBER_FATAL", [False, False, True, False]),
]


@pytest.mark.parametrize("src,expected", CASES)
def test_masks(t, src, expected):
    assert compile_mask(src)(t).to_pylist() == expected


def test_arith_values(t):
    assert compile_expr("severity_number * 2")(t).to_pylist() == [0, 34, 42, None]
    out = compile_expr('Concat("-", role, text)')(t)
    assert out.to_pylist()[0] == "user-a ERROR b"


def test_numeric_coercion_int_float(t):
    # int column compared to float literal
    assert compile_mask("severity_number > 16.5")(t).to_pylist() == [False, True, True, False]


def test_string_number_incomparable(t):
    # incomparable types → no match, not an error (error_mode: ignore)
    assert compile_mask("role > 5")(t).to_pylist() == [False, False, False, False]


def test_unknown_function_raises():
    with pytest.raises(ValueError):
        compile_expr("Nope(text)")


def test_time_duration_arithmetic():
    """OTTL math.go time semantics in where clauses."""
    import numpy as np

    ts = pa.array(np.array(["2024-01-01T00:30:00", "2024-01-01T02:30:00"],
                           dtype="datetime64[us]"))
    t = pa.table({"ts": ts, "other": ts})
    # ts - Duration("1h") shifts back one hour
    m = compile_mask('ts - Duration("1h") >= Time("2024-01-01 00:00:00", "%Y-%m-%d %H:%M:%S")')(t)
    assert m.to_pylist() == [False, True]
    # time - time → seconds
    v = compile_expr("ts - other")(t)
    assert v.to_pylist() == [0.0, 0.0]
    m2 = compile_mask('ts + Duration("30m") > Time("2024-01-01 02:59:00", "%Y-%m-%d %H:%M:%S")')(t)
    assert m2.to_pylist() == [False, True]


def test_non_ascii_literal_matches():
    t = pa.table({"msg": ["café", "cafe"]})
    assert compile_mask('msg == "café"')(t).to_pylist() == [True, False]


def test_escape_sequences_in_literal():
    t = pa.table({"msg": ["a\tb", "a\\tb"]})
    assert compile_mask('msg == "a\\tb"')(t).to_pylist() == [True, False]
    t2 = pa.table({"msg": ["é"]})
    assert compile_mask('msg == "\\u00e9"')(t2).to_pylist() == [True]


def test_bad_syntax_raises():
    with pytest.raises(ValueError):
        compile_expr("a ==")

"""OTTL editor statement tests — the reference's e2e statement style
(pkg/ottl/e2e/e2e_test.go:32-200)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages import TransformProcessor, parse_statement


@pytest.fixture
def t():
    return pa.table(
        {
            "severity_number": pa.array([9, 17, 21], type=pa.int64()),
            "attributes.msg": ["hello world", "boom", "fatal issue"],
            "attributes.code": pa.array([200, 500, 503], type=pa.int64()),
            "attributes.token": ["secret-abc", "ok", "secret-xyz"],
            "resource.env": ["prod", "prod", "dev"],
        }
    )


def run(t, stmts, **kw):
    return TransformProcessor(stmts, **kw)(t)


def test_parse_statement():
    ed, args, where = parse_statement(
        'set(attributes.x, Concat("-", a, b)) where n > 1'
    )
    assert ed == "set"
    assert args == ["attributes.x", 'Concat("-", a, b)']
    assert where == "n > 1"


def test_set_with_where(t):
    out = run(t, ['set(attributes.is_err, true) where severity_number >= 17'])
    assert out["attributes.is_err"].to_pylist() == [None, True, True]


def test_set_expression_value(t):
    out = run(t, ["set(attributes.code2, attributes.code * 2)"])
    assert out["attributes.code2"].to_pylist() == [400, 1000, 1006]


def test_delete_key_and_matching(t):
    out = run(t, ['delete_key(attributes, "token")'])
    assert "attributes.token" not in out.column_names
    out = run(t, ['delete_matching_keys(attributes, "^to")'])
    assert "attributes.token" not in out.column_names
    assert "attributes.msg" in out.column_names


def test_keep_keys(t):
    out = run(t, ['keep_keys(attributes, "msg", "code")'])
    assert set(c for c in out.column_names if c.startswith("attributes.")) == {
        "attributes.msg",
        "attributes.code",
    }
    # other namespaces untouched
    assert "resource.env" in out.column_names


def test_replace_pattern_and_match(t):
    out = run(t, ['replace_pattern(attributes.token, "secret-\\w+", "***")'])
    assert out["attributes.token"].to_pylist() == ["***", "ok", "***"]
    out = run(t, ['replace_match(attributes.token, "secret-*", "X")'])
    assert out["attributes.token"].to_pylist() == ["X", "ok", "X"]


def test_replace_all_patterns_values_and_keys(t):
    out = run(t, ['replace_all_patterns(attributes, "value", "secret", "S")'])
    assert out["attributes.token"].to_pylist() == ["S-abc", "ok", "S-xyz"]
    out = run(t, ['replace_all_patterns(attributes, "key", "^to", "TO")'])
    assert "attributes.TOken" in out.column_names


def test_truncate_all(t):
    out = run(t, ["truncate_all(attributes, 4)"])
    assert out["attributes.msg"].to_pylist() == ["hell", "boom", "fata"]
    assert out["attributes.code"].to_pylist() == [200, 500, 503]  # non-string untouched


def test_limit_with_priority(t):
    out = run(t, ['limit(attributes, 1, "msg")'])
    assert [c for c in out.column_names if c.startswith("attributes.")] == [
        "attributes.msg"
    ]


def test_merge_maps_strategies(t):
    t2 = run(t, ['set(other.msg, "copied")', 'set(other.new, 1)'])
    up = run(t2, ['merge_maps(attributes, other, "upsert")'])
    assert up["attributes.msg"].to_pylist() == ["copied"] * 3
    assert up["attributes.new"].to_pylist() == [1, 1, 1]
    ins = run(t2, ['merge_maps(attributes, other, "insert")'])
    assert ins["attributes.msg"].to_pylist() == t["attributes.msg"].to_pylist()
    assert ins["attributes.new"].to_pylist() == [1, 1, 1]
    upd = run(t2, ['merge_maps(attributes, other, "update")'])
    assert upd["attributes.msg"].to_pylist() == ["copied"] * 3
    assert "attributes.new" not in upd.column_names


def test_error_mode_ignore_vs_propagate(t):
    # division by a string column fails inside the statement
    out = run(t, ["set(attributes.bad, attributes.msg / 2)"], error_mode="ignore")
    assert "attributes.bad" not in out.column_names
    with pytest.raises(Exception):
        run(t, ["set(attributes.bad, attributes.msg / 2)"], error_mode="propagate")


def test_ordered_statements_chain(t):
    out = run(
        t,
        [
            'set(attributes.stage, "one")',
            'set(attributes.stage, "two") where severity_number >= 21',
        ],
    )
    assert out["attributes.stage"].to_pylist() == ["one", "one", "two"]


def test_cache_paths_are_transient():
    # ottllog cache: statements can stage through cache.* but it never
    # leaves the processor (log.go:155-210)
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.ottl import TransformProcessor

    t = pa.table({"attributes.v": [1, 2, 3]})
    p = TransformProcessor([
        'set(cache.double, attributes.v * 2)',
        'set(attributes.out, cache.double) where cache.double > 2',
    ])
    out = p(t)
    assert out["attributes.out"].to_pylist() == [None, 4, 6]
    assert not any(c.startswith("cache") for c in out.column_names)

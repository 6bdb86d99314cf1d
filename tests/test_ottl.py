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


# ---- grammar tail: e2e statements that round 2 could NOT parse ----------
# (mirrors pkg/ottl/e2e/e2e_test.go: bracket path keys, list-literal
# arguments, keyed access on converter results, bytes literals)


def test_bracket_path_keys_set_and_where(t):
    out = run(t, ['set(attributes["test"], "pass") where attributes["code"] == 500'])
    assert out["attributes.test"].to_pylist() == [None, "pass", None]


def test_nested_bracket_path_keys(t):
    t2 = t.append_column("attributes.foo.bar", pa.array(["a", "b", "c"]))
    out = run(t2, ['set(attributes["test"], attributes["foo"]["bar"])'])
    assert out["attributes.test"].to_pylist() == ["a", "b", "c"]


def test_keep_keys_list_literal(t):
    out = run(t, ['keep_keys(attributes, ["msg", "code"])'])
    kept = {c for c in out.column_names if c.startswith("attributes.")}
    assert kept == {"attributes.msg", "attributes.code"}


def test_limit_empty_list_literal(t):
    # e2e: limit(attributes, 100, []) — keeps everything at n=100
    out = run(t, ['limit(attributes, 100, [])'])
    assert {c for c in out.column_names if c.startswith("attributes.")} == {
        "attributes.msg", "attributes.code", "attributes.token"}
    out2 = run(t, ['limit(attributes, 1, ["token"])'])
    assert {c for c in out2.column_names if c.startswith("attributes.")} == {
        "attributes.token"}


def test_concat_list_literal_argument(t):
    # e2e: set(attributes["test"], Concat(["A","B"], ":"))
    out = run(t, ['set(attributes["test"], Concat(["A", "B"], ":"))'])
    assert out["attributes.test"].to_pylist() == ["A:B"] * 3


def test_string_of_list_literal(t):
    # e2e: set(attributes["test"], String([1,2,3]))
    out = run(t, ['set(attributes["test"], String([1, 2, 3]))'])
    assert out["attributes.test"].to_pylist() == ["[1,2,3]"] * 3


def test_keyed_access_on_converter_result(t):
    t2 = t.append_column(
        "attributes.js", pa.array(['{"id": 1, "tags": ["x", "y"]}',
                                   '{"id": 2, "tags": ["z"]}',
                                   '{"id": 3, "tags": []}'])
    )
    out = run(t2, ['set(attributes["test"], ParseJSON(attributes["js"])["id"])'])
    assert out["attributes.test"].to_pylist() == [1, 2, 3]
    out2 = run(t2, ['set(attributes["first"], Split(attributes["msg"], " ")[0])'])
    assert out2["attributes.first"].to_pylist() == ["hello", "boom", "fatal"]


def test_keyed_access_missing_key_is_null(t):
    t2 = t.append_column("attributes.js", pa.array(['{"id": 1}'] * 3))
    out = run(t2, ['set(attributes["test"], ParseJSON(attributes["js"])["nope"])'],
              error_mode="ignore")
    assert out["attributes.test"].to_pylist() == [None, None, None]


def test_expr_list_and_int_index_forms():
    from opentelemetry_collector_contrib_ray.expr import compile_expr

    t = pa.table({"x": pa.array([1, 2], type=pa.int64())})
    assert compile_expr('["a", "b"]')(t) == ["a", "b"]
    assert compile_expr("[]")(t) == []
    # array element promotes literal to per-row list column
    arr = compile_expr("[x, 10]")(t)
    assert arr.to_pylist() == [[1, 10], [2, 10]]
    # bytes literal
    assert compile_expr("0x0102ff")(t) == b"\x01\x02\xff"


def test_map_literal_set(t):
    # e2e_test.go style: set(attributes["test"], {"k1": "v1", "k2": {"k3": [1, 2]}})
    out = run(t, ['set(attributes["m"], {"k1": "v1", "k2": {"k3": [1, 2]}})'])
    v = out["attributes.m"][0].as_py()
    assert v == {"k1": "v1", "k2": {"k3": [1, 2]}}


def test_map_literal_per_row_promotion(t):
    out = run(t, ['set(attributes["wrap"], {"orig": attributes["msg"], "env": resource.env})'])
    vals = out["attributes.wrap"].to_pylist()
    assert vals[0] == {"orig": "hello world", "env": "prod"}
    assert vals[2] == {"orig": "fatal issue", "env": "dev"}


def test_map_literal_empty_and_where(t):
    out = run(t, ['set(attributes["empty"], {}) where severity_number >= 17'])
    vals = out["attributes.empty"].to_pylist()
    assert vals[0] is None and vals[1] == {} and vals[2] == {}


def test_statement_string_escapes():
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.ottl import (
        TransformProcessor,
        parse_statement,
    )

    # the e2e corpus case that needs backslash-aware scanning: an
    # escaped quote inside a string literal
    parse_statement('set(attributes["test"], "\\"")')
    t = pa.table({"attributes.test": ["x"], "attributes.b": ["y"]})
    out = TransformProcessor(['set(attributes["test"], "\\"")'])(t)
    assert out["attributes.test"].to_pylist() == ['"']
    out = TransformProcessor(['set(attributes["test"], "a\\\\b, c")'])(t)
    assert out["attributes.test"].to_pylist() == ["a\\b, c"]
    out = TransformProcessor(['set(attributes["test"], "l1\\nl2")'])(t)
    assert out["attributes.test"].to_pylist() == ["l1\nl2"]


# ------------------------------------------------------------- contexts
# span / datapoint context statement tests mirroring the reference
# context tests (pkg/ottl/contexts/ottlspan/span_test.go path coverage,
# contexts/internal/span.go:26-98 paths + :29-37 enums).


def _span_table():
    return pa.table({
        "span_id": pa.array([1, 2, 3], pa.int64()),
        "name": ["GET /a", "GET /b", "POST /c"],
        "kind": pa.array([2, 3, 2], pa.int64()),  # server, client, server
        "start_time_unix_nano": pa.array(
            [1_700_000_000_000_000_000] * 3, pa.int64()),
        "end_time_unix_nano": pa.array(
            [1_700_000_000_060_000_000,   # +60ms
             1_700_000_000_200_000_000,   # +200ms
             1_700_000_000_010_000_000],  # +10ms
            pa.int64()),
        "status.code": pa.array([0, 0, 0], pa.int64()),
        "attributes.http_status": pa.array([200, 503, 200], pa.int64()),
    })


def test_span_context_enums_and_time_views():
    from opentelemetry_collector_contrib_ray.stages.ottl import TransformProcessor

    out = TransformProcessor([
        "set(attributes.slow, true) where end_time - start_time > 0.05 "
        "and kind == SPAN_KIND_SERVER",
        "set(status.code, STATUS_CODE_ERROR) where attributes.http_status >= 500",
    ], context="span")(_span_table())
    d = out.to_pydict()
    # only span 1 is server AND >50ms; span 2 is slower but client-kind
    assert d["attributes.slow"] == [True, None, None]
    assert d["status.code"] == [0, 2, 0]
    # derived views never leave the processor
    assert "start_time" not in out.column_names
    assert "end_time" not in out.column_names


def test_span_context_kind_string_view():
    from opentelemetry_collector_contrib_ray.stages.ottl import TransformProcessor

    out = TransformProcessor([
        "set(attributes.kind_name, kind.string)",
    ], context="span")(_span_table())
    assert out["attributes.kind_name"].to_pylist() == ["Server", "Client", "Server"]
    assert "kind.string" not in out.column_names


def test_span_context_time_write_back():
    """Setting the start_time TIMESTAMP view syncs the nano column
    (span.go:74-80 exposes both forms over the same field)."""
    from opentelemetry_collector_contrib_ray.stages.ottl import TransformProcessor

    out = TransformProcessor([
        # shift starts forward 1s via the timestamp view
        "set(start_time, start_time + 1)",
    ], context="span")(_span_table())
    assert out["start_time_unix_nano"].to_pylist() == [
        1_700_000_001_000_000_000] * 3
    assert "start_time" not in out.column_names


def test_datapoint_context_flags_and_time():
    from opentelemetry_collector_contrib_ray.stages.ottl import TransformProcessor

    t = pa.table({
        "metric.name": ["cpu", "cpu", "mem"],
        "time_unix_nano": pa.array([1_700_000_000_000_000_000,
                                    1_700_000_005_000_000_000,
                                    1_700_000_000_000_000_000], pa.int64()),
        "value_double": pa.array([0.5, 0.9, 0.1], pa.float64()),
        "flags": pa.array([0, 1, 0], pa.int64()),
    })
    out = TransformProcessor([
        'set(attributes.stale, true) where flags == FLAG_NO_RECORDED_VALUE',
        'set(attributes.late, true) where time - start_time > 0 and false',
    ], context="datapoint")(t)
    assert out["attributes.stale"].to_pylist() == [None, True, None]
    assert "time" not in out.column_names


def test_unknown_context_rejected():
    import pytest

    from opentelemetry_collector_contrib_ray.stages.ottl import TransformProcessor

    with pytest.raises(ValueError):
        TransformProcessor(["set(a, 1)"], context="connector")


def test_metric_context_type_string_and_enums():
    """METRIC context (pkg/ottl/contexts/ottlmetric): type.string name
    view (read-only, dropped after the group) and the
    METRIC_DATA_TYPE_* / AGGREGATION_TEMPORALITY_* enum symbols."""
    from opentelemetry_collector_contrib_ray.stages.ottl import TransformProcessor

    t = pa.table({
        "name": ["req_count", "heap", "lat_hist"],
        "unit": ["1", "By", "ms"],
        "type": [2, 1, 3],                      # Sum, Gauge, Histogram
        "aggregation_temporality": [2, 0, 1],   # cumulative / unspec / delta
        "is_monotonic": [True, False, False],
    })
    out = TransformProcessor([
        "set(attributes.rate_eligible, true) where "
        "type == METRIC_DATA_TYPE_SUM and is_monotonic == true and "
        "aggregation_temporality == AGGREGATION_TEMPORALITY_CUMULATIVE",
        "set(attributes.type_name, type.string)",
    ], context="metric")(t)
    assert out["attributes.type_name"].to_pylist() == [
        "Sum", "Gauge", "Histogram"]
    assert out["attributes.rate_eligible"].to_pylist() == [True, None, None]
    assert "type.string" not in out.column_names
    # type stays untouched (read-only path in the reference)
    assert out["type"].to_pylist() == [2, 1, 3]

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from opentelemetry_collector_contrib_ray.pipelines.spec import compile_pipeline
from opentelemetry_collector_contrib_ray.registry import build_op, registered_ops
from opentelemetry_collector_contrib_ray.stages.agg import salted_count, salted_groupby_sum
from opentelemetry_collector_contrib_ray.stages.attributes import AttributesProcessor


@pytest.fixture
def t():
    return pa.table(
        {
            "attributes.a": ["1", "2", None],
            "attributes.src": ["x=9 y=8", "x=7 y=6", "nope"],
            "attributes.secret": ["s1", "s2", "s3"],
        }
    )


class TestAttributesProcessor:
    def test_insert_update_upsert(self, t):
        out = AttributesProcessor([{"action": "insert", "key": "a", "value": "z"}])(t)
        assert out["attributes.a"].to_pylist() == ["1", "2", "z"]  # fills nulls only
        out = AttributesProcessor([{"action": "update", "key": "missing", "value": "v"}])(t)
        assert "attributes.missing" not in out.column_names
        out = AttributesProcessor([{"action": "upsert", "key": "b", "value": "v"}])(t)
        assert out["attributes.b"].to_pylist() == ["v"] * 3

    def test_delete_hash_convert(self, t):
        out = AttributesProcessor(
            [
                {"action": "hash", "key": "secret"},
                {"action": "convert", "key": "a", "converted_type": "int"},
                {"action": "delete", "key": "src"},
            ]
        )(t)
        import hashlib

        assert out["attributes.secret"].to_pylist()[0] == hashlib.sha1(b"s1").hexdigest()
        assert out["attributes.a"].to_pylist() == [1, 2, None]
        assert "attributes.src" not in out.column_names

    def test_extract(self, t):
        out = AttributesProcessor(
            [{"action": "extract", "key": "src",
              "pattern": r"x=(?P<x>\d+) y=(?P<y>\d+)"}]
        )(t)
        assert out["attributes.x"].to_pylist() == ["9", "7", None]

    def test_from_attribute(self, t):
        out = AttributesProcessor(
            [{"action": "upsert", "key": "copy", "from_attribute": "a"}]
        )(t)
        assert out["attributes.copy"].to_pylist() == ["1", "2", None]


def test_registry_covers_operator_surface():
    ops = registered_ops()
    for name in ["regex_parser", "json_parser", "csv_parser", "keyvalue_parser",
                 "severity_parser", "time_parser", "filter", "transform",
                 "attributes", "sampler", "redact"]:
        assert name in ops
    op = build_op({"type": "add", "field": "x", "value": 1})
    t = pa.table({"a": [1]})
    assert op(t)["x"].to_pylist() == [1]


def test_salted_aggregates_match_plain():
    n = 20000
    t = pa.table(
        {
            "k": pa.array((np.arange(n) % 7).astype(np.int64)),  # hot keys
            "v": pa.array(np.ones(n, dtype=np.int64)),
        }
    )
    ds = rd.from_arrow(t).repartition(5)
    out = salted_groupby_sum(ds, ["k"], "v", salt=8).to_pandas()
    assert sorted(out["sum_v"]) == sorted(
        [len([x for x in range(n) if x % 7 == i]) for i in range(7)]
    )
    cnt = salted_count(ds, ["k"], salt=8).to_pandas()
    assert cnt["n"].sum() == n


def test_spec_compiler_end_to_end(tmp_path):
    from opentelemetry_collector_contrib_ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(3000)
    spec = {
        "operators": [
            {"type": "regex_parser",
             "pattern": r"^(?P<level>[A-Z]+) latency_ms=(?P<latency_ms>\d+) "
                        r"status=(?P<status>\d+) msg=(?P<msg>\S+)$",
             "types": {"latency_ms": "int64", "status": "int64"}},
            {"type": "severity_parser", "parse_from": "attributes.level"},
        ],
        "enrich": {"key_col": "role",
                   "table": {"tool": {"kind": "tool"}, "user": {"kind": "human"}},
                   "defaults": {"kind": "other"}, "concurrency": 2},
        "routes": {"table": [["severity_number >= 17", ["errors"]]],
                   "default_sinks": ["rest"]},
        "metrics": {"turn.count": {}},
    }
    plan = compile_pipeline(spec, ds=rd.from_arrow(t))
    sinks = plan.sinks()
    assert set(sinks) == {"errors", "rest"}
    n_err = sinks["errors"].count()
    assert n_err > 0
    counts = plan.counts()
    cdf = counts["errors"].to_pandas()
    assert cdf[cdf.metric == "turn.count"]["count"].iloc[0] == n_err


def test_groupbyattrs_moves_and_compacts():
    from opentelemetry_collector_contrib_ray.stages.groupbyattrs import GroupByAttrs

    t = pa.table(
        {"attributes.host": ["h1", "h2", "h1"], "attributes.x": [1, 2, 3], "v": [1, 2, 3]}
    )
    out = GroupByAttrs(["host"])(t)
    assert "resource.host" in out.column_names
    assert "attributes.host" not in out.column_names
    assert out["attributes.x"].to_pylist() == [1, 2, 3]


def test_recombine_is_first_entry():
    from opentelemetry_collector_contrib_ray.stages.recombine import recombine

    t = pa.table(
        {
            "conv_id": ["c1"] * 5,
            "turn_idx": pa.array([0, 1, 2, 3, 4], type=pa.int32()),
            "role": ["user", "assistant", "user", "assistant", "assistant"],
            "text": ["q1", "a1", "q2", "a2a", "a2b"],
        }
    )
    out = recombine(
        rd.from_arrow(t), is_first_entry="role == 'user'"
    ).to_pandas().sort_values("turn_idx").reset_index(drop=True)
    assert out["text"].tolist() == ["q1\na1", "q2\na2a\na2b"]
    assert out["n_combined"].tolist() == [2, 3]


def test_recombine_max_batch_size():
    from opentelemetry_collector_contrib_ray.stages.recombine import recombine

    t = pa.table(
        {
            "conv_id": ["c1"] * 5,
            "turn_idx": pa.array(range(5), type=pa.int32()),
            "text": [f"t{i}" for i in range(5)],
        }
    )
    out = recombine(rd.from_arrow(t), max_batch_size=2).to_pandas()
    assert sorted(out["n_combined"].tolist()) == [1, 2, 2]


def test_approx_distinct_hll():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import approx_distinct

    vals = np.arange(200_000) % 12_345
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - 12_345) / 12_345 < 0.05
    # partitioning invariant (register max merge is order-independent)
    est2 = approx_distinct(
        rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(2), "v", p=12)
    assert est == est2


def test_int_quantiles_matches_duckdb():
    import duckdb

    from opentelemetry_collector_contrib_ray.stages.agg import int_quantiles

    rng = np.random.default_rng(7)
    qs = {"p00": 0.0, "p05": 0.05, "p10": 0.1, "p33": 0.33, "p50": 0.5,
          "p66": 0.66, "p90": 0.9, "p99": 0.99, "p100": 1.0}
    for n in (1, 2, 99, 10_000):
        vals = rng.integers(-50, 5_000, n)
        ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(5)
        got = int_quantiles(ds, "v", qs).to_pandas().iloc[0]
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS v", [vals.tolist()])
        want = con.execute(
            "SELECT " + ",".join(f"quantile_disc(v, {q}) AS {k}"
                                 for k, q in qs.items()) + " FROM t"
        ).df().iloc[0]
        for k in qs:
            assert got[k] == want[k], (n, k)


def test_grouped_outliers_vs_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import grouped_outliers

    rng = np.random.default_rng(9)
    k = np.array(["a", "b"])[rng.integers(0, 2, 3000)]
    v = np.where(k == "a", rng.normal(0, 1, 3000), rng.normal(10, 5, 3000))
    t = pa.table({"k": pa.array(k), "v": pa.array(v)})
    out = grouped_outliers(rd.from_arrow(t).repartition(6), "k", "v") \
        .to_pandas().set_index("k")
    for lab in ["a", "b"]:
        vv = v[k == lab]
        m, sd = vv.mean(), vv.std()
        want = int(((vv < m - 2 * sd) | (vv > m + 2 * sd)).sum())
        assert out.loc[lab, "n"] == len(vv)
        assert abs(int(out.loc[lab, "n_outliers"]) - want) <= 1  # FP boundary


def test_grouped_int_quantiles_vs_duckdb():
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import grouped_int_quantiles

    rng = np.random.default_rng(17)
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, 700)]
    v = rng.integers(0, 50, 700)
    t = pa.table({"g": pa.array(g), "v": pa.array(v, type=pa.int64())})
    out = grouped_int_quantiles(rd.from_arrow(t).repartition(6), "g", "v",
                                {"p25": 0.25, "p50": 0.5, "p99": 0.99},
                                num_partitions=4) \
        .to_pandas().sort_values("g").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT g, quantile_disc(v, 0.25) p25, quantile_disc(v, 0.5) p50, "
        "quantile_disc(v, 0.99) p99 FROM t GROUP BY g ORDER BY g").df()
    for c in ["p25", "p50", "p99"]:
        assert out[c].tolist() == want[c].tolist(), c


def test_bounded_histogram_otel_semantics():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import bounded_histogram

    t = pa.table({
        "k": ["a", "a", "a", "a", "b", "b", "b"],
        # 10.0 exactly on a bound -> bucket 0 (upper-inclusive);
        # 300 -> overflow bucket 2; null value ignored
        "v": [10.0, 10.5, 3.0, 300.0, 50.0, None, 0.0],
    })
    out = bounded_histogram(rd.from_arrow(t).repartition(3), "k", "v",
                            [10.0, 50.0]).to_pandas()
    got = {(r.k, r.bucket): (r.n, r.sum_cents) for r in out.itertuples()}
    assert got == {
        ("a", 0): (2, 1300),     # 10.0 (upper-inclusive) + 3.0
        ("a", 1): (1, 1050),     # 10.5
        ("a", 2): (1, 30000),    # 300.0 overflow
        ("b", 0): (1, 0),        # 0.0
        ("b", 1): (1, 5000),     # 50.0 (upper-inclusive in bucket 1)
    }


def test_rollup_counts_levels():
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import rollup_counts

    t = pa.table({"a": ["x", "x", "y", "y", "y"],
                  "b": ["1", "2", "1", "1", "2"]})
    out = rollup_counts(rd.from_arrow(t).repartition(3), ["a", "b"]).to_pandas()
    got = {(r.a, r.b): r.n for r in out.itertuples()}
    assert got == {
        ("x", "1"): 1, ("x", "2"): 1, ("y", "1"): 2, ("y", "2"): 1,
        ("x", "*"): 2, ("y", "*"): 3, ("*", "*"): 5,
    }


def test_profile_columns_typed_minmax_and_nulls():
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import profile_columns

    t = pa.table({
        "i": [9, 10, None, 2],     # numeric min/max must not compare as strings
        "s": ["b", None, "a", "c"],
    })
    out = profile_columns(rd.from_arrow(t).repartition(3),
                          int_cols=["i"], str_cols=["s"]).to_pandas()
    got = {r.column: (r.n_rows, r.n_nulls, r.min_v, r.max_v)
           for r in out.itertuples()}
    assert got == {"i": (4, 1, "2", "10"), "s": (4, 1, "a", "c")}


def test_heavy_hitters_exact_when_k_covers_distinct(ray_session):
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import heavy_hitters

    vals = [1] * 50 + [2] * 30 + [3] * 15 + [4] * 5
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    out = heavy_hitters(ds, "v", k=16).to_pandas()
    assert dict(zip(out["value"], out["est_count"])) == {1: 50, 2: 30, 3: 15, 4: 5}
    # sorted by est_count desc
    assert list(out["est_count"]) == sorted(out["est_count"], reverse=True)


def test_heavy_hitters_error_bound_and_no_miss(ray_session):
    """Approximate regime: every estimate is within [c - n/(k+1), c]
    and every TRUE heavy hitter (count > n/(k+1)) survives."""
    import numpy as np
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import heavy_hitters

    rng = np.random.Generator(np.random.PCG64(7))
    # Zipf-ish: few dominant values + a long tail of singletons
    head = np.repeat(np.arange(5), [4000, 2500, 1200, 700, 400])
    tail = rng.integers(1000, 9000, size=3000)
    vals = np.concatenate([head, tail])
    rng.shuffle(vals)
    n, k = len(vals), 32
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})).repartition(8)
    out = heavy_hitters(ds, "v", k=k).to_pandas()
    true = {}
    for v in vals:
        true[int(v)] = true.get(int(v), 0) + 1
    est = dict(zip(out["value"].astype(int), out["est_count"].astype(int)))
    bound = n / (k + 1)
    for v, e in est.items():
        c = true[v]
        assert c - bound <= e <= c, (v, e, c, bound)
    for v, c in true.items():
        if c > bound:
            assert v in est, (v, c, bound)


def test_kll_sketch_certificate_and_exact_regime():
    import numpy as np

    from opentelemetry_collector_contrib_ray.stages.agg import _KLLSketch

    rng = np.random.default_rng(3)
    data = rng.integers(-10_000, 10_000, 50_000).astype(np.int64)

    # approximate regime: tiny k forces many compactions; every
    # reported quantile must honor the sketch's OWN error certificate
    s = _KLLSketch(k=128)
    for chunk in np.array_split(data, 37):
        s.insert(chunk)
    assert s.budget > 0
    srt = np.sort(data)
    phis = [0.01, 0.25, 0.5, 0.9, 0.99]
    got = s.quantiles(phis)
    import math
    for q, v in zip(phis, got):
        target = max(math.ceil(q * len(data)) - 1, 0)
        lo = np.searchsorted(srt, v, side="left")
        hi = np.searchsorted(srt, v, side="right") - 1
        rank_err = 0 if lo <= target <= hi else min(abs(lo - target),
                                                    abs(hi - target))
        assert rank_err <= s.budget, (q, v, rank_err, s.budget)
    # certificate is meaningfully small for this config (k=128, n=50k)
    assert s.budget < 0.05 * len(data)

    # merge path preserves the certificate
    parts = [_KLLSketch(k=128) for _ in range(8)]
    for i, chunk in enumerate(np.array_split(data, 8)):
        parts[i].insert(chunk)
    m = parts[0]
    for p in parts[1:]:
        m.merge(p)
    for q, v in zip(phis, m.quantiles(phis)):
        target = max(math.ceil(q * len(data)) - 1, 0)
        lo = np.searchsorted(srt, v, side="left")
        hi = np.searchsorted(srt, v, side="right") - 1
        rank_err = 0 if lo <= target <= hi else min(abs(lo - target),
                                                    abs(hi - target))
        assert rank_err <= m.budget

    # exact regime: k ≥ n ⇒ budget 0 ⇒ quantile_disc equality
    e = _KLLSketch(k=1 << 17)
    e.insert(data)
    assert e.budget == 0
    for q, v in zip(phis, e.quantiles(phis)):
        assert v == srt[max(math.ceil(q * len(data)) - 1, 0)]


def test_kll_quantiles_dataset_roundtrip():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import kll_quantiles

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1_000_000, 20_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(9)
    out = kll_quantiles(ds, "v", {"p50": 0.5, "p95": 0.95},
                        k=1 << 16).to_pandas()
    srt = np.sort(vals)
    import math
    assert out.loc[0, "err_budget"] == 0
    assert out.loc[0, "p50"] == srt[max(math.ceil(0.5 * len(vals)) - 1, 0)]
    assert out.loc[0, "p95"] == srt[max(math.ceil(0.95 * len(vals)) - 1, 0)]
    # approximate run still returns certified-bounded answers
    out2 = kll_quantiles(ds, "v", {"p50": 0.5}, k=64).to_pandas()
    b = int(out2.loc[0, "err_budget"])
    assert b > 0
    target = max(math.ceil(0.5 * len(vals)) - 1, 0)
    r = np.searchsorted(srt, out2.loc[0, "p50"], side="left")
    assert abs(r - target) <= b


# ------------------------------------------------------ count-min sketch


def test_cms_overestimates_and_merge_invariance():
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.agg import cms_frequency

    keys = ["click", "view", "purchase", "login", "logout",
            "search", "scroll", "hover", "drag", "drop"]
    rng = np.random.default_rng(3)
    vals = rng.choice(keys, 5000,
                      p=np.array([20, 15, 5, 10, 10, 15, 10, 5, 5, 5]) / 100)
    t = pa.table({"k": pa.array(vals.tolist())})

    outs = []
    for nblocks in (1, 6):
        out = cms_frequency(rd.from_arrow(t).repartition(nblocks), "k",
                            depth=3, width=8).to_pandas()
        outs.append(out.sort_values("k").reset_index(drop=True))
    # merge = cell-wise sum => estimates identical under any split
    assert outs[0].equals(outs[1])
    df = outs[0]
    # CMS never underestimates; the small width forces visible collisions
    assert (df.cms_est >= df.exact_cnt).all()
    assert (df.cms_est > df.exact_cnt).any()
    # exact regime: width large enough that no buckets collide
    wide = cms_frequency(rd.from_arrow(t).repartition(4), "k",
                         depth=4, width=4096).to_pandas()
    assert (wide.cms_est == wide.exact_cnt).all()


def test_cms_query_keys_and_unseen_key():
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.agg import cms_frequency

    t = pa.table({"k": pa.array(["a"] * 7 + ["b"] * 3)})
    out = cms_frequency(rd.from_arrow(t), "k", depth=3, width=512,
                        query_keys=["a", "zzz"]).to_pandas()
    by = dict(zip(out["k"], out["cms_est"]))
    assert by["a"] == 7
    # unseen key prices to 0 unless it collides (width is big here)
    assert by["zzz"] == 0
    assert "exact_cnt" not in out.columns


# ------------------------------------------------- per-group top-N


def test_topn_per_group_exact_and_invariant():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.agg import topn_per_group

    rng = np.random.default_rng(7)
    n = 600
    df = pd.DataFrame({
        "g": rng.choice(list("abcdefgh"), n),
        "v": rng.integers(0, 40, n),     # plenty of ties
        "id": np.arange(n, dtype=np.int64),
    })
    want = (df.sort_values(["g", "v", "id"],
                           ascending=[True, False, True], kind="mergesort")
              .groupby("g").head(4))
    want = want.assign(rank=(want.groupby("g").cumcount() + 1))
    want = set(map(tuple, want[["g", "v", "id", "rank"]].to_numpy()))

    for nblocks in (1, 9):
        ds = rd.from_pandas(df).repartition(nblocks)
        for compact in (False, True):
            out = topn_per_group(ds, ["g"], "v", 4, tie_cols=["id"],
                                 num_partitions=8,
                                 compact=compact).to_pandas()
            got = set(map(tuple, out[["g", "v", "id", "rank"]].to_numpy()))
            assert got == want


def test_topn_per_group_ascending_and_small_groups():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.agg import topn_per_group

    df = pd.DataFrame({"g": ["x", "x", "y"], "v": [5, 3, 9],
                       "id": [0, 1, 2]})
    out = topn_per_group(rd.from_pandas(df), ["g"], "v", 2,
                         tie_cols=["id"], descending=False).to_pandas()
    out = out.sort_values(["g", "rank"]).reset_index(drop=True)
    # ascending order; group smaller than N keeps all rows
    assert out[["g", "v", "rank"]].values.tolist() == [
        ["x", 3, 1], ["x", 5, 2], ["y", 9, 1]]


def test_hash_groupby_sum_matches_pandas():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.agg import hash_groupby_sum

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"k1": rng.choice(list("abc"), 500),
                       "k2": rng.integers(0, 50, 500),
                       "v": rng.integers(-5, 100, 500)})
    want = df.groupby(["k1", "k2"], as_index=False)["v"].sum()
    want = want.rename(columns={"v": "total"})
    for nblocks in (1, 7):
        out = hash_groupby_sum(rd.from_pandas(df).repartition(nblocks),
                               ["k1", "k2"], "v", out_col="total",
                               num_partitions=8).to_pandas()
        got = out.sort_values(["k1", "k2"]).reset_index(drop=True)
        assert got.equals(want.sort_values(["k1", "k2"]).reset_index(drop=True))


# --------------------------------------------- metrics generation


def test_metrics_generation_rules():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metricsgen import (
        MetricsGenRule,
        metrics_generation,
    )

    t = pa.table({"a": pa.array([10, 0, 7], pa.int64()),
                  "b": pa.array([4, 5, 0], pa.int64())})
    out = metrics_generation(rd.from_arrow(t), [
        MetricsGenRule("s", metric1="a", metric2="b", operation="add"),
        MetricsGenRule("d", metric1="a", metric2="b", operation="subtract"),
        MetricsGenRule("m", metric1="a", metric2="b", operation="multiply"),
        MetricsGenRule("q", metric1="a", metric2="b", operation="divide",
                       ratio_scale=100),
        MetricsGenRule("p", metric1="a", metric2="b", operation="percent",
                       ratio_scale=1),
        MetricsGenRule("x", type="scale", metric1="a", scale_by=3),
    ]).to_pandas()
    assert out["s"].tolist() == [14, 5, 7]
    assert out["d"].tolist() == [6, -5, 7]
    assert out["m"].tolist() == [40, 0, 0]
    # divide: (a*100)//b, NULL when b == 0 (reference skip-on-zero)
    assert out["q"][0] == 250 and out["q"][1] == 0 and pd.isna(out["q"][2])
    assert out["p"][0] == 250 and pd.isna(out["p"][2])
    assert out["x"].tolist() == [30, 0, 21]


def test_running_total_matches_pandas_window():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.windows import running_total

    rng = np.random.default_rng(4)
    n = 400
    df = pd.DataFrame({
        "k": rng.choice(list("abcde"), n),
        "t": rng.integers(0, 50, n),          # duplicate timestamps
        "id": np.arange(n, dtype=np.int64),   # ...made total by id
        "v": rng.integers(-10, 100, n),
    })
    want = df.sort_values(["k", "t", "id"], kind="mergesort")
    want = want.assign(run=want.groupby("k")["v"].cumsum())
    want = want.set_index("id")["run"]
    for nblocks in (1, 6):
        out = running_total(rd.from_pandas(df).repartition(nblocks),
                            ["k"], ["t", "id"], "v", out_col="run",
                            num_partitions=8).to_pandas()
        got = out.set_index("id")["run"]
        assert got.sort_index().equals(want.sort_index())


# --------------------------------------------- metrics transform


def _mt_table():
    return pa.table({
        "metric": pa.array(["req_total", "req_total", "err_total",
                            "err_total"]),
        "svc": pa.array(["a", "b", "a", "b"]),
        "state": pa.array(["idle", "user", "idle", "system"]),
        "value": pa.array([10, 20, 1, 2], pa.int64()),
    })


def test_metricstransform_row_local_ops():
    from opentelemetry_collector_contrib_ray.stages.metricstransform import (
        MetricsTransform,
        apply_row_local,
    )

    t = _mt_table()
    # strict + regexp ($1) metric renames
    out = apply_row_local(t, [
        MetricsTransform("rename_metric", include="req_total",
                         new_name="requests_total"),
        MetricsTransform("rename_metric", include=r"^(err)_total$",
                         match_type="regexp", new_name="$1ors_total"),
    ])
    assert out["metric"].to_pylist() == [
        "requests_total", "requests_total", "errors_total", "errors_total"]

    # label-key rename (match-all drops the old column)
    out = apply_row_local(t, [
        MetricsTransform("rename_label_key", include=".*",
                         match_type="regexp", label="state",
                         new_label="cpu_state")])
    assert "state" not in out.column_names
    assert out["cpu_state"].to_pylist() == ["idle", "user", "idle", "system"]

    # label-value rename scoped to one metric
    out = apply_row_local(t, [
        MetricsTransform("rename_label_values", include="req_total",
                         label="state", value_map={"idle": "-"})])
    assert out["state"].to_pylist() == ["-", "user", "idle", "system"]

    # delete datapoints / add label / scale scoped by the include filter
    out = apply_row_local(t, [
        MetricsTransform("delete_datapoints", include="err_total",
                         label="state", label_value="idle"),
        MetricsTransform("add_label", include=".*", match_type="regexp",
                         new_label="ident", label_value="1"),
        MetricsTransform("scale_value", include="req_total", scale=1000),
    ])
    assert out.num_rows == 3
    assert out["ident"].to_pylist() == ["1", "1", "1"]
    assert out["value"].to_pylist() == [10000, 20000, 2]


def test_metricstransform_aggregates_and_combine():
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metricstransform import (
        MetricsTransform,
        metrics_transform,
    )

    ds = rd.from_arrow(_mt_table()).repartition(3)
    # aggregate_label_values: user+system → used (summed), then
    # aggregate_labels drops svc, then combine keeps the old name
    out = metrics_transform(ds, [
        MetricsTransform("aggregate_label_values", include=".*",
                         match_type="regexp", label="state",
                         merge_values=["user", "system"],
                         merged_value="used",
                         keep_labels=["svc", "state"]),
        MetricsTransform("aggregate_labels", include=".*",
                         match_type="regexp", keep_labels=["state"]),
        MetricsTransform("combine", include=r"^.*_total$",
                         match_type="regexp", new_name="all_total",
                         new_label="orig"),
    ]).to_pandas().sort_values(["orig", "state"]).reset_index(drop=True)
    assert out["metric"].unique().tolist() == ["all_total"]
    rows = {(r.orig, r.state): r.value for r in out.itertuples()}
    assert rows == {("err_total", "idle"): 1, ("err_total", "used"): 2,
                    ("req_total", "idle"): 10, ("req_total", "used"): 20}


def test_metricstransform_selective_aggregate_labels_rejected():
    import pytest as _pytest
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metricstransform import (
        MetricsTransform,
        metrics_transform,
    )

    with _pytest.raises(ValueError):
        metrics_transform(rd.from_arrow(_mt_table()), [
            MetricsTransform("aggregate_labels", include="req_total",
                             keep_labels=["svc"])])


# --------------------------------------------- KMV / theta sketches


def test_kmv_exact_regime_equals_set_algebra():
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.kmv import (
        kmv_set_ops,
        kmv_sketches,
    )

    rows = [{"g": "a", "id": i} for i in range(500)] + \
           [{"g": "b", "id": i} for i in range(300, 900)]
    k = 1 << 14
    for nblocks in (1, 7):
        sk = kmv_sketches(rd.from_items(rows).repartition(nblocks),
                          "g", "id", k)
        ops = kmv_set_ops(sk["a"], sk["b"], k)
        assert ops == {"n_a": 500, "n_b": 600, "n_union": 900,
                       "n_intersect": 200, "n_a_only": 300}
        # merge is partitioning-invariant
        assert sk["a"].tolist() == kmv_sketches(
            rd.from_items(rows).repartition(3), "g", "id", k)["a"].tolist()


def test_kmv_saturated_estimates_within_bounds():
    import numpy as np
    from opentelemetry_collector_contrib_ray.stages.kmv import (
        _hash_ids,
        _k_smallest,
        kmv_estimate,
        kmv_set_ops,
    )

    k = 512
    n_a, n_b, overlap = 20_000, 15_000, 8_000
    a_ids = np.arange(n_a, dtype=np.int64)
    b_ids = np.arange(n_a - overlap, n_a - overlap + n_b, dtype=np.int64)
    a = _k_smallest(_hash_ids(a_ids), k)
    b = _k_smallest(_hash_ids(b_ids), k)
    assert abs(kmv_estimate(a, k) - n_a) / n_a < 0.15
    ops = kmv_set_ops(a, b, k)
    assert abs(ops["n_union"] - (n_a + n_b - overlap)) / (n_a + n_b - overlap) < 0.15
    assert abs(ops["n_intersect"] - overlap) / overlap < 0.30
    assert ops["n_a"] + ops["n_b"] >= ops["n_union"]


def test_pivot_counts_and_sums():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.agg import pivot_counts

    df = pd.DataFrame({
        "k": ["a", "a", "b", "b", "b", "a"],
        "t": ["x", "y", "x", "x", "z", "zz"],  # 'zz' not in the set
        "v": [1, 2, 3, 4, 5, 6],
    })
    for nblocks in (1, 4):
        ds = rd.from_pandas(df).repartition(nblocks)
        out = pivot_counts(ds, "k", "t", ["x", "y"]).to_pandas() \
            .set_index("k").sort_index()
        assert out.loc["a"].tolist() == [1, 1, 3]    # n_x, n_y, total
        assert out.loc["b"].tolist() == [2, 0, 3]
        sums = pivot_counts(ds, "k", "t", ["x", "y"], value_col="v",
                            total_alias="sum_v").to_pandas() \
            .set_index("k").sort_index()
        assert sums.loc["a"].tolist() == [1, 2, 9]
        assert sums.loc["b"].tolist() == [7, 0, 12]


def test_weighted_sample_matches_bruteforce_and_prefers_heavy():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.agg import topn_per_group

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "w": rng.integers(1, 1000, n).astype(np.int64)})
    h = (df.id.to_numpy().astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(2**32)
    prio = (h.astype(np.int64) * 1_000_000) // df.w.to_numpy()
    df["prio"] = prio
    df["g"] = 0
    k = 50
    want = df.nsmallest(k, ["prio", "id"]).id.tolist()
    for nblocks in (1, 6):
        out = topn_per_group(rd.from_pandas(df).repartition(nblocks),
                             ["g"], "prio", k, tie_cols=["id"],
                             descending=False, compact=True).to_pandas()
        assert sorted(out.id.tolist()) == sorted(want)
    # heavier rows are overrepresented: mean weight of winners > pop mean
    assert df[df.id.isin(want)].w.mean() > 1.25 * df.w.mean()


def test_grouped_ols_matches_numpy_polyfit():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.agg import (
        grouped_corr_components,
    )
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        _trunc_div,
    )

    rng = np.random.default_rng(31)
    n = 2000
    g = rng.choice(["a", "b"], n)
    x = rng.integers(0, 24, n).astype(np.int64)
    noise = rng.integers(-50, 50, n)
    y = np.where(g == "a", 300 + 17 * x, 900 - 23 * x) + noise
    t = pa.table({"g": g.tolist(), "x": x, "y": y.astype(np.int64)})
    comp = grouped_corr_components(
        rd.from_arrow(t).repartition(4), ["g"], "x", "y").to_pandas() \
        .set_index("g")
    for grp, true_slope in (("a", 17), ("b", -23)):
        c = comp.loc[grp]
        num = int(c.n) * int(c.sum_xy) - int(c.sum_x) * int(c.sum_y)
        den = int(c.n) * int(c.sum_xx) - int(c.sum_x) ** 2
        slope = _trunc_div(1_000_000 * num, den)
        m = g == grp
        ref = np.polyfit(x[m].astype(float), y[m].astype(float), 1)[0]
        assert abs(slope / 1e6 - ref) < 1e-6
        assert abs(slope / 1e6 - true_slope) < 1.0  # recovers the signal
    # trunc-div parity with DuckDB's // on negatives
    assert _trunc_div(-7, 2) == -3 and _trunc_div(7, -2) == -3
    assert _trunc_div(7, 2) == 3 and _trunc_div(-7, -2) == 3


def test_basket_lift_matches_handcount(tmp_path):
    import os
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_basket_lift,
        _trunc_div,
    )

    # 4 baskets: {x,y}, {x}, {y,z}, {x,y,z}
    baskets = [(1, ["x", "y"]), (2, ["x"]), (3, ["y", "z"]),
               (4, ["x", "y", "z"])]
    rows = []
    eid = 0
    for u, types in baskets:
        for t in types:
            for _ in range(2):  # duplicates must not inflate support
                rows.append({"event_id": eid, "user_id": u,
                             "ts": pd.Timestamp("2026-01-01") +
                             pd.Timedelta(seconds=eid),
                             "event_type": t, "value": 1.0})
                eid += 1
    df = pd.DataFrame(rows)
    tmp = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp, "events.parquet"))
    out = q_events_basket_lift(tmp).to_pandas()
    got = {(r.ta, r.tb): (r.supp_ab, r.lift_e6) for r in out.itertuples()}
    supp = {"x": 3, "y": 3, "z": 2}
    want_pairs = {("x", "y"): 2, ("x", "z"): 1, ("y", "z"): 2}
    assert {k: v[0] for k, v in got.items()} == want_pairs
    for (a, b), s_ab in want_pairs.items():
        assert got[(a, b)][1] == _trunc_div(1_000_000 * 4 * s_ab,
                                            supp[a] * supp[b])


def _mt_pandas_reference(df, transforms):
    """Independent pandas interpreter of the metricstransform ops."""
    import pandas as pd

    df = df.copy()
    for tr in transforms:
        m = df.metric == tr.include if tr.match_type == "strict" else \
            df.metric.str.fullmatch(tr.include)
        if tr.action == "rename_metric":
            if tr.match_type == "strict":
                df.loc[m, "metric"] = tr.new_name
            else:
                import re as _re
                df.loc[m, "metric"] = df.loc[m, "metric"].map(
                    lambda s: _re.sub(
                        r"\$(\d+)",
                        lambda g: _re.fullmatch(tr.include, s).group(
                            int(g.group(1))) or "",
                        tr.new_name))
        elif tr.action == "add_label":
            df.loc[m, tr.new_label] = tr.label_value
        elif tr.action == "rename_label_values":
            for old, new in tr.value_map.items():
                df.loc[m & (df[tr.label] == old), tr.label] = new
        elif tr.action == "delete_datapoints":
            df = df[~(m & (df[tr.label] == tr.label_value))]
        elif tr.action == "scale_value":
            df.loc[m, "value"] = df.loc[m, "value"] * tr.scale
        elif tr.action == "aggregate_label_values":
            df.loc[m & df[tr.label].isin(tr.merge_values),
                   tr.label] = tr.merged_value
            keys = ["metric"] + tr.keep_labels
            df = df.groupby(keys, as_index=False, dropna=False)["value"] \
                .sum()
        elif tr.action == "aggregate_labels":
            keys = ["metric"] + tr.keep_labels
            df = df.groupby(keys, as_index=False, dropna=False)["value"] \
                .sum()
    return df


def test_metricstransform_random_chains_match_pandas_reference():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metricstransform import (
        MetricsTransform,
        metrics_transform,
    )

    rng = np.random.default_rng(41)
    for trial in range(6):
        n = 400
        df = pd.DataFrame({
            "metric": rng.choice(["m_a", "m_b", "m_c"], n),
            "svc": rng.choice(["s1", "s2", "s3"], n),
            "env": rng.choice(["dev", "prod"], n),
            "value": rng.integers(1, 100, n).astype(np.int64),
        })
        chain = [
            MetricsTransform("rename_metric", include="m_a",
                             new_name="metric_a"),
            MetricsTransform("rename_label_values", include=".*",
                             match_type="regexp", label="env",
                             value_map={"dev": "development"}),
            MetricsTransform("delete_datapoints", include="m_b",
                             label="svc", label_value="s3"),
            MetricsTransform("scale_value", include="m_c",
                             scale=int(rng.integers(2, 9))),
            MetricsTransform("aggregate_label_values", include=".*",
                             match_type="regexp", label="svc",
                             merge_values=["s1", "s2"], merged_value="s12",
                             keep_labels=["svc", "env"]),
            MetricsTransform("add_label", include=".*",
                             match_type="regexp", new_label="region",
                             label_value="r1"),
            MetricsTransform("aggregate_labels", include=".*",
                             match_type="regexp",
                             keep_labels=["svc", "region"]),
        ]
        got = metrics_transform(
            rd.from_pandas(df).repartition(int(rng.integers(1, 7))),
            chain).to_pandas()
        want = _mt_pandas_reference(df, chain)
        cols = ["metric", "svc", "region", "value"]
        g = got[cols].sort_values(cols[:-1]).reset_index(drop=True)
        w = want[cols].sort_values(cols[:-1]).reset_index(drop=True)
        g["value"] = g["value"].astype("int64")
        w["value"] = w["value"].astype("int64")
        assert g.equals(w), trial


def test_exp_weighted_lag_hand_and_pandas():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.windows import exp_weighted_lag

    # hand case, depth 2: weights current=2, prev=1
    df = pd.DataFrame({"k": ["a", "a", "a", "b"],
                       "t": [1, 2, 3, 1],
                       "id": [0, 1, 2, 3],
                       "v": [5, 7, 1, 9]})
    out = (exp_weighted_lag(rd.from_pandas(df), ["k"], ["t", "id"], "v",
                            depth=2, num_partitions=4)
           .to_pandas().set_index("id")["ew_num"].sort_index())
    # a: 2*5, 2*7+5, 2*1+7 ; b: 2*9 (no bleed from stream a)
    assert out.tolist() == [10, 19, 9, 18]

    # randomized vs a pandas lag-window reference, parallelism-invariant
    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "k": rng.choice(list("abcdefg"), n),
        "t": rng.integers(0, 40, n),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 1000, n),
    })
    depth = 8
    s = df.sort_values(["k", "t", "id"], kind="mergesort")
    acc = pd.Series(np.zeros(len(s), dtype=np.int64), index=s.index)
    for j in range(depth):
        lag = s.groupby("k")["v"].shift(j).fillna(0).astype(np.int64)
        acc += lag * (1 << (depth - 1 - j))
    want = acc.sort_index()  # df.index == id, so this is by-id order
    for nblocks in (1, 5):
        out = (exp_weighted_lag(rd.from_pandas(df).repartition(nblocks),
                                ["k"], ["t", "id"], "v", depth=depth,
                                num_partitions=8)
               .to_pandas().set_index("id")["ew_num"].sort_index())
        assert out.tolist() == want.tolist()


def test_cube_agg_matches_pandas_all_sets():
    import itertools
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.agg import cube_agg

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({"a": rng.choice(list("xyz"), n),
                       "b": rng.choice(list("pq"), n),
                       "c": rng.choice(list("mn"), n),
                       "v": rng.integers(0, 100, n)})
    keys = ["a", "b", "c"]

    def ref():
        outs = []
        for r in range(len(keys) + 1):
            for sub in itertools.combinations(keys, r):
                g = (df.groupby(list(sub))["v"].agg(["size", "sum"])
                     .reset_index() if sub else
                     pd.DataFrame({"size": [n], "sum": [df["v"].sum()]}))
                for k in keys:
                    if k not in sub:
                        g[k] = "*"
                outs.append(g[keys + ["size", "sum"]])
        out = pd.concat(outs, ignore_index=True)
        return out.rename(columns={"size": "n", "sum": "total"}) \
                  .astype({"n": "int64", "total": "int64"})

    want = ref().sort_values(keys).reset_index(drop=True)
    for nblocks in (1, 6):
        got = (cube_agg(rd.from_pandas(df).repartition(nblocks), keys,
                        sum_col="v")
               .to_pandas().sort_values(keys).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[keys + ["n", "total"]].astype({"n": "int64", "total": "int64"}),
            want)


def test_histogram_drift_hand_and_identical_zero():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.drift import histogram_drift

    # g: d1 bins [2,0], d2 bins [1,1] -> na=2 nb=2, tvd=|2*2-1*2|+|0*2-1*2|=4
    # exact TVD = 4 / (2*2*2) = 0.5, correct for (1,0) vs (.5,.5)
    df = pd.DataFrame({"g": ["g"] * 4,
                       "p": ["d1", "d1", "d2", "d2"],
                       "bin": [0, 0, 0, 1]})
    out = histogram_drift(rd.from_pandas(df).repartition(2),
                          "g", "p", "bin", n_bins=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["prev_period"], r["p"], r["na"], r["nb"], r["tvd_num"]) == \
        ("d1", "d2", 2, 2, 4)

    # identical distributions at different totals -> zero drift
    df2 = pd.DataFrame({"g": ["g"] * 9,
                        "p": ["d1"] * 3 + ["d2"] * 6,
                        "bin": [0, 0, 1] + [0, 0, 0, 0, 1, 1]})
    out2 = histogram_drift(rd.from_pandas(df2), "g", "p", "bin",
                           n_bins=2).to_pandas()
    assert out2["tvd_num"].tolist() == [0]

    # three periods -> two adjacent pairs, single-period group ignored
    df3 = pd.DataFrame({"g": ["a"] * 3 + ["b"],
                        "p": ["d1", "d2", "d3", "d1"],
                        "bin": [0, 1, 0, 0]})
    out3 = (histogram_drift(rd.from_pandas(df3), "g", "p", "bin", n_bins=2)
            .to_pandas().sort_values("p"))
    assert out3["g"].tolist() == ["a", "a"]
    assert out3["tvd_num"].tolist() == [2, 2]


def test_expectations_report_rules_and_null_semantics():
    """NULLs fail in_range/in_set/matches; uniqueness counts exact
    duplicates across blocks; passed flag only when zero failures."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.expectations import (
        expectations_report,
    )

    df = pd.DataFrame({
        "id": [1, 2, 2, 3, 4, 4],             # dups: 2 and 4 -> 2 failed
        "v": [1.0, 5.0, None, -1.0, 2.0, 3.0],  # null + (-1) fail [0,4)->... 5.0 also fails
        "s": ["a", "b", None, "a", "z", "a"],  # in_set {a,b}: None+z fail
    })
    rules = [
        {"name": "v_range", "kind": "in_range", "col": "v",
         "lo": 0.0, "hi": 4.0},
        {"name": "s_enum", "kind": "in_set", "col": "s", "values": ["a", "b"]},
        {"name": "s_not_null", "kind": "not_null", "col": "s"},
        {"name": "id_unique", "kind": "unique", "col": "id"},
    ]
    out = (expectations_report(rd.from_pandas(df).repartition(3), rules,
                               num_partitions=4)
           .to_pandas().set_index("rule"))
    assert out.loc["v_range", "n_failed"] == 3      # 5.0, None, -1.0
    assert out.loc["s_enum", "n_failed"] == 2       # None, z
    assert out.loc["s_not_null", "n_failed"] == 1
    assert out.loc["id_unique", "n_failed"] == 2
    assert (out["n_checked"] == 6).all()
    assert out["passed"].tolist() == [0, 0, 0, 0]


def test_exponential_histogram_boundaries():
    """Power-of-2 boundary cents land in the LOWER-INCLUSIVE bucket;
    zero and negative go to bucket -1; sums are exact."""
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.agg import (
        exponential_histogram,
    )

    # cents: floor(v*100 + 0.5)
    vals = [0.0,      # 0      -> bucket -1
            -0.5,     # -50    -> bucket -1
            0.01,     # 1      -> bucket 0  [1,2)
            0.02,     # 2      -> bucket 1  [2,4)
            0.03,     # 3      -> bucket 1
            0.04,     # 4      -> bucket 2  [4,8)
            10.24,    # 1024   -> bucket 10 boundary-exact
            10.23]    # 1023   -> bucket 9
    df = pd.DataFrame({"k": ["a"] * len(vals), "v": vals})
    out = (exponential_histogram(rd.from_pandas(df).repartition(3), "k", "v")
           .to_pandas().set_index("bucket").sort_index())
    assert out.loc[-1, "n"] == 2 and out.loc[-1, "sum_cents"] == -50
    assert out.loc[0, "n"] == 1
    assert out.loc[1, "n"] == 2 and out.loc[1, "sum_cents"] == 5
    assert out.loc[2, "n"] == 1
    assert out.loc[9, "n"] == 1 and out.loc[9, "sum_cents"] == 1023
    assert out.loc[10, "n"] == 1 and out.loc[10, "sum_cents"] == 1024


def test_rfm_cross_block_user_merge():
    """A user whose purchases span blocks must merge max/count/sum
    BEFORE scoring — per-block scoring would double-count the user."""
    import pandas as pd
    import pyarrow.parquet as pq
    import tempfile, os
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_users_rfm_segments,
    )

    base = pd.Timestamp("2024-01-28")
    # one user, 3 purchases (f=3), 350.00 total (m=3), 4 days recency (r=3)
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [7, 7, 7],
        "ts": [base, base, base],
        "event_type": ["purchase"] * 3,
        "value": [100.0, 150.0, 100.0],
        "props": ["{}"] * 3,
    })
    d = tempfile.mkdtemp(prefix="rfm_", dir="/tmp")
    # two row groups -> two read blocks
    pq.write_table(
        __import__("pyarrow").Table.from_pandas(df, preserve_index=False),
        os.path.join(d, "events.parquet"), row_group_size=2)
    out = q_users_rfm_segments(d).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.r_score, row.f_score, row.m_score, row.n_users) == (3, 3, 3, 1)


def test_srm_check_distinct_users_and_alarm():
    """Repeated events by one user count once; a forced imbalance
    alarms, a balanced split does not."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_srm_check,
    )

    # type 'bal': users 0..9 (5 even / 5 odd), duplicates included
    # type 'skew': 30 even users vs 2 odd -> (28)^2=784 > 4*32=128
    rows = [("bal", u) for u in range(10)] + [("bal", 0)] * 5
    rows += [("skew", 2 * u) for u in range(30)] + [("skew", 1), ("skew", 3)]
    df = pd.DataFrame(rows, columns=["event_type", "user_id"])
    d = tempfile.mkdtemp(prefix="srm_", dir="/tmp")
    pq.write_table(pa.Table.from_pandas(
        df.assign(ts=pd.Timestamp("2024-01-01"), event_id=range(len(df)),
                  value=0.0, props="{}"), preserve_index=False),
        os.path.join(d, "events.parquet"))
    out = q_events_srm_check(d).to_pandas().set_index("event_type")
    assert (out.loc["bal", "n0"], out.loc["bal", "n1"]) == (5, 5)
    assert out.loc["bal", "srm_alarm"] == 0
    assert (out.loc["skew", "n0"], out.loc["skew", "n1"]) == (30, 2)
    assert out.loc["skew", "srm_alarm"] == 1


def test_grouped_trimmed_sum_hand_and_boundary():
    """Trimmed sum pins: multiplicity-aware partial takes at the
    crossing value, k = n*num//den per group, all-trimmed edge."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import grouped_trimmed_sum

    # group A: values 1,1,1,2,3,9,9 (n=7); trim 2/7 each side → k=2:
    # drop two 1s and two 9s → trimmed = 1+2+3 = 6
    # group B: n=2, k = 2·2//7 = 0 → untouched
    vals = [("A", v) for v in [9, 1, 2, 1, 9, 3, 1]] + [("B", 5), ("B", 6)]
    t = pa.table({"g": [g for g, _ in vals], "v": [v for _, v in vals]})
    out = (grouped_trimmed_sum(rd.from_arrow(t), "g", "v",
                               trim_num=2, trim_den=7, num_partitions=4)
           .to_pandas().set_index("g"))
    assert out.loc["A"].tolist() == [7, 2, 26, 6]
    assert out.loc["B"].tolist() == [2, 0, 11, 11]
    # all-trimmed edge: trim 1/2 of n=2 → k=1, 2k>=n → trimmed 0
    out3 = (grouped_trimmed_sum(rd.from_arrow(
                pa.table({"g": ["D", "D"], "v": [5, 6]})),
            "g", "v", trim_num=1, trim_den=2, num_partitions=2)
            .to_pandas().set_index("g"))
    assert out3.loc["D"].tolist() == [2, 1, 11, 0]
    # k=0 passthrough: trim 0/20 of 3 values
    out2 = (grouped_trimmed_sum(rd.from_arrow(
                pa.table({"g": ["C"] * 3, "v": [4, 5, 6]})),
            "g", "v", trim_num=1, trim_den=20, num_partitions=2)
            .to_pandas().set_index("g"))
    assert out2.loc["C"].tolist() == [3, 0, 15, 15]


def test_grouped_ks_statistic_hand():
    """KS numerator vs scipy-style direct computation on a hand case:
    A = {1,2,3}, B = {3,4} → ECDF gaps at pooled values: v=1: |1·2−0·3|=2,
    v=2: |2·2−0|=4, v=3: |3·2−1·3|=3, v=4: |6−6|=0 → d_num=4 (n1=3,n2=2,
    true D = 4/6 = 2/3). One-sided group (all grp=0) → d_num = c1·0 = 0."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import grouped_ks_statistic

    t = pa.table({
        "g": ["x"] * 5 + ["solo"] * 2,
        "s": [0, 0, 0, 1, 1, 0, 0],
        "v": [1, 2, 3, 3, 4, 7, 8],
    })
    out = (grouped_ks_statistic(rd.from_arrow(t), "g", "s", "v",
                                num_partitions=4)
           .to_pandas().set_index("g"))
    assert out.loc["x"].tolist() == [3, 2, 4]
    assert out.loc["solo"].tolist() == [2, 0, 0]


def test_grouped_emd_to_global_hand():
    """EMD numerator vs direct computation: groups A={1,1,3}, B={2}.
    Pooled support {1,2,3}, N=4, cc_all=[2,3,4].
    A (n=3): cc_g at support = [2,2,3] → |2·4−2·3|+|2·4−3·3|+|3·4−4·3|
      = 2+1+0 = 3.
    B (n=1): cc_g = [0,1,1] → |0−2|+|4−3|+|4−4| = 3."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import grouped_emd_to_global

    t = pa.table({"g": ["A", "A", "A", "B"], "v": [1, 1, 3, 2]})
    out = (grouped_emd_to_global(rd.from_arrow(t), "g", "v",
                                 num_partitions=4)
           .to_pandas().set_index("g"))
    assert out.loc["A"].tolist() == [3, 3, 3]
    assert out.loc["B"].tolist() == [1, 3, 3]
    # identical-distribution group → zero distance
    t2 = pa.table({"g": ["X"] * 2 + ["Y"] * 4, "v": [1, 2, 1, 2, 1, 2]})
    out2 = (grouped_emd_to_global(rd.from_arrow(t2), "g", "v",
                                  num_partitions=2)
            .to_pandas().set_index("g"))
    assert out2.loc["X", "emd_num"] == 0 and out2.loc["Y", "emd_num"] == 0


def test_autocorr_adjacency_gap_breaks_pairs(tmp_path):
    """events_autocorr pairs only STRICTLY adjacent hours — a gap hour
    breaks the chain — and single-hour types emit no row; driven
    through the real query against a parquet fixture."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    us = 3_600_000_000
    rows = []
    for h, c in [(0, 2), (1, 3), (2, 1), (4, 5)]:
        rows += [("A", h)] * c
    rows += [("B", 9)] * 4
    t = pa.table({
        "event_type": [g for g, _ in rows],
        "ts": pa.array([h * us + i for i, (_, h) in enumerate(rows)],
                       type=pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = Q.QUERIES["events_autocorr"](str(tmp_path)).to_pandas()
    out = out.set_index("event_type")
    # A: adjacent pairs (2,3),(3,1); the 2->4 gap breaks; B: no pairs
    assert out.loc["A"].tolist() == [2, 5, 4, 13, 10, 9]
    assert "B" not in out.index


def test_type_trigrams_and_twa_hand(tmp_path):
    """Trigrams never span users; TWA weights each reading by the gap
    to the NEXT same-type event (last reading weightless)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    us = 1_000_000
    t = pa.table({
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id": [1, 1, 1, 1, 2, 2],
        "event_type": ["view", "click", "purchase", "view", "click", "view"],
        "ts": pa.array([0, 10 * us, 30 * us, 60 * us, 5 * us, 25 * us],
                       type=pa.timestamp("us")),
        "value": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
    })
    pq.write_table(t, tmp_path / "events.parquet")

    tri = Q.QUERIES["events_type_trigrams"](str(tmp_path)).to_pandas()
    got = {(r.t1, r.t2, r.t3): r.n for r in tri.itertuples()}
    # user 1 sequence: view click purchase view → 2 trigrams; user 2 has
    # only 2 events → none (no cross-user trigram)
    assert got == {("view", "click", "purchase"): 1,
                   ("click", "purchase", "view"): 1}

    twa = (Q.QUERIES["events_twa_value"](str(tmp_path))
           .to_pandas().set_index("event_type"))
    # view readings: (ts0,100c)->(ts60) gap... per TYPE order:
    # view events at ts 0(100c,u1), 25(3200c,u2), 60(800c,u1):
    #   gaps 25,35; last weightless → sum_wv=100*25+3200*35=114500, w=60
    assert twa.loc["view"].tolist() == [100 * 25 + 3200 * 35, 60]
    # click at ts 5(1600c),10(200c): gap 5 → wv=1600*5, w=5
    assert twa.loc["click"].tolist() == [8000, 5]
    # purchase single event → absent
    assert "purchase" not in twa.index


def test_grouped_mode_tie_and_counts():
    """Mode pins: highest multiplicity wins, count-ties resolve to the
    SMALLEST value, n_rows is the full group size, cross-block counts
    merge before the argmax."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import grouped_mode

    vals = ([("A", 7)] * 3 + [("A", 2)] * 3 + [("A", 9)]      # tie 7/2 → 2
            + [("B", 5), ("B", 5), ("B", 1)])                  # clear mode 5
    t = pa.table({"g": [g for g, _ in vals],
                  "v": pa.array([v for _, v in vals], pa.int64())})
    out = (grouped_mode(rd.from_arrow(t).repartition(4), "g", "v",
                        num_partitions=4).to_pandas().set_index("g"))
    assert out.loc["A"].tolist() == [2, 3, 7]   # mode_value, n_mode, n_rows
    assert out.loc["B"].tolist() == [5, 2, 3]


def test_randomized_response_debias_and_flip_positions():
    """Randomized response pins: the flip set is exactly
    {hash(id) % 4 == 0}, n_reported counts the noised bit, and
    est_num = 4·n_reported − n debiases (est_num/2 ≈ true count)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.privacy import (
        randomized_response_counts,
    )

    ids = np.arange(1, 401, dtype=np.int64)
    true = (ids % 3 == 0)
    t = pa.table({"g": ["x"] * 400, "id": ids, "b": true})
    out = randomized_response_counts(
        rd.from_arrow(t).repartition(4), group_col="g", true_col="b",
        hash_col="id", flip_mod=4).to_pandas()
    flip = ((ids * 2654435761) % 4294967296) % 4 == 0
    reported = int(np.sum(true ^ flip))
    assert out.loc[0, "n"] == 400
    assert out.loc[0, "n_reported"] == reported
    assert out.loc[0, "est_num"] == 4 * reported - 400
    # the estimator halves to ~the true count (133) within noise
    assert abs((4 * reported - 400) / 2 - int(true.sum())) <= 25


def test_fd_audit_hand():
    """FD audit pins: held vs violated determinants, worst-case
    distinct-dependent count, rows-under-violation accounting."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import fd_audit

    t = pa.table({
        "det": ["A", "A", "B", "B", "C"],
        "dep": [1, 1, 1, 2, 3],
    })
    out = fd_audit(rd.from_arrow(t).repartition(2),
                   {"fwd": ("det", "dep"), "rev": ("dep", "det")}) \
        .to_pandas().set_index("fd")
    # fwd: A→{1} ok, B→{1,2} violated (2 rows), C→{3} ok
    assert out.loc["fwd"].tolist() == [3, 1, 2, 2]
    # rev: 1→{A,B} violated (3 rows), 2→{B} ok, 3→{C} ok
    assert out.loc["rev"].tolist() == [3, 1, 2, 3]


def test_grid_neighborhood_boundary_and_absent_cells():
    """Grid pins: corner cells truncate (no wraparound), the 3×3 sum
    includes self, and absent cells contribute 0 without emitting."""
    from opentelemetry_collector_contrib_ray.stages.agg import grid_neighborhood

    cells = pa.table({
        "cx": pa.array([0, 0, 1, 3], pa.int64()),
        "cy": pa.array([0, 1, 0, 3], pa.int64()),
        "n":  pa.array([5, 2, 7, 1], pa.int64())})
    out = grid_neighborhood(rd.from_arrow(cells), "cx", "cy", "n",
                            grid=4).to_pandas()
    got = {(r.cx, r.cy): r.nbr_events for r in out.itertuples()}
    # (0,0): neighbors within grid = (0,1)+(1,0)+self = 2+7+5 = 14
    # (3,3): isolated corner = 1; (1,0): 5+2+7 = 14; (0,1): 5+2+7 = 14
    assert got == {(0, 0): 14, (0, 1): 14, (1, 0): 14, (3, 3): 1}
    assert len(out) == 4


def test_funnel_strict_chaining_hand(ray_session, tmp_path):
    """Funnel pins: a click BEFORE the first view never counts; a
    later click after the view rescues the user (min-only combining
    would miss it); the purchase must strictly follow the QUALIFYING
    click; equal timestamps fail the strictly-greater rule."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    rows = []

    def ev(u, t_us, typ):
        rows.append((u, t_us, typ))

    # u1: full clean funnel
    ev(1, 100, "view"); ev(1, 200, "click"); ev(1, 300, "purchase")
    # u2: click before view + click after view → step2 at 250; purchase
    # at 240 precedes the QUALIFYING click → no step3
    ev(2, 50, "click"); ev(2, 100, "view"); ev(2, 250, "click")
    ev(2, 240, "purchase")
    # u3: click ties the view timestamp → strictly-greater fails step2
    ev(3, 100, "view"); ev(3, 100, "click"); ev(3, 500, "purchase")
    # u4: purchase only → not even step1
    ev(4, 10, "purchase")
    # u5: view only
    ev(5, 10, "view")

    df = pd.DataFrame(rows, columns=["user_id", "t_us", "event_type"])
    t = pa.table({
        "event_id": pa.array(np.arange(len(df), dtype=np.int64)),
        "ts": pa.array(df["t_us"].to_numpy(np.int64)).cast(
            pa.timestamp("us")),
        "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
        "event_type": pa.array(df["event_type"]),
        "value": pa.array(np.zeros(len(df))),
        "props": pa.array(["{}"] * len(df)),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "events.parquet")

    out = QUERIES["events_funnel_steps"](str(sf)).to_pandas()
    assert out.iloc[0]["n_step1"] == 4   # u1 u2 u3 u5
    assert out.iloc[0]["n_step2"] == 2   # u1, u2 (the 250 click)
    assert out.iloc[0]["n_step3"] == 1   # u1 only


def test_template_mining_masks_hand(ray_session, tmp_path):
    """Template pins: every digit RUN masks to one '#', non-digits
    survive, empty lines keep their own (empty) template, and counts
    fold across variable values."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import compact_groupby
    import pyarrow.compute as pc

    # use the same kernel the query uses, over a hand corpus
    lines = ["INFO latency_ms=42 status=200 msg=evt_click",
             "INFO latency_ms=7 status=503 msg=evt_click",
             "user9 logged in from 10.0.0.1",
             "user12 logged in from 10.9.8.7",
             ""]
    ds = rd.from_arrow(pa.table({"text": pa.array(lines)}))

    def mask(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        return pa.table({
            "template": pc.replace_substring_regex(txt, r"[0-9]+", "#"),
            "one": pa.array(np.ones(t.num_rows, np.int64)),
        })

    out = compact_groupby(ds.map_batches(mask, batch_format="pyarrow"),
                          ["template"], sum_cols={"one": "n"}).to_pandas()
    got = dict(zip(out["template"], out["n"]))
    assert got["INFO latency_ms=# status=# msg=evt_click"] == 2
    assert got["user# logged in from #.#.#.#"] == 2
    assert got[""] == 1
    assert len(got) == 3


def test_template_burst_calendar_window_hand(ray_session):
    """Burst pins: the window is CALENDAR hours (a gap hour counts 0,
    so a template returning after silence bursts — row-wise lag would
    miss it); the first hour bursts against an empty window; equal to
    prev3 is NOT a burst (strictly greater)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.agg import compact_groupby
    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    # reuse the query's burst fold on a hand-built (template, hour, n)
    rows = [("A", 0, 5),   # burst: empty window
            ("A", 1, 3),   # prev3 = 5 → no
            ("A", 2, 9),   # prev3 = 8 → burst
            ("A", 6, 1),   # hours 3,4,5 missing → prev3 = 0 → burst
            ("B", 10, 4),  # burst (first)
            ("B", 11, 4)]  # prev3 = 4, ties → NOT a burst
    t = pa.table({
        "template": pa.array([r[0] for r in rows]),
        "hour": pa.array([r[1] for r in rows], pa.int64()),
        "n": pa.array([r[2] for r in rows], pa.int64())})

    import pyarrow.compute as pc  # noqa: F401  (parity import)

    # drive through the same fold the query uses
    th = rd.from_arrow(t)
    out = None
    # replicate: call the module-level fold via the public query is
    # heavy; instead inline the identical computation
    df = t.to_pandas().sort_values(["template", "hour"])
    res = {}
    for tpl, g in df.groupby("template"):
        h = g["hour"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        csum = np.concatenate([[0], np.cumsum(n)])
        lo = np.searchsorted(h, h - 3, side="left")
        hi = np.searchsorted(h, h - 1, side="right")
        prev3 = csum[hi] - csum[lo]
        res[tpl] = (len(h), int((n > prev3).sum()), int(n.max()))
    assert res["A"] == (4, 3, 9)
    assert res["B"] == (2, 1, 4)


def test_dup_span_coverage_hand(ray_session):
    """Coverage pins: a 3-gram shared across docs flags in BOTH; a
    within-doc repeat collapses to one distinct gram; docs under 3
    words emit nothing."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES
    import pyarrow.parquet as pq
    import tempfile, os

    docs = [
        (1, "the cat sat on the mat"),        # grams incl "the cat sat"
        (2, "the cat sat quietly today"),     # shares "the cat sat"
        (3, "a wholly different sentence here"),
        (4, "too short"),                     # < 3 words → absent
        (5, "echo echo echo echo"),           # within-doc repeats
    ]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "text": pa.array([r[1] for r in docs])}),
            os.path.join(d, "documents.parquet"))
        out = QUERIES["docs_dup_span_coverage"](d).to_pandas()
    got = {r.doc_id: (r.n_grams, r.n_dup_grams)
           for r in out.itertuples()}
    assert 4 not in got
    assert got[1][0] == 4 and got[1][1] == 1    # "the cat sat" shared
    assert got[2][0] == 3 and got[2][1] == 1
    assert got[3] == (3, 0)
    assert got[5][0] == 1 and got[5][1] == 0    # repeats collapse


def test_curriculum_deciles_hand(ray_session, tmp_path):
    """Decile pins: rank-based shards are balanced by construction
    (12 docs → deciles of size 2,1,1,...), ties order by doc_id, and
    min/max bracket each shard exactly."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    # 12 docs with token counts 1..12 (doc_id descending so the
    # doc_id tie-break is visible only through determinism)
    texts = [" ".join(["w"] * k) for k in range(1, 13)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(12, dtype=np.int64)),
        "text": pa.array(texts)}),
        os.path.join(tmp_path, "documents.parquet"))
    out = (QUERIES["docs_curriculum_deciles"](str(tmp_path))
           .to_pandas().sort_values("decile").reset_index(drop=True))
    assert list(out["decile"]) == list(range(10))
    # ranks 1..12 → decile sizes: (r-1)*10//12 → 2,1,1,1,1,2,1,1,1,1
    assert list(out["n_docs"]) == [2, 1, 1, 1, 1, 2, 1, 1, 1, 1]
    assert out.loc[0, "min_tokens"] == 1 and out.loc[0, "max_tokens"] == 2
    assert out.loc[9, "min_tokens"] == 12 and out.loc[9, "max_tokens"] == 12
    assert out["n_docs"].sum() == 12
    assert out["sum_tokens"].sum() == sum(range(1, 13))


def test_k_anonymity_hand(ray_session, tmp_path):
    """k-anonymity pins: classes under k=5 count as violating with
    their ROW counts at risk; classes at exactly 5 are safe."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    rows = []
    # class A: 5 rows (safe, exactly k) — type=click hour=0 band=0
    rows += [("click", 0, 1.0)] * 5
    # class B: 2 rows (violating)
    rows += [("view", 0, 1.0)] * 2
    # class C: 1 row (violating)
    rows += [("error", 0, 1.0)]
    n = len(rows)
    base_us = 0
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, base_us, np.int64)).cast(
            pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array([r[0] for r in rows]),
        "value": pa.array([r[2] for r in rows]),
        "props": pa.array(["{}"] * n)}),
        os.path.join(tmp_path, "events.parquet"))
    out = QUERIES["events_k_anonymity_risk"](str(tmp_path)).to_pandas()
    assert out.iloc[0]["n_classes"] == 3
    assert out.iloc[0]["n_violating"] == 2
    assert out.iloc[0]["rows_at_risk"] == 3
    assert out.iloc[0]["n_rows"] == 8


def test_char_repeat_rate_hand(ray_session, tmp_path):
    """Repeat-rate pins: sum of squared codepoint counts is exact,
    repeats inflate sum_sq not n_distinct, non-ASCII codepoints count
    as single chars, empty docs are out of scope."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["aaab", "abcd", "", "héé"])}),
        os.path.join(tmp_path, "documents.parquet"))
    out = QUERIES["docs_char_repeat_rate"](str(tmp_path)).to_pandas()
    got = {r.doc_id: (r.n_chars, r.n_distinct_chars, r.sum_sq)
           for r in out.itertuples()}
    assert got[1] == (4, 2, 10)   # a:3² + b:1² = 10
    assert got[2] == (4, 4, 4)
    assert 3 not in got           # empty doc excluded
    assert got[4] == (3, 2, 5)    # h:1, é:2 → 1 + 4


def test_ngram_novelty_first_occurrence_hand(ray_session, tmp_path):
    """Novelty pins: a gram repeated in a later slice attributes its
    novelty ONLY to the earliest doc's slice; mentions count per
    slice regardless."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    # 10 docs → slice = doc_id (m=10). doc0 and doc9 share a gram.
    texts = ["alpha beta gamma"] + [f"u{i} v{i} w{i}" for i in range(1, 9)]
    texts.append("alpha beta gamma")    # doc 9 repeats doc 0's gram
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "text": pa.array(texts)}),
        os.path.join(tmp_path, "documents.parquet"))
    out = (QUERIES["docs_ngram_novelty_curve"](str(tmp_path))
           .to_pandas().set_index("slice"))
    assert out.loc[0, "n_new_grams"] == 1
    assert out.loc[0, "n_gram_mentions"] == 1
    assert out.loc[9, "n_new_grams"] == 0      # repeat → no novelty
    assert out.loc[9, "n_gram_mentions"] == 1  # but it IS a mention
    assert out["n_new_grams"].sum() == 9       # 9 distinct grams


def test_error_burn_rate_calendar_window_hand(ray_session, tmp_path):
    """Burn-rate pins: the 24h frame is CALENDAR (gap hours contribute
    0), the current hour is excluded from its own baseline, and both
    error and total sums track the same frame."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    rows = []  # (hour, type, count)
    rows += [(0, "click")] * 4 + [(0, "error")] * 1
    rows += [(1, "error")] * 2
    rows += [(30, "click")] * 3   # 29h gap: hour 1..24 frame empty
    n = len(rows)
    us = np.array([h * 3_600_000_000 for h, _ in rows], np.int64)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(us).cast(pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array([t for _, t in rows]),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n)}),
        os.path.join(tmp_path, "events.parquet"))
    out = (QUERIES["events_error_burn_rate"](str(tmp_path))
           .to_pandas().set_index("hour"))
    assert out.loc[0, "prev24_n"] == 0            # first hour: empty
    assert out.loc[1, "prev24_n"] == 5 and out.loc[1, "prev24_err"] == 1
    # hour 30: hours 6..29 in frame → only hour... 30-24=6..29: none
    assert out.loc[30, "prev24_n"] == 0
    assert out.loc[30, "n"] == 3 and out.loc[30, "n_err"] == 0


def test_changepoint_cusum_hand(ray_session, tmp_path):
    """CUSUM pins: a clean level shift localizes to the last day of
    the low regime (prefix-mean deviation peaks there); earliest day
    wins ties; the statistic is the exact integer N·C_k − K_k·T."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    # 6 days: value 1.00 on days 0-2, 5.00 on days 3-5 (one event/day)
    vals = [1.0, 1.0, 1.0, 5.0, 5.0, 5.0]
    n = len(vals)
    us = np.array([d * 86_400_000_000 for d in range(n)], np.int64)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(us).cast(pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array(["click"] * n),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n)}),
        os.path.join(tmp_path, "events.parquet"))
    out = QUERIES["events_changepoint_cusum"](str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert r["split_day"] == 2       # last low-regime day
    # N=6, T=1800 cents; C_2=300, K_2=3 → |6·300 − 3·1800| = 3600
    assert r["max_abs_dev"] == 3600
    assert r["n_total"] == 6 and r["total_cents"] == 1800

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages import (
    Add,
    AssignKeys,
    Copy,
    Filter,
    FlattenStruct,
    Move,
    Noop,
    PackStruct,
    Remove,
    Retain,
    Unquote,
)
from opentelemetry_collector_contrib_ray.stages.redact import Redactor
from opentelemetry_collector_contrib_ray.stages.sampler import ProbabilisticSampler


@pytest.fixture
def t():
    return pa.table(
        {
            "text": ['"quoted"', "plain", "'single'"],
            "n": pa.array([1, 2, 3], type=pa.int64()),
            "attributes.a": ["x", "y", "z"],
            "attributes.b": pa.array([10, 20, 30], type=pa.int64()),
        }
    )


def test_add_static_and_expr(t):
    out = Add("flag", value="on")(t)
    assert out["flag"].to_pylist() == ["on"] * 3
    out = Add("n2", expr="n * 2")(t)
    assert out["n2"].to_pylist() == [2, 4, 6]
    out = Add("big", value=1, if_expr="n >= 2")(t)
    assert out["big"].to_pylist() == [None, 1, 1]


def test_move_copy_remove_retain(t):
    out = Move("attributes.a", "resource.a")(t)
    assert "attributes.a" not in out.column_names
    assert out["resource.a"].to_pylist() == ["x", "y", "z"]
    out = Copy("n", "n_copy")(t)
    assert out["n_copy"].to_pylist() == [1, 2, 3]
    out = Remove("attributes")(t)  # namespace remove
    assert [c for c in out.column_names if c.startswith("attributes.")] == []
    out = Retain(["text", "attributes"])(t)
    assert set(out.column_names) == {"text", "attributes.a", "attributes.b"}


def test_unquote(t):
    out = Unquote("text")(t)
    assert out["text"].to_pylist() == ["quoted", "plain", "single"]


def test_noop(t):
    assert Noop()(t).equals(t)


def test_assign_keys():
    t = pa.table({"lst": [[1, 2], [3], None]})
    out = AssignKeys("lst", ["first", "second"])(t)
    assert out["lst.first"].to_pylist() == [1, 3, None]
    assert out["lst.second"].to_pylist() == [2, None, None]


def test_filter_drops_matches(t):
    out = Filter("n >= 2")(t)  # reference filter DROPS matching entries
    assert out["n"].to_pylist() == [1]


def test_filter_drop_ratio_deterministic(t):
    a = Filter("true", drop_ratio=0.5, hash_col="n")(t)
    b = Filter("true", drop_ratio=0.5, hash_col="n")(t)
    assert a["n"].to_pylist() == b["n"].to_pylist()


def test_filter_drop_ratio_block_boundary_independent():
    """Without hash_col the dice hashes row CONTENT, so the kept set is
    identical whether the table arrives as 1 block or 16."""
    big = pa.table({"id": pa.array(range(4000), type=pa.int64()),
                    "txt": [f"row-{i}" for i in range(4000)]})
    f = Filter("true", drop_ratio=0.5)
    whole = f(big)["id"].to_pylist()
    chunked = []
    for i in range(16):
        part = big.slice(i * 250, 250)
        chunked.extend(f(part)["id"].to_pylist())
    assert whole == chunked
    assert 0.4 < 1 - len(whole) / 4000 < 0.6  # ~half dropped


def test_pack_and_flatten_roundtrip(t):
    packed = PackStruct("attributes")(t)
    assert "attributes" in packed.column_names
    assert pa.types.is_struct(packed["attributes"].type)
    flat = FlattenStruct("attributes")(packed)
    assert flat["attributes.a"].to_pylist() == t["attributes.a"].to_pylist()
    assert flat["attributes.b"].to_pylist() == t["attributes.b"].to_pylist()


def test_redactor():
    t = pa.table(
        {
            "attributes.keep": ["card 4111-1111-1111-1111 ok", "clean"],
            "attributes.secret": ["a", "b"],
        }
    )
    out = Redactor(
        allowed_keys=["keep"], blocked_values=[r"\d{4}-\d{4}-\d{4}-\d{4}"]
    )(t)
    assert "attributes.secret" not in out.column_names
    assert out["attributes.keep"].to_pylist()[0] == "card **** ok"
    assert out["redaction.masked"].to_pylist() == [1, 0]


def test_sampler_deterministic_and_near_rate():
    t = pa.table({"k": pa.array(range(10000), type=pa.int64())})
    s = ProbabilisticSampler(25, "k")
    a, b = s(t), s(t)
    assert a["k"].to_pylist() == b["k"].to_pylist()
    assert 0.2 < a.num_rows / 10000 < 0.3


def test_sampler_fractional_percent():
    t = pa.table({"k": pa.array(range(200000), type=pa.int64())})
    out = ProbabilisticSampler(0.5, "k")(t)
    assert 0.003 < out.num_rows / 200000 < 0.007  # 0.5% actually samples ~0.5%
    assert ProbabilisticSampler(10.9, "k")(t).num_rows > ProbabilisticSampler(10, "k")(t).num_rows


def test_sampler_priority_override():
    t = pa.table(
        {"k": pa.array(range(100), type=pa.int64()),
         "prio": pa.array([1] * 100, type=pa.int64())}
    )
    out = ProbabilisticSampler(0, "k", priority_col="prio")(t)
    assert out.num_rows == 100


class TestResourceDetection:
    # processor/resourcedetectionprocessor parity
    def _t(self):
        import pyarrow as pa

        return pa.table({
            "text": ["a", "b"],
            "resource.host.name": ["existing", None],
        })

    def test_env_detector_and_override(self):
        from opentelemetry_collector_contrib_ray.stages import ResourceDetectionProcessor

        p = ResourceDetectionProcessor(
            detectors=("env",),
            environ={"OTEL_RESOURCE_ATTRIBUTES": "service.name=web, host.name=h%201"},
        )
        out = p(self._t())
        assert out["resource.service.name"].to_pylist() == ["web", "web"]
        # percent-decoded + override=True replaces existing values
        assert out["resource.host.name"].to_pylist() == ["h 1", "h 1"]

    def test_no_override_fills_only_missing(self):
        from opentelemetry_collector_contrib_ray.stages import ResourceDetectionProcessor

        p = ResourceDetectionProcessor(
            detectors=("env",), override=False,
            environ={"OTEL_RESOURCE_ATTRIBUTES": "host.name=det"},
        )
        out = p(self._t())
        assert out["resource.host.name"].to_pylist() == ["existing", "det"]

    def test_detector_order_first_wins_and_keep_filter(self):
        from opentelemetry_collector_contrib_ray.stages import ResourceDetectionProcessor

        p = ResourceDetectionProcessor(
            detectors=("env", "static"),
            environ={"OTEL_RESOURCE_ATTRIBUTES": "cloud.region=env-r"},
            static_attributes={"cloud.region": "static-r", "cloud.zone": "z1",
                               "drop.me": "x"},
            attributes=["cloud.region", "cloud.zone"],
        )
        out = p(self._t())
        assert out["resource.cloud.region"].to_pylist() == ["env-r", "env-r"]
        assert out["resource.cloud.zone"].to_pylist() == ["z1", "z1"]
        assert "resource.drop.me" not in out.column_names

    def test_system_detector_injectable(self):
        from opentelemetry_collector_contrib_ray.stages import ResourceDetectionProcessor

        p = ResourceDetectionProcessor(
            detectors=("system",),
            system_info={"host.name": "node-7", "os.type": "linux"},
        )
        out = p(self._t())
        assert out["resource.os.type"].to_pylist() == ["linux", "linux"]

    def test_bad_env_format_cleared(self):
        from opentelemetry_collector_contrib_ray.stages.resourcedetection import (
            parse_otel_resource_attrs,
        )
        import pytest as _pytest

        with _pytest.raises(ValueError):
            parse_otel_resource_attrs("no-equals-sign-at-all,,")


def test_cap_per_key_deterministic_across_parallelism():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.sampler import cap_per_key

    t = pa.table({
        "user": pa.array(np.arange(500) % 20),
        "id": pa.array(np.arange(500), type=pa.int64()),
    })

    def run(nblocks):
        out = cap_per_key(rd.from_arrow(t).repartition(nblocks),
                          "user", 5, "id").to_pandas()
        return sorted(out["id"].tolist())

    a, b = run(1), run(16)
    assert a == b
    import pandas as pd

    df = pd.DataFrame({"user": np.arange(500) % 20, "id": np.arange(500)})
    df = df[df["id"].isin(a)]
    assert (df.groupby("user").size() == 5).all()


def test_stratified_cap_quotas_and_determinism():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.sampler import stratified_cap

    langs = np.array(["en", "de", "zh"])[np.arange(300) % 3]
    t = pa.table({"lang": pa.array(langs),
                  "id": pa.array(np.arange(300), type=pa.int64())})
    quotas = {"en": 30, "zh": 10}

    def run(nblocks):
        out = stratified_cap(rd.from_arrow(t).repartition(nblocks),
                             "lang", quotas, 20, id_col="id",
                             num_partitions=4).to_pandas()
        return out

    a, b = run(1), run(8)
    assert sorted(a["id"]) == sorted(b["id"])
    sizes = a.groupby("lang").size()
    assert sizes["en"] == 30 and sizes["zh"] == 10 and sizes["de"] == 20
    # kept set = smallest (knuth_hash, id) per stratum
    df = pd.DataFrame({"lang": langs, "id": np.arange(300, dtype=np.uint64)})
    df["h"] = (df["id"] * np.uint64(2654435761)) % np.uint64(2**32)
    df = df.sort_values(["lang", "h", "id"])
    want = []
    for lang, g in df.groupby("lang"):
        want += g["id"].head(quotas.get(lang, 20)).astype(int).tolist()
    assert sorted(a["id"]) == sorted(want)


def test_upsample_by_weight_deterministic():
    import numpy as np
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.sampler import upsample_by_weight

    langs = np.array(["en", "de", "zh"])[np.arange(90) % 3]
    t = pa.table({"lang": pa.array(langs),
                  "id": pa.array(np.arange(90), type=pa.int64())})
    out = upsample_by_weight(t, "lang", {"en": 0.25, "zh": 2.5}, 1.75, "id")
    df = out.to_pandas()
    # per-row reps match the reference rule
    h = (np.arange(90, dtype=np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    fl = np.select([langs == "en", langs == "zh"], [0, 2], 1)
    thr = np.select([langs == "en", langs == "zh"],
                    [np.uint64(0.25 * 2**32), np.uint64(0.5 * 2**32)],
                    np.uint64(0.75 * 2**32))
    reps = fl + (h < thr)
    got = df.groupby("id").size().reindex(range(90), fill_value=0).to_numpy()
    assert (got == reps).all()
    # rep_idx runs 0..reps-1 per source row
    assert (df.groupby("id")["rep_idx"].max().to_numpy()
            == reps[reps > 0] - 1).all()
    # slicing invariance: same result on a table slice union
    parts = [upsample_by_weight(t.slice(0, 40), "lang",
                                {"en": 0.25, "zh": 2.5}, 1.75, "id"),
             upsample_by_weight(t.slice(40), "lang",
                                {"en": 0.25, "zh": 2.5}, 1.75, "id")]
    both = pa.concat_tables(parts).to_pandas()
    assert sorted(zip(both["id"], both["rep_idx"])) == \
        sorted(zip(df["id"], df["rep_idx"]))


def test_sampler_string_fnv_bit_identical():
    """The vectorized byte-position FNV-1a must reproduce the per-byte
    reference loop exactly (the sampler's determinism contract)."""
    import numpy as np

    from opentelemetry_collector_contrib_ray.stages.sampler import fnv1a_hash_strings

    def ref(strings):
        out = np.empty(len(strings), dtype=np.uint64)
        for i, s in enumerate(strings):
            h = 0xCBF29CE484222325
            for b in ("" if s is None else s).encode():
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out[i] = h
        return out

    ss = ["", None, "a", "user-42", "héllo…中", "x" * 200,
          "the quick brown fox", "\t\n weird \x00 bytes"]
    col = pa.array(ss, type=pa.string())
    assert np.array_equal(fnv1a_hash_strings(col), ref(ss))
    # string-keyed sampling is deterministic across batch slicing
    t = pa.table({"k": pa.array([f"user-{i%37}" for i in range(500)])})
    s = ProbabilisticSampler(25, "k")
    whole = s(t)["k"].to_pylist()
    parts = s(t.slice(0, 250))["k"].to_pylist() + s(t.slice(250))["k"].to_pylist()
    assert whole == parts


def test_assign_split_disjoint_and_matches_rule():
    import numpy as np
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.sampler import assign_split

    ids = np.arange(10_000, dtype=np.int64)
    t = pa.table({"id": pa.array(ids)})
    frac = {"train": 0.8, "valid": 0.1, "test": 0.1}
    out = assign_split(t, "id", frac)
    split = out["split"].to_numpy(zero_copy_only=False)
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    t0, t1 = np.uint64(0.8 * 2**32), np.uint64(0.9 * 2**32)
    want = np.where(h < t0, "train", np.where(h < t1, "valid", "test"))
    assert (split == want).all()
    # fractions land near targets
    frac_train = (split == "train").mean()
    assert abs(frac_train - 0.8) < 0.02
    # slicing invariance
    parts = pa.concat_tables([assign_split(t.slice(0, 4000), "id", frac),
                              assign_split(t.slice(4000), "id", frac)])
    assert parts["split"].to_numpy(zero_copy_only=False).tolist() == split.tolist()


def test_rate_limit_window_rule_and_parallelism():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.sampler import rate_limit

    rng = np.random.default_rng(3)
    n = 500
    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 8, n),
        "ts": base + rng.integers(0, 6 * 3_600_000_000, n).astype("timedelta64[us]"),
    })
    # duplicate timestamps to exercise the id tiebreak
    df.loc[10:20, "ts"] = df.loc[9, "ts"]

    want = df.copy()
    want["w"] = want["ts"].astype("int64") // 3_600_000_000
    want = want.sort_values(["user_id", "w", "ts", "event_id"], kind="mergesort")
    want_keep = want[want.groupby(["user_id", "w"]).cumcount() < 2]["event_id"]

    for nparts, reparts in [(4, 3), (9, 11)]:
        got = rate_limit(rd.from_pandas(df).repartition(reparts), "user_id", "ts",
                         2, 3600, "event_id", num_partitions=nparts).to_pandas()
        assert sorted(got["event_id"]) == sorted(want_keep)


# --------------------------------------------- schema migration


def test_schema_migrator_upgrade_composes_and_downgrade_inverts():
    import pyarrow as pa
    from opentelemetry_collector_contrib_ray.stages.schemamigrate import (
        SchemaFamily,
        SchemaMigrator,
    )

    FAM = "https://example.com/schemas"
    fam = SchemaFamily(
        FAM, ["1.7.0", "1.8.0", "1.9.0"],
        {"1.8.0": {"lat": "dur"}, "1.9.0": {"dur": "dur_ms",
                                            "code": "http.code"}},
        target="1.9.0")
    t = pa.table({
        "schema_url": [f"{FAM}/1.7.0", f"{FAM}/1.8.0", f"{FAM}/1.9.0",
                       "https://other/1.0.0"],
        "lat": pa.array([10, None, None, 99], pa.int64()),
        "dur": pa.array([None, 20, None, None], pa.int64()),
        "dur_ms": pa.array([None, None, 30, None], pa.int64()),
        "code": pa.array([401, 402, None, 403], pa.int64()),
        "http.code": pa.array([None, None, 503, None], pa.int64()),
    })
    out = SchemaMigrator(fam)(t)
    # every family row lands in 1.9.0 columns; other family untouched
    assert out["schema_url"].to_pylist() == [
        f"{FAM}/1.9.0"] * 3 + ["https://other/1.0.0"]
    assert out["dur_ms"].to_pylist() == [10, 20, 30, None]
    assert out["lat"].to_pylist() == [None, None, None, 99]
    assert out["dur"].to_pylist() == [None] * 4
    assert out["http.code"].to_pylist() == [401, 402, 503, None]
    assert out["code"].to_pylist() == [None, None, None, 403]

    # downgrade to 1.7.0 inverts both steps in reverse order
    dn = SchemaMigrator(SchemaFamily(
        FAM, ["1.7.0", "1.8.0", "1.9.0"],
        {"1.8.0": {"lat": "dur"}, "1.9.0": {"dur": "dur_ms",
                                            "code": "http.code"}},
        target="1.7.0"))(t)
    assert dn["lat"].to_pylist() == [10, 20, 30, 99]
    assert dn["code"].to_pylist() == [401, 402, 503, 403]
    assert dn["dur_ms"].to_pylist() == [None] * 4
    assert dn["schema_url"].to_pylist() == [
        f"{FAM}/1.7.0"] * 3 + ["https://other/1.0.0"]


def test_schema_migrator_creates_missing_target_column():
    import pyarrow as pa
    from opentelemetry_collector_contrib_ray.stages.schemamigrate import (
        SchemaFamily,
        SchemaMigrator,
    )

    FAM = "https://f.example/s"
    fam = SchemaFamily(FAM, ["1.0.0", "2.0.0"],
                       {"2.0.0": {"a": "b"}}, target="2.0.0")
    t = pa.table({"schema_url": [f"{FAM}/1.0.0"],
                  "a": pa.array([7], pa.int64())})
    out = SchemaMigrator(fam)(t)
    assert out["b"].to_pylist() == [7] and out["a"].to_pylist() == [None]


def test_longest_prefix_router_semantics():
    import pyarrow as pa
    from opentelemetry_collector_contrib_ray.stages.enrich import (
        LongestPrefixRouter,
    )

    r = LongestPrefixRouter("p", {"/": "root", "/a": "A", "/a/b": "AB",
                                  "/ab": "ABX"})
    t = pa.table({"p": ["/a/b/c", "/a/b", "/a/x", "/abc", "/ab", "/z",
                        "x", ""]})
    assert r(t)["route"].to_pylist() == [
        "AB", "AB", "A", "ABX", "ABX", "root", "unmatched", "unmatched"]

    # exact tie on length impossible (dict keys unique); longer always
    # wins over shorter even when both match
    r2 = LongestPrefixRouter("p", {"ab": "short", "abcd": "long"},
                             default="none")
    t2 = pa.table({"p": ["abcde", "abc", "a"]})
    assert r2(t2)["route"].to_pylist() == ["long", "short", "none"]


def test_k_anonymity_ladder_hand_case():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.privacy import k_anonymity_ladder

    # finest (a,b): classes (x,1):2 (x,2):3 (y,1):4 -> min 2 < 3
    # level (a,):   x:5 y:4                          -> min 4 >= 3 -> chosen
    # level ():     9                                 -> satisfied but later
    df = pd.DataFrame({"a": ["x"] * 5 + ["y"] * 4,
                       "b": [1, 1, 2, 2, 2, 1, 1, 1, 1]})
    out = (k_anonymity_ladder(rd.from_pandas(df).repartition(3),
                              [["a", "b"], ["a"], []], k=3)
           .to_pandas().sort_values("level").reset_index(drop=True))
    assert out["n_classes"].tolist() == [3, 2, 1]
    assert out["min_class_size"].tolist() == [2, 4, 9]
    assert out["rows_at_risk"].tolist() == [2, 0, 0]
    assert out["chosen"].tolist() == [0, 1, 0]

    # no level satisfies -> all chosen 0
    out = (k_anonymity_ladder(rd.from_pandas(df), [["a", "b"], ["a"]], k=100)
           .to_pandas())
    assert out["chosen"].tolist() == [0, 0]

    # non-projection ladder rejected
    try:
        k_anonymity_ladder(rd.from_pandas(df), [["a"], ["b"]], k=2)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_l_diversity_audit_hand_case():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.privacy import l_diversity_audit

    # class q=1: 4 rows but only 1 distinct sensitive value -> at risk
    # class q=2: 3 rows, 3 distinct values -> diverse
    df = pd.DataFrame({"q": [1, 1, 1, 1, 2, 2, 2],
                       "s": ["a", "a", "a", "a", "a", "b", "c"]})
    out = (l_diversity_audit(rd.from_pandas(df).repartition(3),
                             ["q"], "s", l=2)
           .to_pandas().sort_values("q").reset_index(drop=True))
    assert out["class_size"].tolist() == [4, 3]
    assert out["n_sensitive"].tolist() == [1, 3]
    assert out["at_risk"].tolist() == [1, 0]


def test_melt_unpivot_roundtrip():
    """melt fans each value column to labeled long rows, preserves ids,
    and moves nothing (pure map) — wide row count × columns = long."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.transformers import melt

    wide = pd.DataFrame({"k": [1, 2], "n_a": [10, 0], "n_b": [3, 7]})
    out = (melt(rd.from_pandas(wide).repartition(2), ["k"],
                ["n_a", "n_b"], var_col="kind", val_col="n",
                var_names=["a", "b"])
           .to_pandas().sort_values(["k", "kind"]).reset_index(drop=True))
    assert len(out) == 4
    assert out.to_dict("list") == {"k": [1, 1, 2, 2],
                                   "kind": ["a", "b", "a", "b"],
                                   "n": [10, 3, 0, 7]}


def test_arrow_out_strips_metadata_and_passes_arrow_through():
    """arrow_out: raw pandas returns convert to METADATA-FREE arrow
    (hashable schema — the shuffle schema-dedup contract); arrow and
    non-frame returns pass through untouched; empty frames keep their
    columns."""
    import pandas as pd
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.base import arrow_out

    out = arrow_out(lambda g: pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}))(None)
    assert isinstance(out, pa.Table)
    assert out.schema.metadata is None
    hash(out.schema)  # must not raise

    t = pa.table({"a": pa.array([1], pa.int64())})
    assert arrow_out(lambda g: t)(None) is t

    empty = arrow_out(lambda g: pd.DataFrame({"a": pd.Series(dtype="int64")}))(None)
    assert empty.num_rows == 0 and empty.column_names == ["a"]
    assert empty.schema.field("a").type == pa.int64()

    # the reference failure mode: pa.Table.from_pandas attaches
    # b'pandas' metadata whose schema pyarrow cannot hash
    dirty = pa.Table.from_pandas(pd.DataFrame({"a": [1]}))
    assert dirty.schema.metadata is not None
    try:
        hash(dirty.schema)
        raised = False
    except TypeError:
        raised = True
    assert raised

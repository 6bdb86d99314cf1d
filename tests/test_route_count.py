"""Router + count connector semantics vs plain-python oracles
(reference: routingconnector/logs.go:62-103, countconnector/counter.go)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages import (
    CountConnector,
    MetricDef,
    Router,
    RouteSpec,
)


@pytest.fixture
def t():
    return pa.table(
        {
            "service": ["search-svc", "chat-svc", "chat-svc", "chat-svc", "web-svc"],
            "severity_number": pa.array([17, 17, 9, 0, 0], type=pa.int64()),
            "attributes.status": pa.array([500, 200, 503, None, 200], type=pa.int64()),
            "role": ["tool", "user", "assistant", "tool", "user"],
        }
    )


ROUTES = [
    ('service == "search-svc"', ["search"]),
    ("severity_number >= 17", ["errors"]),
    ("attributes.status >= 500", ["errors", "audit"]),
    ('role == "tool"', ["tools"]),
]


def oracle_route(rows, match_once):
    """Row-at-a-time reference semantics."""
    out = {s: [] for s in ["search", "errors", "audit", "tools", "default"]}
    for i, r in enumerate(rows):
        conds = [
            r["service"] == "search-svc",
            r["severity_number"] >= 17,
            r["attributes.status"] is not None and r["attributes.status"] >= 500,
            r["role"] == "tool",
        ]
        sinks = [["search"], ["errors"], ["errors", "audit"], ["tools"]]
        matched = False
        for c, ss in zip(conds, sinks):
            if c:
                matched = True
                for s in ss:
                    if i not in out[s]:
                        out[s].append(i)
                if match_once:
                    break
        if not matched:
            out["default"].append(i)
    return out


@pytest.mark.parametrize("match_once", [True, False])
def test_router_vs_oracle(t, match_once):
    router = Router(RouteSpec(routes=ROUTES, match_once=match_once))
    rows = t.to_pylist()
    expected = oracle_route(rows, match_once)
    lt = router.label(t.append_column("rid", pa.array(range(t.num_rows))))
    for sink in router.sinks:
        got = router.sink_filter(sink)(lt)["rid"].to_pylist()
        assert got == expected[sink], f"sink {sink}"


def test_match_once_first_wins(t):
    router = Router(RouteSpec(routes=ROUTES, match_once=True))
    masks = router.sink_masks(t)
    # row 0 matches search AND errors AND audit conditions; first wins
    assert np.asarray(masks["search"])[0]
    assert not np.asarray(masks["errors"])[0]


def test_multi_match_duplicates(t):
    router = Router(RouteSpec(routes=ROUTES, match_once=False))
    masks = router.sink_masks(t)
    assert np.asarray(masks["search"])[0] and np.asarray(masks["errors"])[0]
    assert np.asarray(masks["audit"])[0]


def test_default_route(t):
    router = Router(RouteSpec(routes=ROUTES, match_once=True))
    masks = router.sink_masks(t)
    # row 4: no condition matches → default only
    assert np.asarray(masks["default"])[4]
    assert sum(np.asarray(m)[4] for m in masks.values()) == 1


def test_count_connector_defaults_and_skip(t):
    cc = CountConnector(
        [
            MetricDef("all"),
            MetricDef("with_attr", attributes=[("attributes.status", None)]),
            MetricDef("with_default", attributes=[("attributes.status", "unknown")]),
        ]
    )
    p = cc.partial(t)
    rows = {(r["metric"], r["attrs"]): r["count"] for r in p.to_pylist()}
    assert rows[("all", "{}")] == 5
    # required attr missing (row 3) is skipped (counter.go:50-53)
    assert sum(v for (m, _), v in rows.items() if m == "with_attr") == 4
    assert rows[("with_default", json.dumps({"attributes.status": "unknown"}))] == 1


def test_count_aggregate_across_blocks(t):
    import ray.data as rd

    cc = CountConnector([MetricDef("by.role", attributes=[("role", None)])])
    ds = rd.from_arrow(t).repartition(3)
    out = cc.aggregate(ds).to_pandas()
    got = dict(zip(out["attrs"], out["count"]))
    assert got[json.dumps({"role": "user"})] == 2
    assert got[json.dumps({"role": "tool"})] == 2


def test_route_added_attributes():
    # stanza router per-route attributes (router/config.go:160-212)
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.route import Router, RouteSpec

    spec = RouteSpec(
        routes=[
            ('attributes.level == "ERROR"', ["errors"], {"attributes.route": "err", "attributes.sev": "high"}),
            ('attributes.level == "INFO"', ["info"], {"attributes.route": "inf"}),
        ],
        match_once=True,
    )
    r = Router(spec)
    t = pa.table({"attributes.level": ["ERROR", "INFO", "DEBUG"]})
    labeled = r.label(t)
    err = r.sink_filter("errors")(labeled)
    assert err["attributes.route"].to_pylist() == ["err"]
    assert err["attributes.sev"].to_pylist() == ["high"]
    inf = r.sink_filter("info")(labeled)
    assert inf["attributes.route"].to_pylist() == ["inf"]
    assert "attributes.sev" not in inf.column_names
    dflt = r.sink_filter("default")(labeled)
    assert dflt["attributes.level"].to_pylist() == ["DEBUG"]
    assert "attributes.route" not in dflt.column_names


def test_service_graph_edges_pairs_and_rollup():
    """Pairing drops unmatched spans (the store-expiry analog); an edge
    fails when EITHER side flags failure; histogram is cumulative."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.servicegraph import (
        service_graph_edges,
    )

    clients = pd.DataFrame({
        "span_id": [1, 2, 3, 9],  # 9 never answered -> no edge
        "client_service": ["web", "web", "api", "web"],
        "duration_client_ms": [10, 20, 30, 40],
        "client_failed": [False, True, False, False],
    })
    servers = pd.DataFrame({
        "parent_span_id": [1, 2, 3, 77],  # 77 orphan -> no edge
        "server_service": ["db", "db", "db", "db"],
        "duration_server_ms": [40, 120, 160, 5],
        "server_failed": [False, False, True, False],
    })
    got = service_graph_edges(
        rd.from_pandas(clients).repartition(2),
        rd.from_pandas(servers).repartition(2),
        num_partitions=8,
    ).to_pandas().set_index(["client", "server"]).sort_index()
    assert len(got) == 2
    web = got.loc[("web", "db")]
    assert web["n_requests"] == 2 and web["n_failed"] == 1
    assert web["sum_client_ms"] == 30 and web["sum_server_ms"] == 160
    assert (web["le_50"], web["le_100"], web["le_150"]) == (1, 1, 2)
    api = got.loc[("api", "db")]
    assert api["n_requests"] == 1 and api["n_failed"] == 1
    assert (api["le_50"], api["le_100"], api["le_150"]) == (0, 0, 0)


def test_service_graph_pagerank_integer_recurrence():
    """Hand-computed 1-iteration check incl. a dangling node (teleport
    only) and weighted out-degree floor division."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.servicegraph import (
        service_graph_pagerank,
    )

    edges = pa.table({
        "client": ["A", "B", "A"],
        "server": ["B", "A", "C"],
        "n_requests": [2, 1, 2],
    })
    got = service_graph_pagerank(
        edges, iterations=1, scale=100, damping_num=50, damping_den=100,
    ).to_pydict()
    # outw: A=4, B=1; contrib: A<-100, B<-(100*2)//4=50, C<-50
    # teleport = 50; rank = teleport + (50*contrib)//100
    assert got == {"service": ["A", "B", "C"], "pagerank": [100, 75, 75]}

    # iterations=0 -> everyone at scale
    got0 = service_graph_pagerank(edges, iterations=0, scale=7).to_pydict()
    assert got0["pagerank"] == [7, 7, 7]


def test_partial_by_sink_matches_per_sink_partials():
    """The one-grouped-pass-per-metric all-sinks partial must produce
    exactly the totals of CountConnector.partial applied to each
    per-sink subset (the routing fan-out overlap case included)."""
    import numpy as np

    from opentelemetry_collector_contrib_ray.pipelines.flagship import (
        METRICS, ROUTES, TOOL_SERVICE, TOOL_SERVICE_DEFAULTS,
        build_parse_chain)
    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        generate_transcripts)
    from opentelemetry_collector_contrib_ray.stages.count import CountConnector
    from opentelemetry_collector_contrib_ray.stages.enrich import LookupEnricher
    from opentelemetry_collector_contrib_ray.stages.route import (
        ROUTE_BITS_COL, Router)

    t = generate_transcripts(8192)
    router = Router(ROUTES)
    cc = CountConnector(METRICS)
    lab = router.label(
        LookupEnricher("tool", TOOL_SERVICE, TOOL_SERVICE_DEFAULTS)(
            build_parse_chain()(t)))
    bits = lab[ROUTE_BITS_COL].to_numpy(zero_copy_only=False).view(np.uint64)
    base = lab.drop_columns([ROUTE_BITS_COL])
    sink_bits = [(s, np.uint64(b)) for s, b in router._sink_bits.items()]

    old: dict = {}
    for sink, b in sink_bits:
        mask = (bits & b) != 0
        if mask.any():
            p = cc.partial(base.filter(pa.array(mask)))
            for m, a, c in zip(p["metric"].to_pylist(),
                               p["attrs"].to_pylist(),
                               p["count"].to_pylist()):
                old[(sink, m, a)] = old.get((sink, m, a), 0) + c
    new: dict = {}
    for sink, mm, aa, cnts in cc.partial_by_sink(base, bits, sink_bits):
        for m, a, c in zip(mm, aa, cnts):
            new[(sink, m, a)] = new.get((sink, m, a), 0) + c
    assert old == new and len(old) > 0


def test_range_lookup_boundaries_and_gaps():
    """RangeLookupEnricher pins [start, end) semantics: start hit, end
    miss, gap/below/above → default; labels repeat across ranges."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.enrich import range_lookup

    ds = rd.from_arrow(pa.table({"v": [5, 10, 19, 20, 25, 30, 39, 40, -3]}))
    out = (range_lookup(ds, "v", [10, 30], [20, 40], ["A", "A"],
                        out_col="lab", default="miss")
           .to_pandas().sort_values("v").reset_index(drop=True))
    got = dict(zip(out["v"], out["lab"]))
    assert got == {-3: "miss", 5: "miss", 10: "A", 19: "A", 20: "miss",
                   25: "miss", 30: "A", 39: "A", 40: "miss"}


def test_range_lookup_rejects_overlap():
    import pytest

    from opentelemetry_collector_contrib_ray.stages.enrich import (
        RangeLookupEnricher,
    )

    with pytest.raises(ValueError):
        RangeLookupEnricher("v", ([0, 5], [6, 9], ["a", "b"]))

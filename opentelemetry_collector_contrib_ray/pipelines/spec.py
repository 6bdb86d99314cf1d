"""Declarative pipeline spec → Ray Data pipeline compiler.

The reference wires pipelines in YAML (receivers → operators →
processors → connectors → exporters; cmd/otelcontribcol/main.go:27-30
builds the component graph from config). Here a pipeline spec is a
dict (load it from YAML/JSON yourself — no YAML dependency assumed):

    spec = {
      "source": {"parquet": "/path/*.parquet", "columns": [...]},
      "operators": [                    # fused into ONE map_batches
        {"type": "regex_parser", "pattern": "...", "types": {...}},
        {"type": "severity_parser", "parse_from": "attributes.level"},
        {"type": "transform", "statements": ["set(a.b, 1) where x > 2"]},
      ],
      "enrich": {"key_col": "tool", "table": {...}, "defaults": {...},
                 "concurrency": 8},     # optional actor-pool stage
      "routes": {"table": [["cond", ["sink"]], ...],
                 "match_once": true, "default_sinks": ["default"]},
      "metrics": {"turn.count": {},     # count-connector defs
                  "x": {"conditions": [...], "attributes": [["k", "dflt"]]}},
      "sink": {"parquet": "/out/dir"},  # partitioned by route sink
    }

``compile_pipeline(spec)`` returns a ``Plan`` with ``.sinks()``,
``.counts()`` and ``.run()`` — the same topology as pipelines.flagship.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from ..registry import build_op
from ..stages import Chain, CountConnector, MetricDef, Router, RouteSpec
from ..stages.enrich import LookupEnricher


@dataclass
class Plan:
    spec: dict
    _ds: Any
    router: Router | None
    cc: CountConnector | None

    def dataset(self):
        return self._ds

    def sinks(self) -> dict[str, Any]:
        if self.router is None:
            return {"default": self._ds}
        return self.router.fanout(self._ds)

    def counts(self) -> dict[str, Any]:
        cc = self.cc or CountConnector()
        return {name: cc.aggregate(ds) for name, ds in self.sinks().items()}

    def run(self, out_root: str):
        """Write every sink (and counts) under ``out_root``."""
        import os

        results = {}
        for name, ds in self.sinks().items():
            d = os.path.join(out_root, name)
            ds.write_parquet(d)
            results[name] = d
        if self.cc:
            for name, cds in self.counts().items():
                d = os.path.join(out_root, f"{name}__counts")
                cds.write_parquet(d)
        return results


def compile_pipeline(spec: dict, ds=None) -> Plan:
    import ray.data as rd

    if ds is None:
        src = spec["source"]
        if "parquet" in src:
            ds = rd.read_parquet(src["parquet"], columns=src.get("columns"))
        elif "text" in src:
            ds = rd.read_text(src["text"])
        elif "json" in src:
            ds = rd.read_json(src["json"])
        else:
            raise ValueError("source must specify parquet/text/json")

    ops = [build_op(o) for o in spec.get("operators", [])]
    if ops:
        ds = ds.map_batches(
            Chain(ops), batch_format="pyarrow",
            batch_size=spec.get("batch_size", 65_536), zero_copy_batch=True,
        )

    enr = spec.get("enrich")
    if enr:
        ds = ds.map_batches(
            LookupEnricher,
            fn_constructor_kwargs={
                "key_col": enr["key_col"], "table": enr["table"],
                "defaults": enr.get("defaults"),
            },
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=(1, enr.get("concurrency", 4)),
        )

    router = None
    if "routes" in spec:
        r = spec["routes"]
        router = Router(
            RouteSpec(
                routes=[(c, list(sinks)) for c, sinks in r["table"]],
                match_once=r.get("match_once", True),
                default_sinks=r.get("default_sinks", ["default"]),
            )
        )

    cc = None
    if "metrics" in spec:
        defs = [
            MetricDef(
                name,
                conditions=list(m.get("conditions", [])),
                attributes=[tuple(a) for a in m.get("attributes", [])],
            )
            for name, m in spec["metrics"].items()
        ]
        cc = CountConnector(defs)

    return Plan(spec=spec, _ds=ds, router=router, cc=cc)

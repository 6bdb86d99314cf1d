"""metricsgenerationprocessor parity: derive new metrics from existing
ones by arithmetic (reference:
processor/metricsgenerationprocessor/processor.go — rule types
``calculate`` (metric1 ⊕ metric2 for ⊕ ∈ add/subtract/multiply/divide/
percent) and ``scale`` (metric1 × scale_by)).

Batch-engine shape: metrics are rows of an aggregated table with one
int64 column per metric name (the countconnector / RED-rollup output
shape); every rule is a vectorized pyarrow expression appended as a new
column — zero shuffle, fuses with whatever produced the metrics table.

Integer discipline: divide/percent emit floor-scaled int64 ratios
(``(a · scale) // b``, NULL on zero denominators — matching the
reference's skip-on-zero-divisor behavior, processor.go:121-129) so
results stay hash-comparable across engines; multiplies are checked so
an overflow raises instead of wrapping.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class MetricsGenRule:
    """One derived metric (mirrors the reference's rule config keys)."""
    name: str
    type: str = "calculate"            # "calculate" | "scale"
    metric1: str = ""
    metric2: str = ""
    operation: str = "add"             # add|subtract|multiply|divide|percent
    scale_by: int = 1
    ratio_scale: int = 1_000_000       # fixed-point factor for divide/percent


def _apply_rule(t: pa.Table, r: MetricsGenRule):
    a = pc.cast(t[r.metric1], pa.int64())
    if r.type == "scale":
        return pc.multiply_checked(a, r.scale_by)
    b = pc.cast(t[r.metric2], pa.int64())
    if r.operation == "add":
        return pc.add_checked(a, b)
    if r.operation == "subtract":
        return pc.subtract_checked(a, b)
    if r.operation == "multiply":
        return pc.multiply_checked(a, b)
    if r.operation in ("divide", "percent"):
        num = pc.multiply_checked(
            a, r.ratio_scale * (100 if r.operation == "percent" else 1))
        safe = pc.if_else(pc.equal(b, 0), pa.scalar(1, pa.int64()), b)
        q = pc.divide(num, safe)  # int64 divide truncates toward zero
        return pc.if_else(pc.equal(b, 0), pa.scalar(None, pa.int64()), q)
    raise ValueError(f"metricsgeneration: unknown operation {r.operation!r}")


def metrics_generation(ds, rules: list[MetricsGenRule]):
    """Append one derived column per rule (vectorized, zero shuffle)."""

    def gen(t: pa.Table) -> pa.Table:
        for r in rules:
            t = t.append_column(r.name, _apply_rule(t, r))
        return t

    return ds.map_batches(gen, batch_format="pyarrow")

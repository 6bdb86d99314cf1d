"""Routing connector — fan rows out to per-sink datasets.

Parity: /root/reference/connector/routingconnector/logs.go:62-103 and
router.go:43-138. A routing table of ordered (condition, sinks)
entries; ``match_once=True`` → first match wins; ``match_once=False``
→ a row fans out to every matching route (duplication across sinks is
inherent, README.md:33-40); no match → ``default_sinks``; an errored
condition under ``error_mode: ignore`` routes to default
(logs.go:77-83 — our compiled masks yield null→False for that case).

Vectorized design: ONE fused ``map_batches`` pass computes a 64-bit
route bitmask column ``__route_bits`` (bit i = row matched route i);
each sink's dataset is then a cheap bit-test filter over the shared
labeled lineage — conditions are evaluated once, not once per sink.
The reference routes whole ResourceLogs groups; our flat model routes
rows (SURVEY.md §7.4), which the north rule's routed-row set equality
checks directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..expr import compile_mask
from .base import set_column

ROUTE_BITS_COL = "__route_bits"


@dataclass
class RouteSpec:
    """Ordered routing table (config.go:21-47). Each route is
    ``(condition, sinks)`` or ``(condition, sinks, attributes)`` — the
    stanza router's per-route added attributes
    (transformer/router/config.go:160-212): rows taking the route get
    those attribute columns set."""

    routes: list[tuple]  # (condition, sinks[, attrs])
    match_once: bool = True
    default_sinks: list[str] = field(default_factory=lambda: ["default"])
    error_mode: str = "ignore"


class Router:
    def __init__(self, spec: RouteSpec):
        if len(spec.routes) > 63:
            raise ValueError("at most 63 routes supported")
        self.spec = spec
        self.masks = [compile_mask(r[0]) for r in spec.routes]
        self.route_attrs: list[dict] = [
            (r[2] if len(r) > 2 else {}) for r in spec.routes
        ]
        self.sinks: list[str] = sorted(
            {s for r in spec.routes for s in r[1]} | set(spec.default_sinks)
        )
        # sink → bit pattern of routes feeding it (+ default bit 63)
        self._sink_bits: dict[str, int] = {s: 0 for s in self.sinks}
        for i, r in enumerate(spec.routes):
            for s in r[1]:
                self._sink_bits[s] |= 1 << i
        for s in spec.default_sinks:
            self._sink_bits[s] |= 1 << 63

    # ---- labeling (one pass) -------------------------------------------

    def label(self, t: pa.Table) -> pa.Table:
        """Append ``__route_bits``: bit i set ⇔ row routed to route i;
        bit 63 ⇔ default. First-match-wins collapses to the lowest set
        bit when ``match_once`` (router.go first-match semantics)."""
        n = t.num_rows
        bits = np.zeros(n, dtype=np.uint64)
        matched = np.zeros(n, dtype=bool)
        for i, m in enumerate(self.masks):
            mm = np.asarray(m(t))
            if self.spec.match_once:
                mm = mm & ~matched
            matched |= mm
            bits |= np.where(mm, np.uint64(1 << i), np.uint64(0))
        bits |= np.where(~matched, np.uint64(1) << np.uint64(63), np.uint64(0))
        return set_column(t, ROUTE_BITS_COL, pa.array(bits.view(np.int64)))

    def sink_filter(self, sink: str):
        """Batch filter fn selecting this sink's rows from a labeled
        table, applying per-route added attributes (first matching
        route feeding this sink wins, router.go order)."""
        want = np.uint64(self._sink_bits[sink])
        feeding = [i for i in range(len(self.masks))
                   if self._sink_bits[sink] & (1 << i)]
        attr_keys = sorted({k for i in feeding for k in self.route_attrs[i]})

        def fn(t: pa.Table) -> pa.Table:
            bits = t[ROUTE_BITS_COL].to_numpy(zero_copy_only=False).view(np.uint64)
            keep = (bits & want) != 0
            out = t.filter(pa.array(keep)).drop_columns([ROUTE_BITS_COL])
            if attr_keys:
                kb = bits[keep]
                conds = [(kb & np.uint64(1 << i)) != 0 for i in feeding]
                for k in attr_keys:
                    vals = np.select(
                        conds,
                        [self.route_attrs[i].get(k) for i in feeding],
                        default=None,
                    )
                    out = set_column(out, k, pa.array(vals.tolist()))
            return out

        return fn

    # ---- dataset fan-out ------------------------------------------------

    def fanout(self, ds) -> dict[str, "object"]:
        """Label once, then one filtered Dataset per sink. Each sink's
        lineage shares the labeled upstream; Ray's streaming executor
        schedules the common prefix once per consumed sink."""
        labeled = ds.map_batches(
            self.label, batch_format="pyarrow", zero_copy_batch=True
        )
        return {
            s: labeled.map_batches(
                self.sink_filter(s), batch_format="pyarrow", zero_copy_batch=True
            )
            for s in self.sinks
        }

    def sink_masks(self, t: pa.Table) -> dict[str, pa.Array]:
        """All sink masks for one batch (used by fused count stages)."""
        lt = self.label(t)
        bits = lt[ROUTE_BITS_COL].to_numpy(zero_copy_only=False).view(np.uint64)
        return {
            s: pa.array((bits & np.uint64(b)) != 0) for s, b in self._sink_bits.items()
        }

"""schemaprocessor parity: migrate rows between semantic-convention
versions (reference: processor/schemaprocessor — README "Schema
Transformer Processor"; translation semantics from the OTel schema-file
format's ``rename_attributes`` change lists, applied along the version
path from each signal's schema URL to the configured target).

Batch shape: a schema URL is ``<family>/<version>``; each row carries
its own ``schema_url``.  For every rename step on the path
(row-version, target-version] the stage does a MASKED columnar move —
``new = if_else(row_on_path, old, new)`` / ``old = null where moved`` —
so one vectorized pass migrates a batch containing any mix of versions,
upgrades composing in version order and downgrades applying the
inverted renames in reverse order.  No exchange, fuses with whatever
reads the data; the version table ships in the task closure (schema
files are tiny — the reference caches/prefetches them for the same
reason, README "Caching Schema Translation Files").
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc


def _ver_key(v: str) -> tuple:
    return tuple(int(p) for p in v.split("."))


@dataclass
class SchemaFamily:
    """One schema family's translation table.

    ``renames[v]`` = attribute renames INTRODUCED BY version v (to
    upgrade into v, apply them; to downgrade out of v, apply inverted).
    """
    family: str                       # URL prefix, no trailing slash
    versions: list                    # ascending, e.g. ["1.7.0", ...]
    renames: dict = field(default_factory=dict)
    target: str = ""

    def url(self, version: str) -> str:
        return f"{self.family}/{version}"


class SchemaMigrator:
    """Callable map-batches stage: migrate every row of this family to
    ``target``; rows of other families (or already at target) pass
    through untouched."""

    def __init__(self, fam: SchemaFamily):
        if fam.target not in fam.versions:
            raise ValueError(f"target {fam.target!r} not in versions")
        self.fam = fam

    def _steps(self, from_v: str):
        """[(version-step, renames, inverted)] on the path from_v→target."""
        fam = self.fam
        vs = sorted(fam.versions, key=_ver_key)
        i, j = vs.index(from_v), vs.index(fam.target)
        if i < j:    # upgrade: apply renames of (i, j] ascending
            return [(v, fam.renames.get(v, {}), False)
                    for v in vs[i + 1:j + 1]]
        if i > j:    # downgrade: invert renames of (j, i] descending
            return [(v, {new: old for old, new in
                         fam.renames.get(v, {}).items()}, True)
                    for v in reversed(vs[j + 1:i + 1])]
        return []

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = pc.cast(t["schema_url"], pa.string())
        for from_v in self.fam.versions:
            if from_v == self.fam.target:
                continue
            mask = pc.equal(urls, self.fam.url(from_v))
            if pc.sum(pc.cast(mask, pa.int64())).as_py() == 0:
                continue
            for _v, ren, _inv in self._steps(from_v):
                for old, new in ren.items():
                    if old not in t.column_names:
                        continue
                    src = t[old]
                    if new in t.column_names:
                        dst = pc.if_else(mask, src, t[new])
                        t = t.set_column(t.schema.get_field_index(new),
                                         new, dst)
                    else:
                        t = t.append_column(new, pc.if_else(
                            mask, src, pa.scalar(None, src.type)))
                    cleared = pc.if_else(mask, pa.scalar(None, src.type),
                                         src)
                    t = t.set_column(t.schema.get_field_index(old), old,
                                     cleared)
        # rewrite migrated rows' URL to the target version
        fam_urls = [self.fam.url(v) for v in self.fam.versions]
        migrated = pc.is_in(urls, value_set=pa.array(fam_urls, pa.string()))
        out_urls = pc.if_else(migrated,
                              pa.scalar(self.fam.url(self.fam.target),
                                        pa.string()), urls)
        return t.set_column(t.schema.get_field_index("schema_url"),
                            "schema_url", out_urls)


def migrate_schema(ds, fam: SchemaFamily):
    """Apply the family migration as one fused task-closure stage (tiny
    state — the actor-pool form would be pure startup latency)."""
    return ds.map_batches(SchemaMigrator(fam), batch_format="pyarrow")

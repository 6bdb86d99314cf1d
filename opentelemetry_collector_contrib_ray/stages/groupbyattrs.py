"""groupbyattrs processor — re-root record attributes as resource keys.

Parity: /root/reference/processor/groupbyattrsprocessor/processor.go:
61-98,169-189 — moves the listed attribute keys from record scope to
Resource scope and regroups records under the (deduplicated) new
resources. In the flat-row model (SURVEY.md §1.3) the regrouping is
implicit — resource identity is just the tuple of ``resource.*``
columns — so the operator is a vectorized column re-root; an actual
``groupby`` happens only when a downstream op needs grouped execution
(use ``grouped()``).
"""

from __future__ import annotations

import pyarrow as pa

from .base import BatchOp, set_column


class GroupByAttrs(BatchOp):
    def __init__(self, keys: list[str], from_prefix: str = "attributes.",
                 to_prefix: str = "resource.", **kw):
        super().__init__(**kw)
        self.keys = keys
        self.from_prefix = from_prefix
        self.to_prefix = to_prefix

    def transform(self, t: pa.Table) -> pa.Table:
        for k in self.keys:
            src = self.from_prefix + k
            if src not in t.column_names:
                continue
            t = set_column(t, self.to_prefix + k, t[src].combine_chunks())
            t = t.drop_columns([src])
        return t


def grouped(ds, keys: list[str], to_prefix: str = "resource."):
    """The wide form: hash-group rows by the (re-rooted) resource keys —
    only when downstream semantics require co-located groups."""
    return ds.groupby([to_prefix + k for k in keys])

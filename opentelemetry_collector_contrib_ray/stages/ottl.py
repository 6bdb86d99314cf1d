"""OTTL statements → vectorized batch edits (the transformprocessor).

Parity: editors registered at
/root/reference/pkg/ottl/ottlfuncs/functions.go:12-25 (set, delete_key,
delete_matching_keys, flatten, keep_keys, limit, merge_maps,
replace_all_matches, replace_all_patterns, replace_match,
replace_pattern, truncate_all) executed as ordered statement groups by
processor/transformprocessor/internal/logs/processor.go:50-59 with
``error_mode: ignore|propagate`` (config.go:19-30).

Statement syntax: ``editor(args...) [where <condition>]`` — the same
shape as OTTL. Paths are flat dotted column names; a bare namespace
path (``attributes``) denotes the ``attributes.*`` column family (the
flat-row rendering of the reference's maps). ``where`` masks blend
per-column with ``pc.if_else``; structural editors (delete/keep) null
out masked rows instead of dropping columns when a mask is present.
"""

from __future__ import annotations

import re
from typing import Callable


def _glob_to_re2(glob: str) -> str:
    """Translate a glob to RE2-safe regex (fnmatch.translate emits \\Z,
    which Arrow's RE2 rejects)."""
    out = []
    for ch in glob:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"

import pyarrow as pa
import pyarrow.compute as pc

from ..expr import compile_expr, compile_mask, _is_arr, _as_array
from .base import BatchOp, blend_columns, set_column


def _split_top(s: str) -> list[str]:
    """Split on top-level commas, respecting quotes and parens."""
    parts, depth, cur, q, esc = [], 0, [], None, False
    for ch in s:
        if q:
            cur.append(ch)
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == q:
                q = None
            continue
        if ch in "\"'":
            q = ch
            cur.append(ch)
        elif ch in "([{":
            depth += 1
            cur.append(ch)
        elif ch in ")]}":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


_WHERE_RE = re.compile(r"\)\s+where\s+", re.IGNORECASE)


def parse_statement(stmt: str) -> tuple[str, list[str], str | None]:
    """``editor(a, b) where cond`` → (editor, [a, b], cond)."""
    stmt = stmt.strip()
    m = re.match(r"^([a-z_][a-z0-9_]*)\s*\(", stmt)
    if not m:
        raise ValueError(f"bad statement: {stmt!r}")
    editor = m.group(1)
    # find matching close paren of the editor call
    depth, q, i, esc = 0, None, m.end() - 1, False
    for j in range(i, len(stmt)):
        ch = stmt[j]
        if q:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == q:
                q = None
            continue
        if ch in "\"'":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args_src = stmt[i + 1 : j]
                rest = stmt[j + 1 :].strip()
                where = None
                if rest:
                    wm = re.match(r"^where\s+(.*)$", rest, re.IGNORECASE)
                    if not wm:
                        raise ValueError(f"trailing junk in statement: {rest!r}")
                    where = wm.group(1)
                return editor, _split_top(args_src), where
    raise ValueError(f"unbalanced parens in statement: {stmt!r}")


def _unquote(s: str) -> str:
    if len(s) >= 2 and s[0] in "\"'" and s[-1] == s[0]:
        body = s[1:-1]
        if "\\" in body:
            # OTTL string literals use Go escapes (grammar.go String
            # lexer); the common subset suffices for log configs
            body = (body.replace("\\\\", "\x00")
                        .replace('\\"', '"').replace("\\'", "'")
                        .replace("\\n", "\n").replace("\\t", "\t")
                        .replace("\\r", "\r").replace("\x00", "\\"))
        return body
    return s


_PATH_KEY_RE = re.compile(r'([\w.])\["((?:[^"\\]|\\.)+)"\]')


def _norm_path_keys(s: str) -> str:
    """Bracket string keys on a PATH → the flat dotted column name:
    ``attributes["foo"]["test"]`` ≡ ``attributes.foo.test``
    (grammar.go field keys). Only rewrites keys directly attached to an
    identifier — list literals (``["a", "b"]`` after ``(`` or ``,``)
    and keys on call RESULTS (after ``)``; those are runtime lookups in
    expr.py) are untouched."""
    prev = None
    while prev != s:
        prev, s = s, _PATH_KEY_RE.sub(r"\1.\2", s)
    return s


def _keys_list(args: list[str]) -> list[str]:
    """Editor key-list argument: either the reference's single list
    literal (``["flags", "total.string"]``, possibly empty) or the
    legacy varargs form (``"flags", "total.string"``)."""
    if len(args) == 1 and args[0].startswith("[") and args[0].endswith("]"):
        inner = args[0][1:-1].strip()
        if not inner:
            return []
        return [_unquote(p) for p in _split_top(inner)]
    return [_unquote(a) for a in args]


def _ns_cols(t: pa.Table, ns: str) -> list[str]:
    pref = ns.rstrip(".") + "."
    return [c for c in t.column_names if c.startswith(pref)]


class _Statement:
    def __init__(self, editor: str, args: list[str], where: str | None):
        self.editor = editor
        self.args = [_norm_path_keys(a) for a in args]
        args = self.args
        self.where = compile_mask(where) if where else None
        self.fn: Callable = getattr(self, "_ed_" + editor, None)
        if self.fn is None:
            raise ValueError(f"unknown editor {editor!r}")
        # pre-compile value expressions where the editor takes them
        if editor == "set":
            self.value = compile_expr(args[1])

    def __call__(self, t: pa.Table) -> pa.Table:
        mask = None
        if self.where is not None:
            mask = self.where(t)
            if not pc.any(mask).as_py():
                return t
            if pc.all(mask).as_py():
                mask = None
        return self.fn(t, mask)

    # ---- editors --------------------------------------------------------

    def _ed_set(self, t, mask):
        target = self.args[0]
        v = self.value(t)
        arr = v if _is_arr(v) else _as_array(v, t.num_rows)
        return blend_columns(t, {target: arr}, mask)

    def _drop_or_null(self, t, cols, mask):
        if not cols:
            return t
        if mask is None:
            return t.drop_columns(cols)
        return blend_columns(
            t, {c: pa.nulls(t.num_rows, t[c].type) for c in cols}, mask
        )

    def _ed_delete_key(self, t, mask):
        ns, key = self.args[0].rstrip("."), _unquote(self.args[1])
        col = f"{ns}.{key}"
        return self._drop_or_null(t, [col] if col in t.column_names else [], mask)

    def _ed_delete_matching_keys(self, t, mask):
        ns, pat = self.args[0].rstrip("."), _unquote(self.args[1])
        rx = re.compile(pat)
        cols = [c for c in _ns_cols(t, ns) if rx.search(c[len(ns) + 1 :])]
        return self._drop_or_null(t, cols, mask)

    def _ed_keep_keys(self, t, mask):
        ns = self.args[0].rstrip(".")
        keep = {f"{ns}.{k}" for k in _keys_list(self.args[1:])}
        cols = [c for c in _ns_cols(t, ns) if c not in keep]
        return self._drop_or_null(t, cols, mask)

    def _ed_keep_matching_keys(self, t, mask):
        ns, pat = self.args[0].rstrip("."), _unquote(self.args[1])
        rx = re.compile(pat)
        cols = [c for c in _ns_cols(t, ns) if not rx.search(c[len(ns) + 1 :])]
        return self._drop_or_null(t, cols, mask)

    def _ed_flatten(self, t, mask):
        from .transformers import FlattenStruct

        ns = self.args[0].rstrip(".")
        if ns in t.column_names and pa.types.is_struct(t[ns].type):
            return FlattenStruct(ns).transform(t)
        return t

    def _ed_limit(self, t, mask):
        """Cap the namespace to n columns, priority keys first
        (column-level rendering of func_limit.go's per-record map cap)."""
        ns, n = self.args[0].rstrip("."), int(self.args[1])
        prio = [f"{ns}.{k}" for k in _keys_list(self.args[2:])]
        cols = _ns_cols(t, ns)
        ordered = [c for c in prio if c in cols] + [c for c in cols if c not in prio]
        return self._drop_or_null(t, ordered[n:], mask)

    def _ed_merge_maps(self, t, mask):
        tgt, src, strat = (
            self.args[0].rstrip("."),
            self.args[1].rstrip("."),
            _unquote(self.args[2]),
        )
        for c in _ns_cols(t, src):
            key = c[len(src) + 1 :]
            tc = f"{tgt}.{key}"
            exists = tc in t.column_names
            if strat == "insert" and exists:
                # value-level: fill only nulls of the target
                merged = pc.coalesce(t[tc], pc.cast(t[c], t[tc].type, safe=False))
                t = blend_columns(t, {tc: merged.combine_chunks()}, mask)
            elif strat == "update" and not exists:
                continue
            else:
                t = blend_columns(t, {tc: t[c].combine_chunks()}, mask)
        return t

    def _replace_cols(self, t, cols, mask, fn):
        new = {}
        for c in cols:
            col = t[c]
            if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
                continue
            new[c] = fn(col).combine_chunks() if isinstance(fn(col), pa.ChunkedArray) else fn(col)
        return blend_columns(t, new, mask) if new else t

    def _ed_replace_pattern(self, t, mask):
        path, pat, rep = self.args[0], _unquote(self.args[1]), _unquote(self.args[2])
        if path not in t.column_names:
            return t
        return self._replace_cols(
            t, [path], mask, lambda c: pc.replace_substring_regex(c, pat, rep)
        )

    def _ed_replace_match(self, t, mask):
        path, glob, rep = self.args[0], _unquote(self.args[1]), _unquote(self.args[2])
        if path not in t.column_names:
            return t
        rx = _glob_to_re2(glob)

        def fn(c):
            m = pc.match_substring_regex(c, rx)
            return pc.if_else(pc.fill_null(m, False), rep, c)
        return self._replace_cols(t, [path], mask, fn)

    def _ed_replace_all_patterns(self, t, mask):
        ns, mode, pat, rep = (
            self.args[0].rstrip("."),
            _unquote(self.args[1]),
            _unquote(self.args[2]),
            _unquote(self.args[3]),
        )
        if mode == "key":
            ren = {}
            for c in _ns_cols(t, ns):
                key = c[len(ns) + 1 :]
                nk = re.sub(pat, rep, key)
                if nk != key:
                    ren[c] = f"{ns}.{nk}"
            if ren:
                t = t.rename_columns([ren.get(c, c) for c in t.column_names])
            return t
        return self._replace_cols(
            t, _ns_cols(t, ns), mask, lambda c: pc.replace_substring_regex(c, pat, rep)
        )

    def _ed_replace_all_matches(self, t, mask):
        ns, glob, rep = self.args[0].rstrip("."), _unquote(self.args[1]), _unquote(self.args[2])
        rx = _glob_to_re2(glob)

        def fn(c):
            m = pc.match_substring_regex(c, rx)
            return pc.if_else(pc.fill_null(m, False), rep, c)

        return self._replace_cols(t, _ns_cols(t, ns), mask, fn)

    def _ed_truncate_all(self, t, mask):
        ns, lim = self.args[0].rstrip("."), int(self.args[1])
        return self._replace_cols(
            t, _ns_cols(t, ns), mask, lambda c: pc.utf8_slice_codeunits(c, 0, lim)
        )


class TransformProcessor(BatchOp):
    """Ordered OTTL statement group over log batches
    (processor/transformprocessor/internal/logs/processor.go:50-59).

    ``context`` selects the OTTL context: ``log`` (default), ``span``,
    ``spanevent`` or ``datapoint`` — non-log contexts attach their
    derived path views (``start_time``/``end_time``/``time`` timestamp
    forms of the nano columns, the read-only ``kind.string`` name) for
    the statement group and sync edits back afterwards
    (stages/contexts.py; pkg/ottl/contexts/ottlspan, ottldatapoint).
    Context enum symbols (SPAN_KIND_*, STATUS_CODE_*, FLAG_*,
    METRIC_DATA_TYPE_*) are always available in expressions."""

    def __init__(self, statements: list[str], error_mode: str = "ignore",
                 context: str = "log", **kw):
        super().__init__(**kw)
        if context not in ("log", "resource", "scope", "span", "spanevent",
                           "datapoint", "metric"):
            raise ValueError(f"unknown OTTL context {context!r}")
        self.statements = [_Statement(*parse_statement(s)) for s in statements]
        self.error_mode = error_mode
        self.context = context

    def transform(self, t: pa.Table) -> pa.Table:
        from .contexts import attach_context_aliases, sync_context_aliases

        if self.context not in ("log", "resource", "scope"):
            t = attach_context_aliases(t, self.context)
        for st in self.statements:
            try:
                t = st(t)
            except Exception:
                if self.error_mode == "propagate":
                    raise
        if self.context not in ("log", "resource", "scope"):
            t = sync_context_aliases(t, self.context)
        # the log context's `cache` is per-record scratch
        # (pkg/ottl/contexts/ottllog/log.go:155-210) — statements may
        # stage values in cache.* paths, but it never leaves the
        # processor
        scratch = [c for c in t.column_names if c == "cache" or c.startswith("cache.")]
        if scratch:
            t = t.drop_columns(scratch)
        return t

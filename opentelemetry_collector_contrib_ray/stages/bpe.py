"""Distributed BPE-merge training rounds — the pair-counting core of
byte-pair-encoding tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"), the one
genuinely corpus-scale stage of building a tokenizer for LLM training
data.

Shape (and why it scales):

1. **Vocabulary, not corpus.** BPE trains on the deduped word-frequency
   table.  One ``hash_groupby_sum`` over per-block word counts is the
   only corpus-scale exchange; afterwards every round runs over the
   (much smaller) vocabulary, which stays distributed and never moves
   again.
2. **Single-char symbol encoding.** Merged symbols are assigned
   private-use codepoints (U+E000+k), so a word's symbol sequence after
   k merges is just a STRING in the extended alphabet, and applying a
   merge is ``str.replace(a+b, chr(0xE000+k))`` — Python's leftmost
   non-overlapping replace IS the BPE greedy merge order, and is
   byte-for-byte the semantics of SQL ``replace()``, which is what
   makes the whole computation oracle-checkable round by round.
3. **Per-round pair counting is vectorized**: each block joins its
   words with ``\\n``, reinterprets the UTF-32 buffer as a uint32 numpy
   array, masks boundary pairs, packs (a, b) into one int64 and
   bincounts with the word frequencies as weights.  Only the tiny
   (pair, count) partials leave the block; the argmax pair (count desc,
   then lexicographically smallest — deterministic) is picked from the
   compact-grouped result on the driver, O(distinct pairs) driver
   state.
4. Rounds are sequential by nature (merge k+1 counts pairs in the
   alphabet produced by merge k); each round re-derives the encoding
   from the raw vocabulary with the ≤k accumulated ``replace`` calls,
   so the loop is stateless/restartable and unrolls to SQL CTEs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: first private-use codepoint used for merged symbols
MERGE_BASE = 0xE000
_PACK = 1 << 21  # pair packing: a * 2^21 + b (codepoints < 2^21)


def build_vocab(docs, text_col: str = "text", num_partitions: int = 64):
    """documents → distributed (word, cnt) vocabulary.

    Words are lowercase ``[a-z]+`` runs (everything else is a
    separator).  Per-block ``value_counts`` is the combiner; one
    word-hash exchange total.
    """
    import pandas as pd

    from .agg import hash_groupby_sum

    def words(t: pa.Table) -> pa.Table:
        # strip BEFORE lowering: ASCII-only lowering is unambiguous
        # across engines (unicode lowering can mint ASCII letters,
        # e.g. U+212A KELVIN SIGN → 'k')
        cleaned = pc.utf8_lower(pc.replace_substring_regex(
            pc.cast(t[text_col], pa.string()), "[^A-Za-z]+", " "))
        joined = " ".join(cleaned.to_pylist())
        vc = pd.Series(joined.split(), dtype=object).value_counts()
        return pa.table({"word": pa.array(vc.index, pa.string()),
                         "cnt": pa.array(vc.to_numpy(np.int64))})

    return hash_groupby_sum(docs.map_batches(words, batch_format="pyarrow"),
                            ["word"], "cnt", out_col="cnt",
                            num_partitions=num_partitions)


def _encode(words, merges: list[tuple[int, int]]):
    """Apply the accumulated merges: k ``str.replace`` passes over the
    word column (pandas str.replace, regex=False — C loop, leftmost
    non-overlapping, identical to SQL replace())."""
    import pandas as pd

    s = pd.Series(words, dtype=object)
    for k, (a, b) in enumerate(merges):
        s = s.str.replace(chr(a) + chr(b), chr(MERGE_BASE + k), regex=False)
    return s


def pair_counts(vocab, merges: list[tuple[int, int]]):
    """One distributed pair-count round: tiny (pair, c) Dataset."""
    from .agg import compact_groupby

    ms = tuple(merges)

    def count(t: pa.Table) -> pa.Table:
        enc = _encode(t["word"].to_pylist(), list(ms))
        cnt = pc.cast(t["cnt"], pa.int64()).to_numpy(zero_copy_only=False)
        joined = "\n".join(enc.tolist())
        arr = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        lens = enc.str.len().to_numpy(np.int64)
        # weight of every char position = its word's frequency
        w = np.repeat(cnt, lens + 1)[:arr.size]
        a, b = arr[:-1].astype(np.int64), arr[1:].astype(np.int64)
        keep = (a != 10) & (b != 10)
        packed = a[keep] * _PACK + b[keep]
        uniq, inv = np.unique(packed, return_inverse=True)
        c = np.bincount(inv, weights=w[:-1][keep].astype(np.float64))
        return pa.table({"pair": pa.array(uniq, pa.int64()),
                         "c": pa.array(c.astype(np.int64))})

    return compact_groupby(vocab.map_batches(count, batch_format="pyarrow"),
                           ["pair"], sum_cols={"c": "c"})


def best_pair(counts_tbl: pa.Table) -> tuple[int, int, int]:
    """argmax by (count desc, pair asc) — deterministic tie-break."""
    pair = counts_tbl["pair"].to_numpy(zero_copy_only=False)
    c = counts_tbl["c"].to_numpy(zero_copy_only=False)
    order = np.lexsort((pair, -c))
    p = int(pair[order[0]])
    return p // _PACK, p % _PACK, int(c[order[0]])


def expand_token(s: str, merges: list[tuple[int, int]]) -> str:
    """Merged-symbol string → original characters (undo the encoding,
    later codes first so nested merges unwrap)."""
    for k in range(len(merges) - 1, -1, -1):
        a, b = merges[k]
        s = s.replace(chr(MERGE_BASE + k), chr(a) + chr(b))
    return s


def train_merges(vocab, rounds: int, top_pairs: int = 10) -> pa.Table:
    """Run ``rounds`` BPE merge rounds; return the audit table:
    one row per learned merge (kind='merge', rnk=0) plus the
    ``top_pairs`` most frequent remaining pairs of the final alphabet
    (kind='pair', rank by count desc / pair asc)."""
    merges: list[tuple[int, int]] = []
    out_rows = []
    for r in range(1, rounds + 1):
        counts = pair_counts(vocab, merges).materialize()
        tbl = pa.concat_tables(
            list(counts.iter_batches(batch_format="pyarrow")))
        a, b, c = best_pair(tbl)
        out_rows.append(("merge", r,
                         expand_token(chr(a) + chr(b), merges), c, 0))
        merges.append((a, b))
    final = pair_counts(vocab, merges).materialize()
    tbl = pa.concat_tables(
        list(final.iter_batches(batch_format="pyarrow")))
    pair = tbl["pair"].to_numpy(zero_copy_only=False)
    c = tbl["c"].to_numpy(zero_copy_only=False)
    order = np.lexsort((pair, -c))[:top_pairs]
    for i, ix in enumerate(order, start=1):
        p = int(pair[ix])
        tok = expand_token(chr(p // _PACK) + chr(p % _PACK), merges)
        out_rows.append(("pair", rounds + 1, tok, int(c[ix]), i))
    return pa.table({
        "kind": pa.array([r[0] for r in out_rows], pa.string()),
        "round": pa.array([r[1] for r in out_rows], pa.int64()),
        "token": pa.array([r[2] for r in out_rows], pa.string()),
        "freq": pa.array([r[3] for r in out_rows], pa.int64()),
        "rnk": pa.array([r[4] for r in out_rows], pa.int64()),
    })

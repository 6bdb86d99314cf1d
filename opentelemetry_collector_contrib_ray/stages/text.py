"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All stateless-vectorizable parts run as plain ``map_batches`` fns; the
language-ID profile table is per-actor state (compiled once, actor
pool) — same shape as the reference's stateful enrichers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .base import set_column, pa_from_pandas, arrow_out

# ----------------------------------------------------------- token count

_TOKEN_RE = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"  # BPE-ish: words + single punct


def token_stats(t: pa.Table, col: str = "text") -> pa.Table:
    """whitespace tokens, BPE-ish regex tokens, char count — vectorized."""
    c = t[col]
    ws = pc.list_value_length(pc.split_pattern_regex(pc.utf8_trim_whitespace(c), r"\s+"))
    empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(c)), 0)
    ws = pc.if_else(empty, pa.scalar(0, pa.int32()), ws)
    bpe = pc.count_substring_regex(c, _TOKEN_RE)
    t = set_column(t, "n_tokens_ws", pc.cast(ws, pa.int64()))
    t = set_column(t, "n_tokens_bpe", pc.cast(bpe, pa.int64()))
    t = set_column(t, "n_chars_text", pc.cast(pc.utf8_length(c), pa.int64()))
    return t


# ----------------------------------------------------------- quality

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def quality_score(t: pa.Table, col: str = "text") -> pa.Table:
    """Length / punctuation / stopword-ratio quality features + a simple
    composite score in [0, 1]. All pyarrow kernels."""
    c = t[col]
    n_char = pc.utf8_length(c)
    n_alpha = pc.count_substring_regex(c, "[A-Za-z]")
    n_punct = pc.count_substring_regex(c, r"[^\w\s]")
    n_tok = pc.count_substring_regex(c, r"\S+")
    stop_pat = r"(?i)\b(?:" + "|".join(_STOPWORDS) + r")\b"
    n_stop = pc.count_substring_regex(c, stop_pat)
    f = lambda x: pc.cast(x, pa.float64())
    denom = pc.max_element_wise(f(n_char), 1.0)
    tokd = pc.max_element_wise(f(n_tok), 1.0)
    alpha_ratio = pc.divide(f(n_alpha), denom)
    punct_ratio = pc.divide(f(n_punct), denom)
    stop_ratio = pc.divide(f(n_stop), tokd)
    mean_word_len = pc.divide(f(n_char), tokd)
    t = set_column(t, "alpha_ratio", alpha_ratio)
    t = set_column(t, "punct_ratio", punct_ratio)
    t = set_column(t, "stopword_ratio", stop_ratio)
    t = set_column(t, "mean_word_len", mean_word_len)
    len_ok = pc.and_(pc.greater_equal(n_char, 20), pc.less_equal(n_char, 20000))
    score = pc.multiply(
        pc.multiply(alpha_ratio, pc.subtract(1.0, pc.min_element_wise(punct_ratio, 1.0))),
        pc.cast(len_ok, pa.float64()),
    )
    return set_column(t, "quality_score", score)


# ----------------------------------------------------------- gopher rules

_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(t: pa.Table, col: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_stopwords: int = 2) -> pa.Table:
    """Gopher-style document quality rules (Rae et al. 2021, public
    heuristics): word-count range, mean word length 3–10, symbol-to-word
    ratio ≤0.1, bullet-line ratio ≤0.9, ellipsis-line ratio ≤0.3,
    ≥80% words containing an alphabetic char, ≥2 stopwords present.

    Every rule is an INTEGER cross-multiplied comparison (e.g.
    ``3·n_words ≤ n_chars_nospace ≤ 10·n_words``) — no float ratios —
    so a SQL twin hashes identically. All pyarrow RE2 kernels, one pass.
    """
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    c = pc.fill_null(pc.cast(c, pa.string()), "")
    i64 = lambda x: pc.cast(x, pa.int64())

    n_words = i64(pc.count_substring_regex(c, r"\S+"))
    n_nospace = i64(pc.count_substring_regex(c, r"\S"))
    n_sym = i64(pc.add(pc.count_substring(c, "#"),
                       pc.count_substring_regex(c, r"\.\.\.|…")))
    n_lines = i64(pc.add(pc.count_substring(c, "\n"), 1))
    n_bullet = i64(pc.count_substring_regex(c, r"(?m)^[ \t]*[-*•]"))
    n_ellipsis_end = i64(pc.count_substring_regex(c, r"(?m)(\.\.\.|…)$"))
    n_alpha_words = i64(pc.count_substring_regex(c, r"\S*[A-Za-z]\S*"))
    n_stop = None
    for w in _GOPHER_STOPWORDS:
        hit = i64(pc.greater(pc.count_substring_regex(c, rf"\b{w}\b"), 0))
        n_stop = hit if n_stop is None else pc.add(n_stop, hit)

    words_ok = pc.and_(pc.greater_equal(n_words, min_words),
                       pc.less_equal(n_words, max_words))
    mwl_ok = pc.and_(
        pc.less_equal(pc.multiply(n_words, 3), n_nospace),
        pc.less_equal(n_nospace, pc.multiply(n_words, 10)),
    )
    sym_ok = pc.less_equal(pc.multiply(n_sym, 10), n_words)
    bullet_ok = pc.less_equal(pc.multiply(n_bullet, 10), pc.multiply(n_lines, 9))
    ellipsis_ok = pc.less_equal(pc.multiply(n_ellipsis_end, 10), pc.multiply(n_lines, 3))
    alpha_ok = pc.greater_equal(pc.multiply(n_alpha_words, 10), pc.multiply(n_words, 8))
    stop_ok = pc.greater_equal(n_stop, min_stopwords)

    gopher_pass = words_ok
    for flag in (mwl_ok, sym_ok, bullet_ok, ellipsis_ok, alpha_ok, stop_ok):
        gopher_pass = pc.and_(gopher_pass, flag)

    for name, arr in [
        ("n_words", n_words), ("n_chars_nospace", n_nospace),
        ("n_symbols", n_sym), ("n_lines", n_lines),
        ("n_bullet_lines", n_bullet), ("n_ellipsis_lines", n_ellipsis_end),
        ("n_alpha_words", n_alpha_words), ("n_stopwords_present", n_stop),
        ("words_ok", words_ok), ("mean_word_len_ok", mwl_ok),
        ("symbol_ratio_ok", sym_ok), ("bullet_ok", bullet_ok),
        ("ellipsis_ok", ellipsis_ok), ("alpha_words_ok", alpha_ok),
        ("stopwords_ok", stop_ok), ("gopher_pass", gopher_pass),
    ]:
        t = set_column(t, name, arr)
    return t


# ----------------------------------------------------------- language id


class LangId:
    """Character n-gram / stopword heuristic language classifier.

    Actor-pool stage: tiny per-language marker profiles compiled once in
    ``__init__``. Deterministic, dependency-free; scores by marker-hit
    ratio with an ASCII prior for en."""

    PROFILES = {
        "en": (" the ", " and ", " of ", " is ", " you ", " that "),
        "fr": (" le ", " la ", " les ", " de ", " et ", " est ", " une "),
        "de": (" der ", " die ", " und ", " das ", " ist ", " nicht "),
        "es": (" el ", " la ", " los ", " de ", " que ", " es ", " una "),
        "zh": tuple("的是不我一有了人这"),
    }

    def __init__(self, col: str = "text", out: str = "lang_pred"):
        self.col = col
        self.out = out
        self.langs = list(self.PROFILES)

    def __call__(self, t: pa.Table) -> pa.Table:
        """Vectorized: one ``pc.count_substring`` kernel per marker over
        the whole column (≈30 kernels), then a per-batch argmax — no
        per-row Python loop. First language in profile order wins ties
        (argmax returns the first maximum), matching the strict-``>``
        scan it replaces."""
        c = t[self.col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        low = pc.utf8_lower(pc.fill_null(pc.cast(c, pa.string()), ""))
        padded = pc.binary_join_element_wise(" ", low, " ", "")
        m = np.zeros((t.num_rows, len(self.langs)), dtype=np.int64)
        for i, lang in enumerate(self.langs):
            for mark in self.PROFILES[lang]:
                m[:, i] += np.asarray(pc.count_substring(padded, mark))
        best = m.max(axis=1)
        idx = m.argmax(axis=1)
        preds = np.where(best > 0, np.array(self.langs, dtype=object)[idx], "unknown")
        return set_column(t, self.out, pa.array(preds, type=pa.string()))


# ----------------------------------------------------------- fingerprint


_FP_BASE = np.uint64(1099511628211)
# base is odd ⇒ invertible mod 2^64; the modular inverse turns the
# window sum into a prefix-sum difference (see rolling_fingerprint)
_FP_BASE_INV = np.uint64(pow(1099511628211, -1, 2**64))


def _ragged_arange(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(intra-group index 0..count_i-1 flattened, group start offsets)."""
    ends = np.cumsum(counts)
    starts = ends - counts
    intra = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(starts, counts)
    return intra, starts


def _window_hashes(col, window: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All byte-window Karp-Rabin hashes for every doc in one vectorized
    pass: ``(hv, red_starts, counts)`` where ``hv`` concatenates each
    doc's window hashes ``h_j = Σ_k b[j+k]·base^k (mod 2^64)`` (docs
    shorter than ``window`` are zero-padded to one window), doc i owns
    ``hv[red_starts[i] : red_starts[i] + counts[i]]``.

    No per-row Python: all docs' UTF-8 bytes are laid into one
    zero-padded buffer, then ``h_j = (S[j+w] − S[j]) · base^{−j}``
    where ``S`` is the prefix sum of ``b[j]·base^j`` — exact in uint64
    wraparound arithmetic because the base is odd (invertible mod
    2^64), so results are bit-identical to the direct window sum.
    Valid window-start runs never cross doc boundaries by construction,
    so no masking is needed."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    b = pc.cast(pc.fill_null(pc.cast(col, pa.string()), ""), pa.large_binary())
    offs = np.frombuffer(b.buffers()[1], dtype=np.int64)[b.offset : b.offset + n + 1]
    data = np.frombuffer(b.buffers()[2], dtype=np.uint8) if b.buffers()[2] else np.empty(0, np.uint8)
    lens = np.diff(offs)
    padlens = np.maximum(lens, window)

    buf = np.zeros(int(padlens.sum()), dtype=np.uint8)
    intra_src, _ = _ragged_arange(lens)
    seg_starts = np.cumsum(padlens) - padlens
    buf[np.repeat(seg_starts, lens) + intra_src] = data[
        np.repeat(offs[:-1], lens) + intra_src
    ]

    with np.errstate(over="ignore"):
        pows = np.concatenate(
            [[np.uint64(1)], np.cumprod(np.full(len(buf) - 1, _FP_BASE, dtype=np.uint64))]
        ) if len(buf) > 1 else np.ones(len(buf), dtype=np.uint64)
        n_j = len(buf) - window + 1  # window starts in the global buffer
        pinv = np.concatenate(
            [[np.uint64(1)], np.cumprod(np.full(n_j - 1, _FP_BASE_INV, dtype=np.uint64))]
        ) if n_j > 1 else np.ones(max(n_j, 0), dtype=np.uint64)
        S = np.zeros(len(buf) + 1, dtype=np.uint64)
        np.cumsum(buf.astype(np.uint64) * pows, out=S[1:])
        h = (S[window:] - S[:-window]) * pinv  # h[j] for every global j

    counts = padlens - window + 1  # valid window starts per doc
    intra_w, red_starts = _ragged_arange(counts)
    hv = h[np.repeat(seg_starts, counts) + intra_w]
    return hv, red_starts, counts


def rolling_fingerprint(t: pa.Table, col: str = "text", window: int = 16,
                        out: str = "fingerprint") -> pa.Table:
    """Karp-Rabin-style rolling-hash document fingerprint: min over all
    byte-window hashes per doc (winnowing's min-sampling, single window
    size). Fully vectorized — see ``_window_hashes``."""
    if t.num_rows == 0:
        return set_column(t, out, pa.array([], type=pa.int64()))
    hv, red_starts, _ = _window_hashes(t[col], window)
    mins = np.minimum.reduceat(hv, red_starts)
    return set_column(t, out, pa.array(mins.view(np.int64)))


def winnow_fingerprints(t: pa.Table, col: str = "text", k: int = 8,
                        w: int = 4, doc_col: str = "doc_id") -> pa.Table:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
    2003 — the MOSS local document fingerprinting algorithm): over each
    document's k-gram Karp-Rabin hash sequence (``_window_hashes``),
    slide a window of ``w`` consecutive hashes and select the minimum,
    breaking ties by the RIGHTMOST position; the fingerprint set is
    the distinct selected positions. Guarantees every match of length
    ≥ w+k−1 is caught while sampling ~2/(w+1) of positions.

    Fully vectorized: all docs' hash runs lie in one max-padded buffer
    (pads are uint64-max so they never win a min), windows come from
    one ``sliding_window_view``, the rightmost-tie argmin is one
    reversed-equality argmax, and position dedup is one ``np.unique``.
    A doc with fewer than ``w`` k-grams gets ONE window over its real
    hashes (classic boundary rule). Returns one row per fingerprint:
    (doc_id, fp_pos 1-based, fp_hash int64 bit-view of the uint64)."""
    if t.num_rows == 0:
        return pa.table({doc_col: t[doc_col],
                         "fp_pos": pa.array([], pa.int64()),
                         "fp_hash": pa.array([], pa.int64())})
    hv, _, counts = _window_hashes(t[col], k)
    counts = counts.astype(np.int64)
    padc = np.maximum(counts, w)
    seg = np.cumsum(padc) - padc
    # 2^64-1 pads the (rare) sub-window docs. Documented assumption: a
    # REAL k-gram hash equal to the sentinel inside such a doc would
    # tie with the pads and the rightmost-tie rule could select a pad
    # position (probability ~n/2^64 per corpus — astronomically small,
    # and the SQL twin would flag the out-of-range fp_pos loudly).
    buf = np.full(int(padc.sum()), np.uint64(0xFFFFFFFFFFFFFFFF),
                  dtype=np.uint64)
    intra, _ = _ragged_arange(counts)
    buf[np.repeat(seg, counts) + intra] = hv

    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(buf, w)
    nwin = padc - w + 1
    intra_w, _ = _ragged_arange(nwin)
    starts = np.repeat(seg, nwin) + intra_w
    wv = win[starts]
    m = wv.min(axis=1)
    rt = w - 1 - np.argmax(wv[:, ::-1] == m[:, None], axis=1)
    selpos = starts + rt
    docw = np.repeat(np.arange(len(counts)), nwin)
    uniq_pos, first_idx = np.unique(selpos, return_index=True)
    doc_sel = docw[first_idx]
    ids = t[doc_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({
        doc_col: ids.take(pa.array(doc_sel)),
        "fp_pos": pa.array((uniq_pos - seg[doc_sel] + 1).astype(np.int64)),
        "fp_hash": pa.array(buf[uniq_pos].view(np.int64)),
    })


def top_terms(ds, col: str = "text", k: int = 20, num_partitions: int = 64):
    """Corpus-wide term frequencies, top-k: per-batch pandas
    value_counts (combiner) → term-hash partition merge → global
    sort/limit. Only (term, partial-count) rows cross the wire; ties
    broken by term for determinism."""

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(pc.cast(t[col], pa.string()), "")),
            r"\s+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
        flat = flat[flat != ""]
        vc = pd.Series(flat).value_counts()
        terms = vc.index.to_numpy().astype("U")
        h = pd.util.hash_array(terms)
        return pa.table({
            "term": pa.array(terms.tolist(), type=pa.string()),
            "n": pa.array(vc.to_numpy(), type=pa.int64()),
            "__p": pa.array((h % np.uint64(num_partitions)).astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("term", as_index=False)["n"].sum()

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge), batch_format="pandas")
    )
    # Ray sort API: per-key descending flags
    return out.sort(["n", "term"], descending=[True, False]).limit(k)


# ----------------------------------------------------------- repetition

def repetition_stats(t: pa.Table, col: str = "text") -> pa.Table:
    """Within-document repetition signals (RefinedWeb / Gopher
    rep-removal, Rae et al. 2021 §A1.1, Penedo et al. 2023 —
    public heuristics): duplicate-line fraction, most-frequent-word
    share, duplicate word-2-gram fraction.

    All rules are INTEGER cross-multiplied comparisons so a DuckDB SQL
    twin (``list_distinct`` / per-doc mode counts) hashes identically:

    - ``dup_line_ok``:  10·(n_lines − n_distinct_lines) ≤ 3·n_lines
    - ``top_word_ok``:  5·max_word_count ≤ n_words  (most frequent
      word ≤ 20% of tokens; vacuously true only via the counts)
    - ``dup_2gram_ok``: 10·(n_2grams − n_distinct_2grams) ≤ 2·n_2grams

    Vectorized: one split kernel per unit (lines, words), duplicate
    counting via pandas ``drop_duplicates`` / ``groupby`` on the
    exploded (doc, token) rows — C-speed hash tables, no Python loop
    over rows. Tokenization mirrors the corpus-wide convention
    (``utf8_trim_whitespace`` + ``\\s+`` split, empty doc → one ''
    token) so the SQL twin's ``string_split_regex`` agrees."""
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    c = pc.fill_null(pc.cast(c, pa.string()), "")
    nrows = len(c)

    def _explode(list_arr):
        if isinstance(list_arr, pa.ChunkedArray):
            list_arr = list_arr.combine_chunks()
        offsets = np.asarray(list_arr.offsets, dtype=np.int64)
        counts = offsets[1:] - offsets[:-1]
        flat = list_arr.flatten().to_numpy(zero_copy_only=False)
        return np.repeat(np.arange(nrows), counts), flat, counts

    # lines: raw split on \n (no trim — blank lines are real lines)
    ld, lines, n_lines = _explode(pc.split_pattern(c, "\n"))
    n_dl = np.bincount(
        pd.DataFrame({"d": ld, "x": lines}).drop_duplicates()["d"].to_numpy(),
        minlength=nrows)

    # words: corpus tokenization convention
    wd, words, n_words = _explode(
        pc.split_pattern_regex(pc.utf8_trim_whitespace(c), r"\s+"))
    wdf = pd.DataFrame({"d": wd, "x": words})
    n_dw = np.bincount(wdf.drop_duplicates()["d"].to_numpy(), minlength=nrows)
    per_word = wdf.groupby(["d", "x"], sort=False).size()
    max_wc = per_word.groupby(level=0).max().reindex(
        range(nrows), fill_value=0).to_numpy()

    # word 2-grams (within-doc only)
    w2 = len(words)
    if w2 >= 2:
        left_doc = wd[: w2 - 1]
        same = left_doc == wd[1:]
        g = np.char.add(np.char.add(words[: w2 - 1].astype("U"), " "),
                        words[1:].astype("U"))
        gd, gx = left_doc[same], g[same]
    else:
        gd = np.array([], dtype=np.int64)
        gx = np.array([], dtype="U1")
    n_g = np.bincount(gd, minlength=nrows)
    n_dg = np.bincount(
        pd.DataFrame({"d": gd, "x": gx}).drop_duplicates()["d"].to_numpy(),
        minlength=nrows)

    n_lines = n_lines.astype(np.int64)
    n_words = n_words.astype(np.int64)
    dup_lines = (n_lines - n_dl).astype(np.int64)
    dup_g = (n_g - n_dg).astype(np.int64)
    dup_line_ok = 10 * dup_lines <= 3 * n_lines
    top_word_ok = 5 * max_wc <= n_words
    dup_2gram_ok = 10 * dup_g <= 2 * n_g
    rep_pass = dup_line_ok & top_word_ok & dup_2gram_ok

    for name, arr, typ in [
        ("n_lines", n_lines, pa.int64()),
        ("n_dup_lines", dup_lines, pa.int64()),
        ("n_words", n_words, pa.int64()),
        ("max_word_count", max_wc.astype(np.int64), pa.int64()),
        ("n_2grams", n_g.astype(np.int64), pa.int64()),
        ("n_dup_2grams", dup_g, pa.int64()),
        ("dup_line_ok", dup_line_ok, pa.bool_()),
        ("top_word_ok", top_word_ok, pa.bool_()),
        ("dup_2gram_ok", dup_2gram_ok, pa.bool_()),
        ("repetition_pass", rep_pass, pa.bool_()),
    ]:
        t = set_column(t, name, pa.array(arr, type=typ))
    return t


# ----------------------------------------------------------- n-gram LM score

def top_ngrams(ds, n: int = 2, k: int = 10_000, col: str = "text",
               num_partitions: int = 64):
    """Corpus-wide word-n-gram OCCURRENCE counts, top-k by (count desc,
    gram asc) — the bounded "language model" table for
    ``ngram_lm_score``. Same shape as ``top_terms``: per-batch
    value_counts combiner → gram-hash partition merge → distributed
    sort/limit. Only (gram, partial-count) rows cross the wire; the
    result is ≤ k rows no matter the corpus size."""
    from .decontam import _word_ngrams

    def partial(t: pa.Table) -> pa.Table:
        _, g = _word_ngrams(t[col], n)
        vc = pd.Series(g).value_counts()
        terms = vc.index.to_numpy().astype("U")
        h = pd.util.hash_array(terms)
        return pa.table({
            "gram": pa.array(terms.tolist(), type=pa.string()),
            "n": pa.array(vc.to_numpy(), type=pa.int64()),
            "__p": pa.array((h % np.uint64(num_partitions)).astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("gram", as_index=False)["n"].sum()

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge), batch_format="pandas")
    )
    return out.sort(["n", "gram"], descending=[True, False]).limit(k)


def ngram_lm_score(ds, gram_table, n: int = 2, col: str = "text",
                   out_col: str = "lm_score"):
    """Cheap LM-style fluency proxy (public practice: KenLM-perplexity
    corpus filtering à la CCNet/Gopher, here with an integer-exact
    count model instead of a float LM so the SQL twin hashes
    identically): per doc, the sum over its n-gram OCCURRENCES of the
    corpus-wide count of that n-gram from the broadcast top-k table.
    High score = made of common constructions; rare/garbled text
    scores low.

    ``gram_table`` is the ``top_ngrams`` result as a pandas/arrow
    table (gram, n) or a ``ray.ObjectRef`` to the prepared
    (sorted_grams, counts) pair. Broadcast once; the scoring pass is
    one ``np.searchsorted`` per batch — zero shuffles."""
    import ray

    from .decontam import _word_ngrams

    if isinstance(gram_table, ray.ObjectRef):
        ref = gram_table
    else:
        if isinstance(gram_table, pa.Table):
            gram_table = gram_table.to_pandas()
        grams = gram_table["gram"].to_numpy().astype("U")
        counts = gram_table["n"].to_numpy().astype(np.int64)
        order = np.argsort(grams, kind="stable")
        ref = ray.put((grams[order], counts[order]))

    def score(t: pa.Table) -> pa.Table:
        grams_s, counts_s = ray.get(ref)
        d, g = _word_ngrams(t[col], n)
        nrows = t.num_rows
        if len(g) == 0 or len(grams_s) == 0:
            s = np.zeros(nrows, dtype=np.int64)
        else:
            g = g.astype(grams_s.dtype) if g.dtype.itemsize < grams_s.dtype.itemsize else g
            pos = np.minimum(np.searchsorted(grams_s, g), len(grams_s) - 1)
            hit = grams_s[pos] == g
            s = np.bincount(d[hit], weights=counts_s[pos[hit]],
                            minlength=nrows).astype(np.int64)
        return t.append_column(out_col, pa.array(s))

    return ds.map_batches(score, batch_format="pyarrow")


# ----------------------------------------------------------- PII scan

# RE2 patterns (pyarrow and DuckDB both compile RE2, so the SQL twins
# match byte-for-byte); counts are non-overlapping leftmost matches on
# the ORIGINAL text, independently per pattern
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_stats(t: pa.Table, col: str = "text", mask: str | None = None,
              patterns: dict[str, str] = PII_PATTERNS) -> pa.Table:
    """Per-doc PII detection: one ``pc.count_substring_regex`` kernel
    per pattern → ``n_<name>`` count columns + ``has_pii`` flag; with
    ``mask`` set, also a ``<col>_masked`` column with every match
    replaced (patterns applied in dict order, composing with the
    log-side redactionprocessor). Zero shuffles, zero Python loops."""
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    c = pc.fill_null(pc.cast(c, pa.string()), "")
    total = np.zeros(t.num_rows, dtype=np.int64)
    for name, pat in patterns.items():
        n = pc.count_substring_regex(c, pat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = set_column(t, f"n_{name}", pa.array(n))
        total += n
    if mask is not None:
        masked = c
        for pat in patterns.values():
            masked = pc.replace_substring_regex(masked, pattern=pat,
                                                replacement=mask)
        t = set_column(t, f"{col}_masked", masked)
    return set_column(t, "has_pii", pa.array(total > 0))


# ------------------------------------------------- training-chunk split

def chunk_tokens(t: pa.Table, size: int = 512, col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """Split every document into fixed-size non-overlapping token
    chunks (trailing partial kept) — the sequence-chunking step of a
    training-data pipeline. Output rows: ``(id_col, chunk_idx,
    n_tokens, chunk_text)`` with ``chunk_text`` the chunk's tokens
    joined by single spaces (whitespace-normalized).

    Fully vectorized: one split kernel → chunk boundaries are CONTIGUOUS
    runs of the flat token array, so an Arrow ``LargeListArray`` built
    from pure-offset arithmetic + ONE ``pc.binary_join`` kernel emits
    every chunk string in C. Embarrassingly parallel per batch — zero
    shuffles, no per-chunk Python."""
    c0 = t[col]
    if isinstance(c0, pa.ChunkedArray):
        c0 = c0.combine_chunks()
    segs = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(pc.cast(c0, pa.string()), "")),
        r"\s+")
    if isinstance(segs, pa.ChunkedArray):
        segs = segs.combine_chunks()
    offsets = np.asarray(segs.offsets, dtype=np.int64)
    counts = offsets[1:] - offsets[:-1]
    toks_flat = segs.flatten()
    n_chunks = (counts + size - 1) // size
    doc_of = np.repeat(np.arange(len(counts)), n_chunks)
    idx, _ = _ragged_arange(n_chunks)
    tok_start = np.cumsum(counts) - counts
    g_start = tok_start[doc_of] + idx * size
    g_end = np.minimum(g_start + size, tok_start[doc_of] + counts[doc_of])
    # consecutive chunks tile the flat token array exactly, so the
    # list-offset array is just every chunk start + the global end
    list_offs = np.concatenate([g_start, [int(counts.sum())]])
    lists = pa.LargeListArray.from_arrays(
        pa.array(list_offs, type=pa.int64()),
        pc.cast(toks_flat, pa.large_string()))
    texts = pc.binary_join(lists, pa.scalar(" ", type=pa.large_string()))
    ids = t[id_col].to_numpy(zero_copy_only=False)
    return pa.table({
        id_col: pa.array(ids[doc_of], type=pa.int64()),
        "chunk_idx": pa.array(idx),
        "n_tokens": pa.array((g_end - g_start).astype(np.int64)),
        "chunk_text": pc.cast(texts, pa.string()),
    })


def top_tfidf(ds, col: str = "text", id_col: str = "doc_id",
              num_partitions: int = 64):
    """Per-document most-distinctive term by an integer-exact TF-IDF
    rank: ``score = tf * N_docs // df`` (monotone in tf/df, integer so
    the SQL twin hashes identically), ties broken by higher tf then
    lexicographically smallest term.

    Shape for 100 TB — the document-frequency table is never
    broadcast and never driver-resident:

    1. per batch: one split + pandas (doc, term) groupby → distinct
       ``(d, term, tf)`` rows.
    2. partition by ``hash(term)``: each partition holds ALL rows of
       its terms, so ``df`` is a local group size; score locally and
       pre-reduce to ONE candidate row per doc per partition.
    3. partition by ``hash(d)``: final argmax per doc (≤ P candidate
       rows per doc arrive).

    Output: ``(id_col, term, tf, df, score)``; empty docs emit no row.
    """
    P = num_partitions
    n_docs = ds.count()

    def tf_rows(t: pa.Table) -> pa.Table:
        c = pc.utf8_trim_whitespace(
            pc.fill_null(pc.cast(t[col], pa.string()), ""))
        segs = pc.split_pattern_regex(c, r"\s+")
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        offsets = np.asarray(segs.offsets, dtype=np.int64)
        empty = np.asarray(pc.equal(pc.utf8_length(c), 0))
        flat = segs.flatten().to_numpy(zero_copy_only=False)
        keep = np.ones(len(flat), dtype=bool)
        starts = offsets[:-1]
        keep[starts[empty]] = False
        ids = t[id_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "d": np.repeat(ids, offsets[1:] - offsets[:-1])[keep],
            "term": flat[keep],
        })
        out = df.groupby(["d", "term"], as_index=False, dropna=False).size() \
            .rename(columns={"size": "tf"})
        h = pd.util.hash_array(out["term"].to_numpy().astype("U"))
        out["__p"] = (h % np.uint64(P)).astype(np.int64)
        return pa_from_pandas(out)

    def score_and_prereduce(g: pd.DataFrame) -> pd.DataFrame:
        df_counts = g.groupby("term", sort=False)["d"].transform("size")
        g = g.assign(df=df_counts.to_numpy(np.int64))
        g["score"] = g["tf"].to_numpy(np.int64) * n_docs // g["df"].to_numpy()
        g = g.sort_values(["d", "score", "tf", "term"],
                          ascending=[True, False, False, True],
                          kind="mergesort")
        g = g.drop_duplicates("d", keep="first")
        g["__q"] = (g["d"].to_numpy(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15) % np.uint64(P)).astype(np.int64)
        return g[["d", "term", "tf", "df", "score", "__q"]]

    def final_argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["d", "score", "tf", "term"],
                          ascending=[True, False, False, True],
                          kind="mergesort").drop_duplicates("d", keep="first")
        out = g[["d", "term", "tf", "df", "score"]].rename(columns={"d": id_col})
        return out.astype({"tf": "int64", "df": "int64", "score": "int64"})

    return (
        ds.map_batches(tf_rows, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(score_and_prereduce), batch_format="pandas")
        .groupby("__q")
        .map_groups(arrow_out(final_argmax), batch_format="pandas")
    )


def top_terms_per_group(ds, group_col: str, k: int = 5, col: str = "text",
                        num_partitions: int = 64):
    """Top-k terms within every group (per-language / per-domain
    vocabulary profile): per-batch (group, term) pandas value_counts
    combiner → (group, term)-hash merge (full counts per pair live in
    one partition) → per-group rank pre-reduce (each count partition
    keeps at most k candidates per group) → group-hash final top-k.
    Ties break (count desc, term asc), so output is deterministic.

    Only (group, term, count) rows cross the wire; rows reaching the
    final exchange are ≤ k per group per count-partition.

    Output: ``(group_col, term, n, rank)`` with rank 1..k.
    """
    P = num_partitions

    def partial(t: pa.Table) -> pa.Table:
        c = pc.utf8_trim_whitespace(
            pc.fill_null(pc.cast(t[col], pa.string()), ""))
        toks = pc.split_pattern_regex(c, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
        grp = np.repeat(t[group_col].to_numpy(zero_copy_only=False),
                        offsets[1:] - offsets[:-1])
        m = flat != ""
        df = pd.DataFrame({"g": grp[m], "term": flat[m]})
        out = df.groupby(["g", "term"], as_index=False, dropna=False).size() \
            .rename(columns={"size": "n"})
        h = (pd.util.hash_array(out["g"].to_numpy().astype("U"))
             ^ pd.util.hash_array(out["term"].to_numpy().astype("U")))
        out["__p"] = (h % np.uint64(P)).astype(np.int64)
        return pa_from_pandas(out)

    def merge_and_prereduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["g", "term"], as_index=False, dropna=False)["n"].sum()
        g = g.sort_values(["g", "n", "term"], ascending=[True, False, True],
                          kind="mergesort")
        g = g[g.groupby("g", sort=False, dropna=False).cumcount() < k]
        g["__q"] = (pd.util.hash_array(g["g"].to_numpy().astype("U"))
                    % np.uint64(P)).astype(np.int64)
        return g

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["g", "n", "term"], ascending=[True, False, True],
                          kind="mergesort")
        g["rank"] = g.groupby("g", sort=False, dropna=False).cumcount() + 1
        g = g[g["rank"] <= k]
        out = g[["g", "term", "n", "rank"]].rename(columns={"g": group_col})
        return out.astype({"n": "int64", "rank": "int64"})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge_and_prereduce), batch_format="pandas")
        .groupby("__q")
        .map_groups(arrow_out(final_topk), batch_format="pandas")
    )


def ngram_novelty(ds, n: int = 3, col: str = "text", id_col: str = "doc_id",
                  num_partitions: int = 64):
    """Per-document n-gram novelty: of a doc's DISTINCT word n-grams,
    how many appear in no other document (corpus df = 1)? High-novelty
    docs carry unique content; low-novelty docs are template/boilerplate
    — a standard diversity signal for training-data selection.

    Shape: distinct ``(doc, hash64(gram))`` int rows (one flat-token
    shifted-slice join per batch, pandas drop_duplicates) → gram-hash
    exchange where df is a local group size → per-doc partials
    ``(doc, n_grams, n_unique)`` → doc-hash sum rollup. Text never
    shuffles; everything after the explode is int rows. Counts are
    integers, so the SQL twin hashes identically.

    Output: ``(id_col, n_grams, n_unique)``; docs with < n tokens emit
    no row (they have no n-grams).
    """
    P = num_partitions
    SEP = "\x1f"
    STEP = np.uint64(0x9E3779B97F4A7C15)

    def explode(t: pa.Table) -> pa.Table:
        c = pc.utf8_trim_whitespace(
            pc.fill_null(pc.cast(t[col], pa.string()), ""))
        segs = pc.split_pattern_regex(c, r"\s+")
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        offsets = np.asarray(segs.offsets, dtype=np.int64)
        counts = offsets[1:] - offsets[:-1]
        empty = np.asarray(pc.equal(pc.utf8_length(c), 0))
        flat = segs.flatten()
        if empty.any():
            keep = np.ones(len(flat), dtype=bool)
            keep[offsets[:-1][empty]] = False
            flat = flat.filter(pa.array(keep))
            counts = np.where(empty, 0, counts)
        nt = len(flat)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if nt < n:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.int64()),
                             "__p": pa.array([], type=pa.int64())})
        grams = pc.binary_join_element_wise(
            *[flat.slice(j, nt - n + 1) for j in range(n)], SEP)
        docidx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        valid = docidx[: nt - n + 1] == docidx[n - 1:]
        h = pd.util.hash_array(
            grams.to_numpy(zero_copy_only=False).astype("U"))[valid]
        d = np.repeat(ids, counts)[: nt - n + 1][valid]
        df = pd.DataFrame({"d": d, "h": h.view(np.int64)}).drop_duplicates()
        df["__p"] = (df["h"].to_numpy(np.uint64) % np.uint64(P)).astype(np.int64)
        return pa_from_pandas(df)

    def df_partial(g: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (d, h) pairs, all occurrences of h co-located
        g = g.drop_duplicates(["d", "h"])  # across-block dedup
        dfc = g.groupby("h", sort=False)["d"].transform("size")
        out = pd.DataFrame({"d": g["d"].to_numpy(),
                            "u": (dfc.to_numpy() == 1).astype(np.int64)})
        agg = out.groupby("d", as_index=False).agg(
            n_grams=("u", "size"), n_unique=("u", "sum"))
        agg["__q"] = (agg["d"].to_numpy(np.uint64) * STEP
                      % np.uint64(P)).astype(np.int64)
        return agg

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("d", as_index=False).agg(
            n_grams=("n_grams", "sum"), n_unique=("n_unique", "sum"))
        return out.rename(columns={"d": id_col}).astype(
            {"n_grams": "int64", "n_unique": "int64"})

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(df_partial), batch_format="pandas")
        .groupby("__q")
        .map_groups(arrow_out(rollup), batch_format="pandas")
    )


def normalize_text(t: pa.Table, col: str = "text",
                   out: str = "text_norm") -> pa.Table:
    """Canonical text normalization for dedup keys and matching:
    lowercase → strip non-alphanumeric (keeping unicode letters/digits
    and spaces) → collapse whitespace runs to single spaces → trim.
    One pyarrow kernel per step, zero-shuffle; the SQL twin is the
    same lower/regexp_replace chain."""
    c = pc.fill_null(pc.cast(t[col], pa.string()), "")
    c = pc.utf8_lower(c)
    c = pc.replace_substring_regex(c, r"[^\p{L}\p{N} ]+", " ")
    c = pc.replace_substring_regex(c, r" +", " ")
    c = pc.utf8_trim(c, " ")
    return set_column(t, out, c)


def cdc_chunk_stats(t: pa.Table, col: str = "text", window: int = 8,
                    mask_mod: int = 64, id_col: str = "doc_id") -> pa.Table:
    """Content-defined chunking (CDC) statistics: cut each document's
    UTF-8 byte stream after every position whose ``window``-byte
    Karp-Rabin hash ≡ 0 (mod ``mask_mod``) — the rolling-hash
    breakpointing of storage/dataset dedup (avg chunk ≈ mask_mod
    bytes), insertion-robust unlike fixed-size chunking. Cuts strictly
    inside the doc; docs shorter than ``window`` are one chunk; empty
    docs have zero.

    Fully vectorized on the existing prefix-sum window-hash machinery
    (bit-identical mod-2^64 arithmetic, so the SQL twin counts the
    same breakpoints). Zero-shuffle; returns ``(id_col, n_bytes,
    n_chunks)``.
    """
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    b = pc.cast(pc.fill_null(pc.cast(c, pa.string()), ""), pa.large_binary())
    lens = np.diff(np.frombuffer(b.buffers()[1], dtype=np.int64)
                   [b.offset: b.offset + len(b) + 1])
    hv, red_starts, _counts = _window_hashes(c, window)
    mask = (hv % np.uint64(mask_mod) == 0).astype(np.int64)
    cm = np.concatenate(([0], np.cumsum(mask)))
    eligible = np.maximum(lens - window, 0)   # break-eligible window starts
    breaks = cm[red_starts + eligible] - cm[red_starts]
    n_chunks = np.where(lens == 0, 0, 1 + np.where(lens >= window, breaks, 0))
    return pa.table({
        id_col: t[id_col],
        "n_bytes": pa.array(lens, type=pa.int64()),
        "n_chunks": pa.array(n_chunks.astype(np.int64)),
    })


# ------------------------------------------------------------- templates

def template_mine(ds, col: str = "text",
                  masks: tuple = ((r"[0-9]+", "<#>"),),
                  k: int | None = None, num_partitions: int = 64):
    """Log template extraction (Drain-lite): collapse each line to its
    template by masking variable fields with an ordered chain of RE2
    ``(pattern, replacement)`` kernels, then count occurrences per
    template. The masking is whole-column vectorized (one
    ``pc.replace_substring_regex`` per mask), the count is a per-batch
    pandas value_counts combiner, and only (template, partial-count)
    rows cross the ONE template-hash exchange — raw lines never
    shuffle. ``k`` adds a global sort/limit (top templates); None
    returns every template with its count.

    This is the batch analog of streaming log-pattern miners: with
    digit + token masks the template set is tiny (or bounded by
    ``k``), so the merge state is negligible at any corpus size."""

    def partial(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(t[col], pa.string()), "")
        for pat, rep in masks:
            s = pc.replace_substring_regex(s, pat, rep)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        vc = pd.Series(s.to_numpy(zero_copy_only=False)).value_counts()
        tpl = vc.index.to_numpy().astype("U")
        h = pd.util.hash_array(tpl)
        return pa.table({
            "template": pa.array(tpl.tolist(), type=pa.string()),
            "n": pa.array(vc.to_numpy(), type=pa.int64()),
            "__p": pa.array((h % np.uint64(num_partitions)).astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("template", as_index=False)["n"].sum()

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge), batch_format="pandas")
    )
    if k is not None:
        out = out.sort(["n", "template"], descending=[True, False]).limit(k)
    return out


# ---------------------------------------------------------- co-occurrence

def _distinct_doc_terms(t: pa.Table, col: str, id_col: str) -> pd.DataFrame:
    """Distinct (doc, whitespace-term) rows for one batch — each doc
    lives in exactly one batch, so per-batch distinct is globally
    distinct."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(pc.cast(t[col], pa.string()), "")),
        r"\s+",
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
    ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), lens)
    keep = flat != ""
    return pd.DataFrame({"term": flat[keep], "doc": ids[keep]}).drop_duplicates()


def cooccurrence_topk(ds, col: str = "text", id_col: str = "doc_id",
                      vocab_size: int = 20, k: int = 20,
                      num_partitions: int = 64):
    """Top-k co-occurring term pairs over a BOUNDED vocabulary: pass A
    computes exact document frequencies (distinct (term, doc) int rows
    through one term-hash exchange) and picks the top ``vocab_size``
    terms by (df desc, term asc); pass B broadcasts that tiny vocab and
    reduces each batch to one V×V boolean-matmul co-occurrence partial
    (docs × V membership matrix, ``M.T @ M`` — one BLAS call per
    batch), merged by a groupby-sum over ≤ V² tiny rows.

    Bounding the vocabulary is what makes doc-level co-occurrence scale:
    the quadratic term-pair space is capped at V² regardless of corpus
    size, and raw text never shuffles in either pass."""
    from ray.data.aggregate import Sum

    # ---- pass A: exact DF, top-V terms (df desc, term asc)
    def df_partial(t: pa.Table) -> pa.Table:
        df = _distinct_doc_terms(t, col, id_col)
        vc = df.groupby("term", as_index=False).agg(df_=("doc", "size"))
        terms = vc["term"].to_numpy().astype("U")
        h = pd.util.hash_array(terms)
        vc["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa_from_pandas(vc)

    def df_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("term", as_index=False)["df_"].sum()

    top = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("__p").map_groups(arrow_out(df_merge), batch_format="pandas")
        .sort(["df_", "term"], descending=[True, False]).limit(vocab_size)
        .to_pandas()
    )
    vocab = np.sort(top["term"].to_numpy().astype("U"))
    V = len(vocab)

    # ---- pass B: V×V matmul partial per batch
    def co_partial(t: pa.Table) -> pa.Table:
        df = _distinct_doc_terms(t, col, id_col)
        df = df[np.isin(df["term"].to_numpy().astype("U"), vocab)]
        if df.empty:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        doc_codes, _ = pd.factorize(df["doc"])
        vidx = np.searchsorted(vocab, df["term"].to_numpy().astype("U"))
        m = np.zeros((doc_codes.max() + 1, V), dtype=np.float64)
        m[doc_codes, vidx] = 1.0
        cm = (m.T @ m).astype(np.int64)
        iu = np.triu_indices(V, k=1)
        n = cm[iu]
        nz = n > 0
        return pa.table({"i": pa.array(iu[0][nz], pa.int64()),
                         "j": pa.array(iu[1][nz], pa.int64()),
                         "n": pa.array(n[nz], pa.int64())})

    pairs = (
        ds.map_batches(co_partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )

    def attach(t: pa.Table) -> pa.Table:
        return pa.table({
            "term_a": pa.array(vocab[t["i"].to_numpy(zero_copy_only=False)]),
            "term_b": pa.array(vocab[t["j"].to_numpy(zero_copy_only=False)]),
            "n_docs": t["n_docs"],
        })

    return (
        pairs.map_batches(attach, batch_format="pyarrow")
        .sort(["n_docs", "term_a", "term_b"], descending=[True, False, False])
        .limit(k)
    )


# ------------------------------------------------------------- entropy

def char_entropy(t: pa.Table, col: str = "text",
                 out: str = "char_entropy", chunk: int = 2048) -> pa.Table:
    """Per-document character (codepoint) Shannon entropy in bits — a
    classic gibberish/boilerplate quality signal. Vectorized across the
    batch: docs are viewed as a fixed-width uint32 codepoint matrix
    (numpy U-dtype view), padded cells masked by length, (doc, cp)
    counts come from one value_counts over a combined int key, and
    H = log2(n) − Σ c·log2(c)/n per doc via one grouped sum. ``chunk``
    bounds the padded-matrix memory for skewed batches. Empty docs get
    null entropy."""
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    s = pc.fill_null(pc.cast(c, pa.string()), "")
    n_rows = len(s)
    H = np.full(n_rows, np.nan)
    arr = s.to_numpy(zero_copy_only=False)
    for lo in range(0, n_rows, chunk):
        sub = arr[lo:lo + chunk].astype("U")
        if sub.dtype.itemsize == 0:
            continue
        width = sub.dtype.itemsize // 4
        m = sub.view(np.uint32).reshape(len(sub), width)
        lens = (m != 0).sum(axis=1)  # U-dtype zero-pads; NUL never in text
        pos_doc, pos_col = np.nonzero(m)
        key = pos_doc.astype(np.int64) * 2_097_152 + m[pos_doc, pos_col]
        vc = pd.Series(key).value_counts()
        doc = (vc.index.to_numpy() // 2_097_152)
        cnt = vc.to_numpy().astype(np.float64)
        clog = cnt * np.log2(cnt)
        sums = np.zeros(len(sub))
        np.add.at(sums, doc, clog)
        nz = lens > 0
        h = np.full(len(sub), np.nan)
        h[nz] = np.log2(lens[nz]) - sums[nz] / lens[nz]
        H[lo:lo + len(sub)] = h
    from .base import set_column

    return set_column(t, out, pa.array(H, pa.float64(), from_pandas=True))


def hashed_linear_classifier(ds, col: str = "text", group_col: str = "lang",
                             n_buckets: int = 4096, n_classes: int = 3):
    """FastText-style hashed bag-of-words linear classifier INFERENCE
    (the batched-model-scoring representative): tokens → feature
    buckets ``H(token) % n_buckets`` → doc score vector = bucket-count
    row times a broadcast weight matrix W[n_buckets × n_classes] →
    argmax class (ties to the smallest id). Weights are a fixed
    deterministic function of the bucket index so an exact SQL twin
    exists; swap the formula for trained weights in production — the
    Ray plumbing (W built once per task closure, per-batch vectorized
    matmul-by-bincount, compact (group, class, n) partials, one tiny
    exchange) is the real thing.

    Per-token hash = Σ_{k<8} byte_k·31^k over the token's first 8
    bytes, computed with 8 vectorized gathers on the flattened Arrow
    string buffer — no per-token Python. Tokens are [A-Za-z]+ runs, so
    bytes == characters and the twin's ascii(substring(tok,k,1)) is
    byte-exact."""
    from ray.data.aggregate import Sum

    cls = np.arange(n_classes, dtype=np.int64)
    W = ((np.arange(n_buckets, dtype=np.int64)[:, None]
          * (2 * cls + 3)[None, :] * 2654435761) % 2001) - 1000

    def score(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[col], "")
        toks = pc.split_pattern_regex(txt, "[^A-Za-z]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64),
                            offsets[1:] - offsets[:-1])
        fb = pc.cast(flat, pa.large_binary())
        offs = np.frombuffer(fb.buffers()[1], dtype=np.int64)[
            fb.offset : fb.offset + len(fb) + 1]
        data = (np.frombuffer(fb.buffers()[2], dtype=np.uint8)
                if fb.buffers()[2] is not None else np.empty(0, np.uint8))
        lens = np.diff(offs)
        keep = lens > 0                      # split() emits '' at edges
        h = np.zeros(len(fb), dtype=np.int64)
        p = 1
        for k in range(8):
            has = lens > k
            b = np.zeros(len(fb), dtype=np.int64)
            b[has] = data[offs[:-1][has] + k]
            h += b * p
            p *= 31
        bucket = (h[keep] % n_buckets).astype(np.int64)
        scores = np.zeros((len(t), W.shape[1]), dtype=np.int64)
        di = doc_idx[keep]
        for c in range(W.shape[1]):
            scores[:, c] = np.bincount(
                di, weights=W[bucket, c].astype(np.float64),
                minlength=len(t)).astype(np.int64)
        pred = np.argmax(scores, axis=1).astype(np.int64)  # first max wins
        d = pd.DataFrame({group_col: t[group_col].to_numpy(zero_copy_only=False),
                          "pred_class": pred})
        out = (d.groupby([group_col, "pred_class"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return pa_from_pandas(out)

    return (ds.map_batches(score, batch_format="pyarrow")
              .groupby([group_col, "pred_class"])
              .aggregate(Sum("n", alias_name="n_docs")))


def rake_scores(ds, col: str = "text",
                stopwords: tuple[str, ...] = _STOPWORDS,
                num_partitions: int = 64):
    """RAKE keyword scoring (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents" — public literature), the
    word-level core kept integer-exact so a SQL twin hashes
    identically: candidate phrases are maximal stopword-free word runs
    within a document; for every non-stop word occurrence,
    ``degree += len(its phrase)`` and ``freq += 1``. RAKE's final
    ``degree/freq`` ratio is a driver-side division over the compact
    output — reporting the integer (degree, freq) pair instead keeps
    the oracle exact.

    Vectorized shape: per batch ONE split kernel, doc ids repeated by
    list offsets, the phrase id is a plain cumsum over the stopword
    mask (doc boundaries separate via the (doc, pid) key — no reset
    needed), phrase lengths via one grouped transform; the batch emits
    per-word (degree, freq) PARTIALS, so only vocab × blocks compact
    rows reach the single term-hash exchange. Text never moves.
    """
    stop_arr = np.array(sorted(set(stopwords)), dtype="U")

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(pc.cast(t[col], pa.string()), "")),
            r"\s+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        is_stop = np.isin(flat, stop_arr)
        pid = np.cumsum(is_stop)
        w = ~is_stop
        df = pd.DataFrame({"doc": doc_idx[w], "pid": pid[w],
                           "word": flat[w]})
        if len(df) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "degree": pa.array([], pa.int64()),
                             "freq": pa.array([], pa.int64()),
                             "__p": pa.array([], pa.int64())})
        df["plen"] = df.groupby(["doc", "pid"])["word"].transform("size")
        agg = df.groupby("word", as_index=False).agg(
            degree=("plen", "sum"), freq=("plen", "size"))
        terms = agg["word"].to_numpy().astype("U")
        h = pd.util.hash_array(terms)
        return pa.table({
            "word": pa.array(terms.tolist(), type=pa.string()),
            "degree": pa.array(agg["degree"].to_numpy(), type=pa.int64()),
            "freq": pa.array(agg["freq"].to_numpy(), type=pa.int64()),
            "__p": pa.array((h % np.uint64(num_partitions)).astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False).agg(
            {"degree": "sum", "freq": "sum"})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(merge), batch_format="pandas"))


def cdc_chunk_hashes(t: pa.Table, col: str = "text", window: int = 8,
                     mask_mod: int = 64, id_col: str = "doc_id") -> pa.Table:
    """Per-CHUNK content identity for content-defined chunking — the
    step storage/dataset dedup takes after breakpointing
    (``cdc_chunk_stats`` counts chunks; this emits one row per chunk
    with its exact mod-2^64 polynomial content hash, so identical byte
    runs in DIFFERENT documents collapse in a downstream distinct).

    Cut rule (identical to ``cdc_chunk_stats``): cut after byte
    ``j+window−1`` (0-based) at every window start ``j ≤ len−window−1``
    whose Karp-Rabin hash ≡ 0 (mod ``mask_mod``); chunks are the byte
    runs between cuts. The chunk hash is ``Σ_k b[start+k]·base^k
    (mod 2^64)`` computed from ONE prefix-sum pass via the modular
    inverse (the base is odd), bit-identical to the direct sum — the
    SQL twin reproduces the same integer per chunk from hex pairs and a
    recursive power table, so cross-engine distinctness agrees exactly.

    Zero-shuffle per-batch map; returns ``(id_col, chunk_len,
    chunk_hash int64-wrapped)``. At 100 TB the (len, hash) pairs — not
    the bytes — take the one dedup exchange.
    """
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    n = len(c)
    b = pc.cast(pc.fill_null(pc.cast(c, pa.string()), ""), pa.large_binary())
    offs = np.frombuffer(b.buffers()[1], dtype=np.int64)[b.offset: b.offset + n + 1]
    data = (np.frombuffer(b.buffers()[2], dtype=np.uint8)
            if b.buffers()[2] else np.empty(0, np.uint8))
    lens = np.diff(offs)
    padlens = np.maximum(lens, window)

    buf = np.zeros(int(padlens.sum()), dtype=np.uint8)
    intra_src, _ = _ragged_arange(lens)
    seg_starts = np.cumsum(padlens) - padlens
    buf[np.repeat(seg_starts, lens) + intra_src] = data[
        np.repeat(offs[:-1], lens) + intra_src
    ]

    with np.errstate(over="ignore"):
        m = len(buf)
        pows = (np.concatenate([[np.uint64(1)],
                np.cumprod(np.full(m - 1, _FP_BASE, dtype=np.uint64))])
                if m > 1 else np.ones(m, dtype=np.uint64))
        pinv = (np.concatenate([[np.uint64(1)],
                np.cumprod(np.full(m, _FP_BASE_INV, dtype=np.uint64))])
                if m > 0 else np.ones(1, dtype=np.uint64))
        S = np.zeros(m + 1, dtype=np.uint64)
        np.cumsum(buf.astype(np.uint64) * pows, out=S[1:])
        wcount = padlens - window + 1
        intra_w, _ = _ragged_arange(wcount)
        gj = np.repeat(seg_starts, wcount) + intra_w          # global window starts
        hv = (S[gj + window] - S[gj]) * pinv[gj]

    doc_of_w = np.repeat(np.arange(n, dtype=np.int64), wcount)
    eligible = intra_w < np.repeat(np.maximum(lens - window, 0), wcount)
    is_break = (hv % np.uint64(mask_mod) == 0) & eligible
    bidx = np.flatnonzero(is_break)
    bdoc = doc_of_w[bidx]                                      # doc per cut, doc-major order
    bcut = intra_w[bidx] + window                              # 0-based exclusive cut pos

    nbreaks = np.bincount(bdoc, minlength=n).astype(np.int64)
    has_chunk = lens > 0
    k = nbreaks + has_chunk                                    # chunks per doc
    doc_off = np.cumsum(k) - k
    total = int(k.sum())

    ends = np.empty(total, dtype=np.int64)
    first_break = np.cumsum(nbreaks) - nbreaks
    within = np.arange(len(bdoc), dtype=np.int64) - first_break[bdoc]
    ends[doc_off[bdoc] + within] = bcut
    ends[(doc_off + nbreaks)[has_chunk]] = lens[has_chunk]     # sentinel = doc end

    starts = np.empty(total, dtype=np.int64)
    if total:
        starts[1:] = ends[:-1]
        starts[doc_off[has_chunk]] = 0

    doc_of_chunk = np.repeat(np.arange(n, dtype=np.int64), k)
    gs = seg_starts[doc_of_chunk]
    with np.errstate(over="ignore"):
        chash = (S[gs + ends] - S[gs + starts]) * pinv[gs + starts]

    ids = t[id_col].to_numpy(zero_copy_only=False)
    return pa.table({
        id_col: pa.array(ids[doc_of_chunk]),
        "chunk_len": pa.array(ends - starts, type=pa.int64()),
        "chunk_hash": pa.array(chash.view(np.int64)),
    })


def pmi_bigram_parts(ds, col: str = "text", min_count: int = 3,
                     num_partitions: int = 64,
                     broadcast_threshold: int | None = None):
    """Pointwise-mutual-information collocation mining (Church & Hanks
    1990) kept INTEGER-EXACT: for every adjacent word pair inside a
    document, report the integer parts (pair_n, left_n, right_n,
    n_total) — PMI = log(pair_n·n_total / (left_n·right_n)) is a
    driver-side division over the compact output, so the oracle never
    compares floats. Marginals are computed over ALL bigrams; only the
    final report filters to ``pair_n >= min_count``.

    Shape: per batch ONE whitespace split kernel, doc ids repeated by
    list offsets, adjacency = consecutive kept tokens with a same-doc
    mask (the split never yields interior empties, so filtering empty
    tokens first keeps both engines' adjacency identical); per-block
    (w1, w2) count partials take the ONE pair-hash exchange — text
    never moves.

    Size-gated marginal attach: at or under ``broadcast_threshold``
    distinct bigrams (default ``BROADCAST_ROWS_THRESHOLD``) the two
    O(vocab) marginal tables broadcast sorted for a searchsorted
    lookup per batch; above it the vocab is corpus-proportional and
    the plan swaps to two ``bucketed_hash_join`` passes on w1 then w2
    plus ``hash_groupby_agg`` marginals — same rows, two more
    exchanges instead of a driver-held broadcast."""
    from .agg import compact_groupby, hash_groupby_agg
    from .joins import BROADCAST_ROWS_THRESHOLD, bucketed_hash_join

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(pc.cast(t[col], pa.string()), "")),
            r"\s+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "__p": pa.array([], pa.int64())})
        adj = doc_idx[1:] == doc_idx[:-1]
        df = pd.DataFrame({"w1": flat[:-1][adj], "w2": flat[1:][adj]})
        out = df.groupby(["w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "n"})
        h = pd.util.hash_array(
            (out["w1"] + "\x1f" + out["w2"]).to_numpy().astype("U"))
        out["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        out["n"] = out["n"].astype("int64")
        return pa_from_pandas(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["w1", "w2"], as_index=False)["n"].sum()

    pairs = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("__p")
               .map_groups(arrow_out(merge), batch_format="pandas")
               .materialize())

    thr = (BROADCAST_ROWS_THRESHOLD if broadcast_threshold is None
           else broadcast_threshold)
    if (pairs.count() or 0) > thr:
        # corpus-proportional vocab: marginals via ONE hash exchange
        # each, attach via two hash-partitioned joins — nothing is
        # ever held on the driver or replicated per task
        def norm(t: pa.Table) -> pa.Table:
            # empty __p partitions upstream emit zero-column blocks
            # (the known map_groups quirk) — re-schema them so the
            # joins and combiners below never see a schema-less block
            if t.num_rows == 0 or "w1" not in t.column_names:
                return pa.table({"w1": pa.array([], pa.string()),
                                 "w2": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            return t.select(["w1", "w2", "n"])

        pairs = pairs.map_batches(norm, batch_format="pyarrow")

        def total_partial(t: pa.Table) -> pa.Table:
            s = (0 if ("n" not in t.column_names or t.num_rows == 0)
                 else (pc.sum(t["n"]).as_py() or 0))
            return pa.table({"s": pa.array([int(s)], pa.int64())})

        n_total = int(pairs.map_batches(
            total_partial, batch_format="pyarrow",
            batch_size=None).sum("s") or 0)

        lefts_ds = hash_groupby_agg(pairs, ["w1"],
                                    {"n": ("sum", "left_n")},
                                    num_partitions=num_partitions)
        rights_ds = hash_groupby_agg(pairs, ["w2"],
                                     {"n": ("sum", "right_n")},
                                     num_partitions=num_partitions)

        def prefilter(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater_equal(t["n"], min_count))
            return pa.table({"w1": t["w1"], "w2": t["w2"],
                             "pair_n": pc.cast(t["n"], pa.int64())})

        filt = pairs.map_batches(prefilter, batch_format="pyarrow")
        j1 = bucketed_hash_join(filt, lefts_ds, on="w1", how="inner",
                                num_partitions=num_partitions)
        # a join partition with no rows emits a ZERO-COLUMN block and
        # the next join's aggregator unify races on it (the documented
        # q15/q22 FieldRef "no match" dodge) — one block-level
        # repartition concat-merges empties into schema-carrying blocks
        j1 = j1.repartition(max(8, num_partitions // 4))
        j2 = bucketed_hash_join(
            j1, rights_ds.map_batches(
                lambda t: pa.table({"w2": t["w2"],
                                    "right_n": t["right_n"]}),
                batch_format="pyarrow"),
            on="w2", how="inner", num_partitions=num_partitions)

        def order_cols(t: pa.Table) -> pa.Table:
            return pa.table({
                "w1": t["w1"], "w2": t["w2"],
                "pair_n": pc.cast(t["pair_n"], pa.int64()),
                "left_n": pc.cast(t["left_n"], pa.int64()),
                "right_n": pc.cast(t["right_n"], pa.int64()),
                "n_total": pa.array(
                    np.full(t.num_rows, n_total, dtype=np.int64)),
            })

        return j2.map_batches(order_cols, batch_format="pyarrow")

    lefts = compact_groupby(pairs, ["w1"], sum_cols={"n": "left_n"}).take_all()
    rights = compact_groupby(pairs, ["w2"], sum_cols={"n": "right_n"}).take_all()
    lw = np.array(sorted(r["w1"] for r in lefts), dtype="U")
    ln = np.array([r["left_n"] for r in sorted(lefts, key=lambda r: r["w1"])],
                  dtype=np.int64)
    rw = np.array(sorted(r["w2"] for r in rights), dtype="U")
    rn = np.array([r["right_n"] for r in sorted(rights, key=lambda r: r["w2"])],
                  dtype=np.int64)
    n_total = int(ln.sum())

    def attach(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n"], min_count))
        w1 = t["w1"].to_numpy(zero_copy_only=False).astype("U")
        w2 = t["w2"].to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "w1": t["w1"], "w2": t["w2"],
            "pair_n": pc.cast(t["n"], pa.int64()),
            "left_n": pa.array(ln[np.searchsorted(lw, w1)]),
            "right_n": pa.array(rn[np.searchsorted(rw, w2)]),
            "n_total": pa.array(np.full(len(w1), n_total, dtype=np.int64)),
        })

    return pairs.map_batches(attach, batch_format="pyarrow")


def readability_parts(ds, col: str = "text", group_col: str = "source"):
    """Flesch reading-ease INTEGER PARTS per group (Flesch 1948; the
    classic readability screen a text-quality pipeline runs next to
    the Gopher rules): per document, words = maximal ``\\S+`` runs,
    sentences = maximal ``[.!?]+`` runs, syllables = maximal vowel
    runs ``[aeiouyAEIOUY]+`` (the standard whole-text approximation —
    word boundaries break runs, so counting over the full text equals
    the per-word sum). The report is the per-group integer fold
    (n_docs, n_words, n_sentences, n_syllables); the Flesch formula
    206.835 − 1.015·(W/S) − 84.6·(Y/W) is driver arithmetic over it,
    so the oracle never compares floats.

    Shape: three RE2 count kernels per block, then the compact
    per-group rollup — O(groups × blocks) partials move, text never
    leaves the map stage."""
    from .agg import compact_groupby

    def parts(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t[col], pa.string()), "")
        return pa.table({
            group_col: t[group_col],
            "n_words": pc.cast(
                pc.count_substring_regex(txt, r"\S+"), pa.int64()),
            "n_sentences": pc.cast(
                pc.count_substring_regex(txt, r"[.!?]+"), pa.int64()),
            "n_syllables": pc.cast(
                pc.count_substring_regex(txt, r"[aeiouyAEIOUY]+"), pa.int64()),
        })

    return compact_groupby(
        ds.map_batches(parts, batch_format="pyarrow"),
        [group_col],
        sum_cols={"n_words": "n_words", "n_sentences": "n_sentences",
                  "n_syllables": "n_syllables"},
        count_alias="n_docs")


def term_freq_spectrum(ds, col: str = "text", num_partitions: int = 64):
    """Term-frequency SPECTRUM (the rank-free Zipf/Heaps profile): how
    many distinct terms occur with frequency in [2^b, 2^(b+1)), plus
    the total token mass per bucket — the corpus-statistics report
    that checks Zipf's law without a global rank (rank needs a total
    string order; the spectrum is tie-free and purely compact). The
    bucket is the integer MSB index of the frequency (same exact
    integer-shift correction as the exponential histogram — no libm).

    Shape: per-block term-count partials → ONE term-hash exchange
    (the RAKE/TF rail; text never moves) → per-partition (bucket,
    n_terms, sum_freq) partials → compact fold."""
    from .agg import compact_groupby

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(pc.cast(t[col], pa.string()), "")),
            r"\s+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
        flat = flat[flat != ""]
        terms, counts = np.unique(flat, return_counts=True)
        h = pd.util.hash_array(terms)
        return pa.table({
            "term": pa.array(terms.tolist(), pa.string()),
            "f": pa.array(counts.astype(np.int64)),
            "__p": pa.array((h % np.uint64(num_partitions)).astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("term", as_index=False)["f"].sum()
        f = m["f"].to_numpy(np.int64)
        b = np.floor(np.log2(np.maximum(f, 1))).astype(np.int64)
        b -= ((np.int64(1) << np.maximum(b, 0)) > f).astype(np.int64)
        b += ((np.int64(1) << np.maximum(b + 1, 0)) <= f).astype(np.int64)
        out = pd.DataFrame({"bucket": b, "f": f}).groupby(
            "bucket", as_index=False).agg(n_terms=("f", "size"),
                                          sum_freq=("f", "sum"))
        return out.astype({"bucket": "int64", "n_terms": "int64",
                           "sum_freq": "int64"})

    partials = (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby("__p")
                  .map_groups(arrow_out(merge), batch_format="pandas"))
    return compact_groupby(partials, ["bucket"],
                           sum_cols={"n_terms": "n_terms",
                                     "sum_freq": "sum_freq"})


def adjacent_echo_stats(ds, key: str, order_col: str, role_col: str,
                        text_col: str, ts_col: str,
                        from_role: str = "user", to_role: str = "assistant",
                        num_partitions: int = 16):
    """Adjacent-turn echo / copy-rate audit (the train-data
    contamination screen a chat curator runs — a ``to_role`` turn that
    mostly repeats the preceding ``from_role`` turn is low-value): for
    every (from → immediately-following to) pair within a key, count
    the DISTINCT ``to_role`` tokens that also occur in the preceding
    ``from_role`` turn, per UTC day of the ``to_role`` turn. Tokens =
    non-empty space-separated runs. Output (day:timestamp[us],
    n_pairs, sum_overlap, sum_asst_tokens) — integers so the echo
    RATE stays a driver division.

    Shape: ONE key-hash exchange (text moves once); per partition the
    pairing is a grouped shift(-1) and the set intersection is
    explode → drop-dup → inner merge — all columnar; compact per-day
    partials fold on the single final block."""

    def add_part(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(kv.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort")
        grp = g.groupby(key, sort=False)
        nrole = grp[role_col].shift(-1)
        ntext = grp[text_col].shift(-1)
        nts = grp[ts_col].shift(-1)
        keep = (g[role_col] == from_role) & (nrole == to_role)
        ut = g.loc[keep, text_col].reset_index(drop=True)
        at = ntext[keep].reset_index(drop=True)
        day_us = (nts[keep].astype("datetime64[us]")
                  .to_numpy().astype("int64"))
        day = (day_us // 86_400_000_000) * 86_400_000_000

        def toks(s: pd.Series) -> pd.DataFrame:
            e = s.str.split(" ").explode()
            d = pd.DataFrame({"pid": e.index.to_numpy(),
                              "tok": e.to_numpy()})
            d = d[d["tok"].notna() & (d["tok"] != "")]
            return d.drop_duplicates()

        A, U = toks(at), toks(ut)
        ov = A.merge(U, on=["pid", "tok"]).groupby("pid").size()
        na = A.groupby("pid").size()
        pid = np.arange(len(ut))
        out = pd.DataFrame({
            "day": day,
            "n_overlap": ov.reindex(pid, fill_value=0).to_numpy(np.int64),
            "n_asst": na.reindex(pid, fill_value=0).to_numpy(np.int64)})
        r = out.groupby("day", as_index=False).agg(
            n_pairs=("n_asst", "size"), sum_overlap=("n_overlap", "sum"),
            sum_asst_tokens=("n_asst", "sum"))
        return r.astype({"day": "int64", "n_pairs": "int64",
                         "sum_overlap": "int64", "sum_asst_tokens": "int64"})

    per_part = (ds.map_batches(add_part, batch_format="pyarrow")
                  .groupby("__p")
                  .map_groups(arrow_out(pairs), batch_format="pandas"))

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby("day", as_index=False).agg(
            n_pairs=("n_pairs", "sum"), sum_overlap=("sum_overlap", "sum"),
            sum_asst_tokens=("sum_asst_tokens", "sum"))
        return pa.table({
            "day": pa.array(out["day"].to_numpy(), pa.timestamp("us")),
            "n_pairs": pa.array(out["n_pairs"].to_numpy(np.int64)),
            "sum_overlap": pa.array(out["sum_overlap"].to_numpy(np.int64)),
            "sum_asst_tokens": pa.array(
                out["sum_asst_tokens"].to_numpy(np.int64))})

    return (per_part.repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None))

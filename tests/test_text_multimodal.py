import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.multimodal import (
    FrameSampler,
    ImageDecoder,
    decode_pipeline,
    synth_media_table,
)
from opentelemetry_collector_contrib_ray.stages.text import (
    LangId,
    quality_score,
    rolling_fingerprint,
    token_stats,
)


def test_token_stats():
    t = pa.table({"text": ["one two three", "", "a,b c!", "  padded  "]})
    out = token_stats(t)
    assert out["n_tokens_ws"].to_pylist() == [3, 0, 2, 1]
    assert out["n_tokens_bpe"].to_pylist() == [3, 0, 5, 1]
    assert out["n_chars_text"].to_pylist() == [13, 0, 6, 10]


def test_quality_score_ranges():
    t = pa.table({"text": ["the quick brown fox jumps over a lazy dog", "%%%% !!!", ""]})
    out = quality_score(t)
    s = out["quality_score"].to_pylist()
    assert s[0] > 0.5
    assert s[1] == 0.0  # too short → len gate
    assert s[2] == 0.0
    assert 0 <= out["stopword_ratio"].to_pylist()[0] <= 1


def test_langid():
    t = pa.table(
        {
            "text": [
                "the cat and the dog went to the park and it is nice",
                "le chat et la maison est une belle chose de la vie",
                "der hund und die katze ist nicht das problem",
                "el gato y la casa es una cosa que me gusta los dias",
                "我的是不一有了人这的是",
            ]
        }
    )
    out = LangId()(t)
    assert out["lang_pred"].to_pylist() == ["en", "fr", "de", "es", "zh"]


def test_fingerprint_deterministic_and_shift_tolerant():
    t = pa.table({"text": ["hello world this is a document", "hello world this is a document", "prefix! hello world this is a document"]})
    out = rolling_fingerprint(t, window=8)
    fp = out["fingerprint"].to_pylist()
    assert fp[0] == fp[1]
    assert fp[0] == fp[2]  # min-sampled rolling hash survives a prefix shift


def test_image_decode_fake_pipeline():
    t = synth_media_table(20)
    out = decode_pipeline(rd.from_arrow(t), fake=True, concurrency=1).to_pandas()
    assert len(out) == 20
    assert all(len(f) == 6 for f in out["features"])


def test_image_decoder_raises_on_undecodable_format():
    # synth_media_table payloads are random bytes (no BMP/P6 magic):
    # the real default codec must refuse them, not guess
    t = synth_media_table(2)
    dec = ImageDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        dec(t)


def test_frame_sampler():
    t = synth_media_table(5)
    out = FrameSampler(every_ms=1000, fake=True)(t)
    assert out["n_frames_sampled"].to_pylist() == [
        max(1, d // 1000) for d in t["meta.duration_ms"].to_pylist()
    ]


def test_frame_sampler_stub_raises():
    with pytest.raises(NotImplementedError):
        FrameSampler(fake=False)


def test_audio_decode_features_fake():
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        AudioDecoder,
        AudioFeatures,
    )

    t = synth_media_table(10)
    import pyarrow as pa
    import pyarrow.compute as pc

    t = t.set_column(
        t.column_names.index("meta.sample_rate"), "meta.sample_rate",
        pa.array([8000] * 10, type=pa.int32()),
    )
    out = (
        rd.from_arrow(t)
        .map_batches(AudioDecoder, fn_constructor_kwargs={"fake": True},
                     batch_format="pyarrow", batch_size=4, concurrency=(1, 2))
        .map_batches(AudioFeatures(), batch_format="pyarrow", batch_size=4)
        .to_pandas()
    )
    assert len(out) == 10
    assert (out["rms"] >= 0).all() and (out["zcr"] >= 0).all()


def test_audio_decoder_raises_on_undecodable_format():
    from opentelemetry_collector_contrib_ray.stages.multimodal import AudioDecoder

    t = synth_media_table(2)  # random payloads: no RIFF magic
    with pytest.raises(NotImplementedError):
        AudioDecoder(fake=False)(t)


def test_codec_roundtrips_and_golden_values():
    """Real codecs: encode→decode is identity for BMP/PPM pixels and
    near-identity (16-bit quantization) for WAV samples."""
    from opentelemetry_collector_contrib_ray.stages.codecs import (
        decode_bmp, decode_image, decode_ppm, decode_wav, encode_bmp,
        encode_ppm, encode_wav)

    rng = np.random.Generator(np.random.PCG64(5))
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # odd width → row padding
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    # PPM comment + multi-digit dims
    wide = rng.integers(0, 256, (3, 12, 3), dtype=np.uint8)
    with_comment = b"P6\n# a comment\n12 3\n255\n" + wide.tobytes()
    assert np.array_equal(decode_ppm(with_comment), wide)

    wave = 0.5 * np.sin(2 * np.pi * 440 * np.arange(800) / 8000)
    dec, sr = decode_wav(encode_wav(wave, 8000))
    assert sr == 8000 and len(dec) == 800
    assert np.abs(dec - wave).max() < 1e-4  # 16-bit quantization only
    dec8, _ = decode_wav(encode_wav(wave, 8000, bits=8))
    assert np.abs(dec8 - wave).max() < 1e-2  # 8-bit quantization


def test_real_decode_pipeline_golden():
    """End-to-end real decode: encoded BMP/PPM payloads come back with
    the exact pixel bytes; features match numpy computed directly."""
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        AudioDecoder, AudioFeatures, synth_real_audio_table,
        synth_real_media_table)

    t = synth_real_media_table(12)
    dec = ImageDecoder(fake=False)(t)
    # rebuild the source pixels from the same seed and compare exactly
    rng = np.random.Generator(np.random.PCG64(42))
    for i in range(12):
        h = int(rng.integers(2, 9))
        w = int(rng.integers(2, 9))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert dec["meta.height"][i].as_py() == h
        assert dec["meta.width"][i].as_py() == w
        assert np.array_equal(
            np.asarray(dec["pixels"][i].as_py(), dtype=np.uint8), img.reshape(-1)
        )

    a = synth_real_audio_table(6)
    out = AudioFeatures()(AudioDecoder(fake=False)(a))
    # a 0.5-amplitude sine has RMS 0.5/sqrt(2) ≈ 0.3536
    assert np.allclose(out["rms"].to_numpy(), 0.5 / np.sqrt(2), atol=0.01)


def test_gopher_rules_components():
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.text import gopher_rules

    good = ("this is a fine document that we have written with care and the "
            "words flow to be of reasonable length " * 3)
    bullets = "- one\n- two\n- three"
    symbols = "# # # # tag soup"
    t = pa.table({"text": [good, bullets, symbols, None]})
    out = gopher_rules(t, min_words=10)
    assert out["gopher_pass"].to_pylist() == [True, False, False, False]
    assert out["n_bullet_lines"].to_pylist()[1] == 3
    assert out["n_symbols"].to_pylist()[2] == 4
    assert out["n_words"].to_pylist()[3] == 0
    # ellipsis line counting (multiline $)
    t2 = pa.table({"text": ["a...\nb\nc…"]})
    assert gopher_rules(t2)["n_ellipsis_lines"].to_pylist() == [2]


def test_image_resizer():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        ImageDecoder,
        ImageFeatures,
        ImageResizer,
        synth_media_table,
    )

    t = synth_media_table(32)
    ds = rd.from_arrow(t).map_batches(
        ImageDecoder, fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow", concurrency=(1, 2), batch_size=16,
    ).map_batches(ImageResizer(out_h=4, out_w=4), batch_format="pyarrow")
    out = ds.to_pandas()
    assert (out["meta.width"] == 4).all() and (out["meta.height"] == 4).all()
    assert all(len(p) == 4 * 4 * 3 for p in out["pixels"])

    # deterministic: constant-color image stays constant after resize
    px = np.full(6 * 5 * 3, 7, dtype=np.uint8)
    one = pa.table({
        "pixels": pa.array([px.tolist()], type=pa.list_(pa.uint8())),
        "meta.width": pa.array([5], type=pa.int32()),
        "meta.height": pa.array([6], type=pa.int32()),
    })
    r = ImageResizer(out_h=2, out_w=3)(one)
    assert r["pixels"].to_pylist()[0] == [7] * (2 * 3 * 3)
    # features still consumable downstream
    f = ImageFeatures()(r)
    assert f["features"].to_pylist()[0][:3] == [7.0, 7.0, 7.0]


def test_repetition_stats_hand_cases():
    from opentelemetry_collector_contrib_ray.stages.text import repetition_stats

    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b\na b\nc",          # 3 lines / 1 dup; words a,b,a,b,c
            "x " * 50 + "y",        # extreme word repetition
            None,                    # null -> '' token conventions
            "p q r\ns t u\nv w x",  # clean doc
        ],
    })
    df = repetition_stats(t).to_pandas()

    assert list(df["n_lines"]) == [3, 1, 1, 3]
    assert list(df["n_dup_lines"]) == [1, 0, 0, 0]
    assert list(df["n_words"]) == [5, 51, 1, 9]
    assert list(df["max_word_count"]) == [2, 50, 1, 1]
    # doc1 2-grams: "a b","b a","a b","b c" -> 4 total, 1 dup
    assert df["n_2grams"][0] == 4 and df["n_dup_2grams"][0] == 1
    # doc2: 50 2-grams ("x x" x49 + "x y"), 48 dups
    assert df["n_2grams"][1] == 50 and df["n_dup_2grams"][1] == 48
    assert list(df["repetition_pass"]) == [False, False, False, True]


def test_repetition_stats_batch_slicing_invariant():
    import pandas as pd

    from opentelemetry_collector_contrib_ray.stages.text import repetition_stats

    texts = [f"w{i % 7} common {'dup line ' * (i % 3)}\ncommon w{i % 5}"
             for i in range(40)]
    t = pa.table({"doc_id": list(range(40)), "text": texts})
    whole = repetition_stats(t).to_pandas()
    parts = pd.concat([
        repetition_stats(t.slice(0, 13)).to_pandas(),
        repetition_stats(t.slice(13, 14)).to_pandas(),
        repetition_stats(t.slice(27)).to_pandas(),
    ]).reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, parts)


def test_ngram_lm_score_hand_case():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import (
        ngram_lm_score,
        top_ngrams,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b a b c", "a b x", "zz qq ww"],
    }))
    top = top_ngrams(docs, n=2, k=100).to_pandas()
    # "a b" occurs 3x corpus-wide; every other bigram once
    assert dict(zip(top["gram"], top["n"]))["a b"] == 3
    out = ngram_lm_score(docs, top, n=2).to_pandas().sort_values("doc_id")
    # doc1: a b(3) + b a(1) + a b(3) + b c(1) = 8; doc2: 3+1; doc3: 1+1
    assert list(out["lm_score"]) == [8, 4, 2]


def test_ngram_lm_score_topk_cutoff():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import (
        ngram_lm_score,
        top_ngrams,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": [1],
        "text": ["c c c c b b b a a"],  # grams: c c x3, c b, b b x2, b a, a a
    }))
    top = top_ngrams(docs, n=2, k=2).to_pandas()  # keeps "c c"(3), "b b"(2)
    assert list(top["gram"]) == ["c c", "b b"]
    out = ngram_lm_score(docs, top, n=2).to_pandas()
    # only top-k grams score: 3*3 (c c occurrences) + 2*2 (b b)
    assert list(out["lm_score"]) == [13]


def test_pii_stats_counts_and_mask():
    from opentelemetry_collector_contrib_ray.stages.text import pii_stats

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [
            "mail a@b.co and c.d-e@f.org now",
            "host 10.0.0.1 then 255.255.255.255",
            "call 555-123-4567 ok",
            "clean text, no pii here",
        ],
    })
    out = pii_stats(t, mask="<PII>").to_pandas()
    assert list(out["n_email"]) == [2, 0, 0, 0]
    assert list(out["n_ipv4"]) == [0, 2, 0, 0]
    assert list(out["n_phone"]) == [0, 0, 1, 0]
    assert list(out["has_pii"]) == [True, True, True, False]
    assert out["text_masked"][0] == "mail <PII> and <PII> now"
    assert out["text_masked"][1] == "host <PII> then <PII>"
    assert out["text_masked"][2] == "call <PII> ok"
    assert out["text_masked"][3] == "clean text, no pii here"


def test_chunk_tokens_hand_case_and_slicing():
    import pandas as pd

    from opentelemetry_collector_contrib_ray.stages.text import chunk_tokens

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": ["a b c d e", "  x  y ", "", "one two three four"],
    })
    out = chunk_tokens(t, size=2).to_pandas()
    want = [
        (1, 0, 2, "a b"), (1, 1, 2, "c d"), (1, 2, 1, "e"),
        (2, 0, 2, "x y"),
        (3, 0, 1, ""),
        (4, 0, 2, "one two"), (4, 1, 2, "three four"),
    ]
    assert [tuple(r) for r in out.itertuples(index=False)] == want
    # batch-slicing invariance (chunk arithmetic has no cross-row state)
    parts = pd.concat([chunk_tokens(t.slice(0, 2), size=2).to_pandas(),
                       chunk_tokens(t.slice(2), size=2).to_pandas()]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, parts)


def test_top_tfidf_hand_case_and_parallelism():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import top_tfidf

    t = pa.table({"doc_id": [0, 1, 2, 3],
                  "text": ["a a b c", "b c c", "  ", "z z z a"]})

    def run(blocks, parts):
        return (top_tfidf(rd.from_arrow(t).repartition(blocks),
                          num_partitions=parts)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    want = pd.DataFrame({"doc_id": [0, 1, 3], "term": ["a", "c", "z"],
                         "tf": [2, 2, 3], "df": [2, 2, 1],
                         "score": [4, 4, 12]})
    for cols in [run(1, 2), run(4, 7)]:
        pd.testing.assert_frame_equal(
            cols[["doc_id", "term", "tf", "df", "score"]].astype(
                {"tf": "int64", "df": "int64", "score": "int64"}), want)


def test_top_terms_per_group_correct_and_prereduce_safe():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import top_terms_per_group

    t = pa.table({
        "lang": ["en", "en", "de", "de", "de"],
        "text": ["x x y z", "y x q", "a b b", "b a", "c"],
    })

    def run(blocks, parts):
        return (top_terms_per_group(rd.from_arrow(t).repartition(blocks),
                                    "lang", k=2, num_partitions=parts)
                .to_pandas().sort_values(["lang", "rank"])
                .reset_index(drop=True))

    want = pd.DataFrame({"lang": ["de", "de", "en", "en"],
                         "term": ["b", "a", "x", "y"],
                         "n": [3, 2, 3, 2], "rank": [1, 2, 1, 2]})
    # many partitions: per-partition pre-reduce must not lose the true
    # top-k (each (g, term) pair's full count lives in ONE partition)
    for out in [run(1, 2), run(5, 16)]:
        pd.testing.assert_frame_equal(
            out[["lang", "term", "n", "rank"]].astype(
                {"n": "int64", "rank": "int64"}), want)


def test_ngram_novelty_hand_case_and_parallelism():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import ngram_novelty

    # doc0 and doc1 share the 3-gram "a b c"; doc0 also repeats it (distinct once)
    t = pa.table({"doc_id": [0, 1, 2, 3],
                  "text": ["a b c d a b c", "a b c", "x y z w", "p q"]})

    def run(blocks, parts):
        return (ngram_novelty(rd.from_arrow(t).repartition(blocks), n=3,
                              num_partitions=parts)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # doc0 distinct 3-grams: abc, bcd, cda, dab (abc repeated) -> 4, unique 3
    # doc1: abc -> 1, unique 0; doc2: xyz, yzw -> 2, unique 2; doc3: none
    want = pd.DataFrame({"doc_id": [0, 1, 2],
                         "n_grams": [4, 1, 2], "n_unique": [3, 0, 2]})
    for out in [run(1, 2), run(4, 8)]:
        pd.testing.assert_frame_equal(
            out[["doc_id", "n_grams", "n_unique"]].astype("int64"),
            want.astype("int64"))


def test_normalize_text_golden():
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.text import normalize_text

    t = pa.table({"text": ["  Hello,   WORLD!! 123 ", "Émile—café №5",
                           "的是，不。", None, ""]})
    assert normalize_text(t)["text_norm"].to_pylist() == [
        "hello world 123", "émile café 5", "的是 不", "", ""]


def test_cdc_chunk_stats_matches_reference_loop():
    import numpy as np
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.text import cdc_chunk_stats

    _FP_BASE = np.uint64(1099511628211)

    def ref_chunks(s: str, w: int, m: int) -> int:
        b = s.encode("utf-8")
        if not b:
            return 0
        if len(b) < w:
            return 1
        breaks = 0
        for j in range(len(b) - w):  # break-eligible starts only
            h = np.uint64(0)
            with np.errstate(over="ignore"):
                for k2 in range(w):
                    h += np.uint64(b[j + k2]) * _FP_BASE ** np.uint64(k2)
            if int(h) % m == 0:
                breaks += 1
        return 1 + breaks

    texts = ["", "short", "a" * 200, "the quick brown fox " * 30,
             "的是不我一有了人这" * 20, "x" * 7]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = cdc_chunk_stats(t, window=8, mask_mod=16)
    want = [ref_chunks(s, 8, 16) for s in texts]
    assert out["n_chunks"].to_pylist() == want
    assert out["n_bytes"].to_pylist() == [len(s.encode()) for s in texts]


def test_template_mine_masks_and_merges():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import template_mine

    lines = (["ERROR code=500 msg=boom"] * 3
             + ["ERROR code=404 msg=gone"] * 2
             + ["user 42 logged in", "user 7 logged in", None, ""])
    ds = rd.from_arrow(pa.table({"text": lines})).repartition(4)
    out = template_mine(
        ds, masks=((r"msg=\S+", "msg=<*>"), (r"[0-9]+", "<#>")),
        num_partitions=3,
    ).to_pandas()
    got = dict(zip(out["template"], out["n"]))
    assert got == {
        "ERROR code=<#> msg=<*>": 5,
        "user <#> logged in": 2,
        "": 2,
    }
    # top-k path: highest count first, template tiebreak
    top = template_mine(
        ds, masks=((r"msg=\S+", "msg=<*>"), (r"[0-9]+", "<#>")),
        num_partitions=3, k=1,
    ).to_pandas()
    assert list(top["template"]) == ["ERROR code=<#> msg=<*>"]


def test_inverted_index_build_and_pruned_search(tmp_path):
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.index import (
        build_inverted_index,
        search_index,
    )

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta gamma", "beta gamma", "alpha  beta", "delta"],
    })
    out = str(tmp_path / "idx")
    build_inverted_index(rd.from_arrow(docs).repartition(2), out, n_buckets=8)
    got = sorted(search_index(out, ["alpha", "beta"], mode="and",
                              n_buckets=8).to_pandas()["doc_id"])
    assert got == [1, 3]
    got_or = sorted(search_index(out, ["alpha", "delta"], mode="or",
                                 n_buckets=8).to_pandas()["doc_id"])
    assert got_or == [1, 3, 4]
    # pruning: only the buckets of the queried terms are read
    import glob
    n_dirs = len(glob.glob(out + "/bucket=*"))
    assert n_dirs > 2  # corpus spans more buckets than one query touches


def test_cooccurrence_topk_hand_case():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import cooccurrence_topk

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c", "a b", "a c", "b  a"],
    })
    out = cooccurrence_topk(rd.from_arrow(docs).repartition(3), vocab_size=3,
                            k=10, num_partitions=4).to_pandas()
    got = {(r.term_a, r.term_b): r.n_docs for r in out.itertuples()}
    assert got == {("a", "b"): 3, ("a", "c"): 2, ("b", "c"): 1}
    # ranking: count desc, then lexicographic
    assert list(zip(out["term_a"], out["term_b"])) == [("a", "b"), ("a", "c"), ("b", "c")]


def test_char_entropy_values():
    import math

    from opentelemetry_collector_contrib_ray.stages.text import char_entropy

    t = pa.table({"text": ["aabbbb", "abcd", "aaaa", "", None, "…x…"]})
    out = char_entropy(t)["char_entropy"].to_pylist()
    p = [2 / 6, 4 / 6]
    want0 = -sum(x * math.log2(x) for x in p)
    assert abs(out[0] - want0) < 1e-12
    assert abs(out[1] - 2.0) < 1e-12       # 4 distinct chars
    assert out[2] == 0.0                   # single distinct char
    assert out[3] is None and out[4] is None
    p2 = [2 / 3, 1 / 3]                    # multibyte chars count once
    assert abs(out[5] - (-sum(x * math.log2(x) for x in p2))) < 1e-12


def test_pixel_and_waveform_checksums_hand_computed():
    """Checksum stages pin (n, sum, order-weighted sum) exactly."""
    import numpy as np
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        pixel_checksums,
        waveform_checksums,
    )

    px = [10, 20, 30, 40, 50, 60]  # one 1x2 RGB image
    t = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "pixels": pa.array([px], pa.list_(pa.uint8())),
    })
    got = pixel_checksums(t).to_pydict()
    assert got["n_units"] == [6]
    assert got["sum_units"] == [sum(px)]
    assert got["wsum_units"] == [sum(v * (i + 1) for i, v in enumerate(px))]
    # order sensitivity: a channel swap changes wsum but not sum
    swapped = pixel_checksums(pa.table({
        "media_id": pa.array([7], pa.int64()),
        "pixels": pa.array([[30, 20, 10, 60, 50, 40]], pa.list_(pa.uint8())),
    })).to_pydict()
    assert swapped["sum_units"] == got["sum_units"]
    assert swapped["wsum_units"] != got["wsum_units"]

    i16 = np.array([100, -32768, 32767, 0], dtype=np.int64)
    wav = pa.table({
        "media_id": pa.array([3], pa.int64()),
        "waveform": pa.array([(i16 / 32768.0).astype("float32").tolist()],
                             pa.list_(pa.float32())),
    })
    g = waveform_checksums(wav).to_pydict()
    assert g["n_units"] == [4]
    assert g["sum_units"] == [int(i16.sum())]
    assert g["wsum_units"] == [int((i16 * np.arange(1, 5)).sum())]


def test_dhash64_known_image_and_perturbation_tolerance():
    import numpy as np
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.multimodal import dhash64

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (12, 14, 3), dtype=np.uint8)
    near = img.copy()
    near[3, 4, 1] = np.uint8(min(254, near[3, 4, 1]) + 1)
    far = rng.integers(0, 256, (12, 14, 3), dtype=np.uint8)

    def row(i, a):
        return {"media_id": i, "meta.width": a.shape[1],
                "meta.height": a.shape[0], "pixels": a.reshape(-1).tolist()}

    t = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "meta.width": pa.array([img.shape[1]] * 2 + [far.shape[1]], pa.int32()),
        "meta.height": pa.array([img.shape[0]] * 2 + [far.shape[0]], pa.int32()),
        "pixels": pa.array([img.reshape(-1).tolist(), near.reshape(-1).tolist(),
                            far.reshape(-1).tolist()], pa.list_(pa.uint8())),
    })
    h = dhash64(t)["dhash"].to_numpy().view(np.uint64)
    ham = lambda a, b: bin(int(a ^ b)).count("1")
    assert ham(h[0], h[1]) <= 2          # single-pixel ±1 barely moves it
    assert ham(h[0], h[2]) > 16          # unrelated image is far
    # deterministic: same input, same hash
    h2 = dhash64(t)["dhash"].to_numpy().view(np.uint64)
    assert (h == h2).all()


def test_dhash_pairs_banding_recall(ray_session):
    """LSH banding (max_hamming+1 disjoint bands) has recall 1 by
    pigeonhole: the banded pipeline finds exactly the brute-force
    pairs on the planted near-dup corpus."""
    import numpy as np
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.codecs import decode_image
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        dhash64,
        dhash_pairs,
        synth_near_dup_media_table,
    )
    import pyarrow as pa

    tbl = synth_near_dup_media_table(n_base=24, n_dups=12, seed=11)
    got = dhash_pairs(rd.from_arrow(tbl), max_hamming=6).to_pandas()
    got_pairs = set(map(tuple, got[["id_a", "id_b", "hamming"]].itertuples(index=False)))

    pix = [decode_image(p).reshape(-1) for p in tbl["payload"].to_pylist()]
    t = pa.table({
        "media_id": tbl["media_id"],
        "meta.width": tbl["meta.width"],
        "meta.height": tbl["meta.height"],
        "pixels": pa.array([x.tolist() for x in pix], pa.list_(pa.uint8())),
    })
    h = dhash64(t)["dhash"].to_numpy().view(np.uint64)
    ids = tbl["media_id"].to_pylist()
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(int(h[i] ^ h[j])).count("1")
            if d <= 6:
                want.add((ids[i], ids[j], d))
    assert got_pairs == want and len(want) >= 12


def test_audio_fp_pairs_banding_recall(ray_session):
    """Audio fingerprint banded pipeline equals brute force on the
    planted near-dup clips (pigeonhole recall 1)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.codecs import decode_wav
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        afp64,
        audio_fp_pairs,
        synth_near_dup_audio_table,
    )

    tbl = synth_near_dup_audio_table(n_base=16, n_dups=8, seed=23)
    got = audio_fp_pairs(rd.from_arrow(tbl), max_hamming=6).to_pandas()
    got_pairs = set(map(tuple, got[["id_a", "id_b", "hamming"]].itertuples(index=False)))

    waves = [decode_wav(p)[0] for p in tbl["payload"].to_pylist()]
    t = pa.table({
        "media_id": tbl["media_id"],
        "waveform": pa.array([w.tolist() for w in waves], pa.list_(pa.float32())),
    })
    h = afp64(t)["afp"].to_numpy().view(np.uint64)
    ids = tbl["media_id"].to_pylist()
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(int(h[i] ^ h[j])).count("1")
            if d <= 6:
                want.add((ids[i], ids[j], d))
    assert got_pairs == want and len(want) >= 8


def test_dsir_scores_rank_target_like_docs():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.dsir import dsir_scores

    # target-like docs share character patterns; off-target docs differ
    tgt = ["the quick brown fox jumps over the lazy dog",
           "the quiet brown bear naps under the lazy sun",
           "the quick brown cat leaps over the dozy dog"]
    off = ["zzz qqq kkk www xxx yyy vvv", "0101 1100 0011 1010 0110"]
    mixed = ["the quick brown fox sits", "qqq zzz www kkk"]
    docs = tgt + off + mixed
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
        "is_t": pa.array([True] * 3 + [False] * 4),
    })
    out = dsir_scores(rd.from_arrow(t).repartition(3), target_col="is_t",
                      n_buckets=64).to_pandas().set_index("doc_id")
    # the target-like held-out doc (5) outranks the junk one (6)
    assert out.loc[5, "dsir_score"] > out.loc[6, "dsir_score"]
    # per-doc gram counts are exact: max(len_bytes - 3, 1)
    for i, d in enumerate(docs):
        assert out.loc[i, "n_grams"] == max(len(d.encode()) - 3, 1)
    # deterministic across parallelism
    out2 = dsir_scores(rd.from_arrow(t).repartition(7), target_col="is_t",
                       n_buckets=64).to_pandas().set_index("doc_id")
    assert (out2["dsir_score"] == out["dsir_score"]).all()


# --------------------------------------------- BPE merge training


def _ref_bpe(word_counts, rounds):
    """Slow reference: str.replace-based BPE with (count desc, pair asc)
    tie-break, private-use merge codes — independent of stages/bpe.py
    internals."""
    from collections import Counter

    merges = []
    learned = []
    for k in range(rounds):
        enc = {w: w for w in word_counts}
        for i, (a, b) in enumerate(merges):
            enc = {w: e.replace(chr(a) + chr(b), chr(0xE000 + i))
                   for w, e in enc.items()}
        pc_ = Counter()
        for w, c in word_counts.items():
            e = enc[w]
            for i in range(len(e) - 1):
                pc_[(ord(e[i]), ord(e[i + 1]))] += c
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(best[0])
        learned.append((best[0], best[1]))
    return merges, learned


def test_bpe_matches_reference_and_handles_overlap_runs():
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.bpe import (
        expand_token,
        train_merges,
    )

    # "aaaa" exercises greedy left-to-right non-overlap: (a,a) merges
    # twice, not three times
    wc = {"aaaa": 5, "banana": 4, "bandana": 3, "ananas": 2, "aa": 7}
    vocab = rd.from_items([{"word": w, "cnt": c} for w, c in wc.items()]
                          ).repartition(3)
    out = train_merges(vocab, rounds=3, top_pairs=5).to_pandas()
    merges, learned = _ref_bpe(wc, 3)
    got_merges = out[out.kind == "merge"].sort_values("round")
    want_tokens = [expand_token(chr(a) + chr(b), merges[:i])
                   for i, (a, b) in enumerate(merges)]
    assert got_merges.token.tolist() == want_tokens
    assert got_merges.freq.tolist() == [c for _, c in learned]
    top = out[out.kind == "pair"]
    assert top.rnk.tolist() == list(range(1, len(top) + 1))
    assert (top.freq.to_numpy()[:-1] >= top.freq.to_numpy()[1:]).all()


def test_bpe_random_vocab_matches_reference():
    import numpy as np
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.bpe import (
        expand_token,
        train_merges,
    )

    rng = np.random.default_rng(11)
    words = ["".join(rng.choice(list("abcd"), rng.integers(1, 9)))
             for _ in range(60)]
    wc = {}
    for w in words:
        wc[w] = wc.get(w, 0) + int(rng.integers(1, 20))
    vocab = rd.from_items([{"word": w, "cnt": c} for w, c in wc.items()]
                          ).repartition(4)
    out = train_merges(vocab, rounds=4, top_pairs=3).to_pandas()
    merges, learned = _ref_bpe(wc, 4)
    got = out[out.kind == "merge"].sort_values("round")
    assert got.freq.tolist() == [c for _, c in learned]
    assert got.token.tolist() == [
        expand_token(chr(a) + chr(b), merges[:i])
        for i, (a, b) in enumerate(merges)]


def test_bpe_whole_text_encode_equals_per_word():
    # merge patterns contain no separator, so the whole-text replace
    # chain must count exactly what per-word encoding counts
    import numpy as np
    from opentelemetry_collector_contrib_ray.stages.bpe import (
        MERGE_BASE,
        _encode,
    )

    rng = np.random.default_rng(3)
    words = ["".join(rng.choice(list("abc"), rng.integers(1, 7)))
             for _ in range(200)]
    merges = [(ord("a"), ord("b")), (ord("b"), ord("c")),
              (MERGE_BASE, ord("a"))]
    text = ""
    for w in words:
        text += w + rng.choice([" ", ", ", "! ", "  ", "\n"])
    cleaned = " ".join(text.replace(",", " ").replace("!", " ").split())
    whole = cleaned
    for k, (a, b) in enumerate(merges):
        whole = whole.replace(chr(a) + chr(b), chr(MERGE_BASE + k))
    n_tok_whole = len(whole.replace(" ", ""))
    per_word = _encode(words, merges)
    assert n_tok_whole == int(per_word.str.len().sum())


# --------------------------------------------- BM25


def test_bm25_matches_bruteforce_integer_reference():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.bm25 import (
        S2,
        bm25_topk,
        idf_int,
    )

    rng = np.random.default_rng(21)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = []
    for i in range(80):
        n = int(rng.integers(3, 40))
        docs.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, n))})
    df = pd.DataFrame(docs)
    words = df.text.str.split()
    N = len(df)
    D = int(words.str.len().sum())
    dfreq = {t: int(words.apply(lambda ws: t in ws).sum())
             for t in ("alpha", "beta")}
    terms = {t: idf_int(N, dfreq[t]) for t in dfreq}

    # brute-force integer reference
    scores = {}
    for i, ws in enumerate(words):
        dl = len(ws)
        s = 0
        for t, idf in terms.items():
            tf = ws.count(t)
            if tf:
                s += idf * ((S2 * 44 * D * tf)
                            // (20 * D * tf + 6 * D + 18 * dl * N))
        if s:
            scores[i] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    for nblocks in (1, 5):
        out = bm25_topk(rd.from_pandas(df).repartition(nblocks), terms,
                        N, D, k=10).to_pandas()
        got = list(zip(out.doc_id.tolist(), out.score.tolist()))
        assert got == want
        assert out["rank"].tolist() == list(range(1, len(want) + 1))


def test_hashed_linear_classifier_differential():
    """Differential vs a per-token pure-Python reimplementation,
    covering zero-token docs (class 0), >8-char hash truncation, and
    multi-batch partial-count folding."""
    import re

    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import (
        hashed_linear_classifier,
    )

    texts = ["the quick brown fox", "internationalization tokens here",
             "", "123 456 !!!", "zzz zzz zzz aaa",
             "extraordinarily long tokens extraordinarily repeated"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts,
                       "lang": ["en", "en", "xx", "xx", "en", "en"]})

    def ref_pred(text: str) -> int:
        scores = [0, 0, 0]
        for tok in re.split(r"[^A-Za-z]+", text):
            if not tok:
                continue
            h = sum(ord(ch) * 31 ** k for k, ch in enumerate(tok[:8]))
            b = h % 4096
            for c in range(3):
                scores[c] += ((b * (2 * c + 3) * 2654435761) % 2001) - 1000
        best = max(scores)
        return scores.index(best)

    want = (df.assign(pred_class=[ref_pred(s) for s in texts])
            .groupby(["lang", "pred_class"], as_index=False).size()
            .rename(columns={"size": "n_docs"}))
    got = (hashed_linear_classifier(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values(["lang", "pred_class"])
           .reset_index(drop=True))
    want = want.sort_values(["lang", "pred_class"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_docs": "int64"}), want.astype({"n_docs": "int64"}),
        check_like=True)


def test_rawv_codec_roundtrip_and_frame_sampling():
    """encode→decode roundtrip is exact; stride sampling keeps frames
    0,3,6,... and the checksum pins frame order."""
    import numpy as np
    import pyarrow as pa
    from opentelemetry_collector_contrib_ray.stages.codecs import (
        decode_rawv, encode_rawv,
    )
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        sampled_frame_checksums,
    )

    rng = np.random.Generator(np.random.PCG64(5))
    frames = rng.integers(0, 256, (7, 2, 3, 3), dtype=np.uint8)
    data = encode_rawv(frames)
    back = decode_rawv(data)
    assert (back == frames).all()

    t = pa.table({"media_id": pa.array([0], pa.int64()),
                  "payload": pa.array([data], pa.large_binary())})
    out = sampled_frame_checksums(t, stride=3)
    sampled = frames[::3].astype(np.int64).ravel()
    assert out["n_units"][0].as_py() == len(sampled)
    assert out["sum_units"][0].as_py() == int(sampled.sum())
    w = np.arange(1, len(sampled) + 1)
    assert out["wsum_units"][0].as_py() == int((sampled * w).sum())

    import pytest
    with pytest.raises(ValueError):
        decode_rawv(b"NOPE" + data[4:])
    with pytest.raises(ValueError):
        decode_rawv(data[:-1])


def test_phrase_search_adjacency_and_repeats(tmp_path):
    """Phrase match requires ADJACENT tokens in order; repeated phrase
    terms need genuinely consecutive occurrences; reversed order and
    gapped pairs never match."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.index import (
        build_positional_index,
        phrase_search,
    )

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a table scan runs",        # match
                 "scan table",               # reversed -> no
                 "table big scan",           # gapped -> no
                 "table scan table scan",    # match (twice)
                 ""],                        # empty -> no
    })
    idx = str(tmp_path / "idx")
    build_positional_index(rd.from_pandas(docs).repartition(3), idx,
                           n_buckets=8)
    hits = sorted(phrase_search(idx, ["table", "scan"], n_buckets=8)
                  .to_pandas()["doc_id"].tolist())
    assert hits == [1, 4]

    # repeated-term phrase: only doc 6's true triple repeat matches
    docs2 = pd.DataFrame({
        "doc_id": [6, 7],
        "text": ["x batch batch batch y", "batch x batch batch_end"],
    })
    idx2 = str(tmp_path / "idx2")
    build_positional_index(rd.from_pandas(docs2), idx2, n_buckets=8)
    hits2 = sorted(phrase_search(idx2, ["batch", "batch", "batch"],
                                 n_buckets=8).to_pandas()["doc_id"].tolist())
    assert hits2 == [6]


def test_rake_scores_hand_phrases():
    """RAKE degree/freq on a hand corpus: phrases split at stopwords,
    degree sums member-phrase lengths across occurrences, stopword-only
    and empty docs contribute nothing."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import rake_scores

    docs = pa.table({"text": [
        "deep learning of neural networks and the deep learning",
        "of the and",      # stopword-only → no words
        "",                # empty
        "solo",            # one 1-word phrase
    ]})
    out = (rake_scores(rd.from_arrow(docs), col="text", num_partitions=4)
           .to_pandas().set_index("word"))
    # phrases: [deep learning] x2, [neural networks], [solo]
    assert out.loc["deep"].tolist() == [4, 2]       # 2+2 degree, 2 freq
    assert out.loc["learning"].tolist() == [4, 2]
    assert out.loc["neural"].tolist() == [2, 1]
    assert out.loc["networks"].tolist() == [2, 1]
    assert out.loc["solo"].tolist() == [1, 1]
    assert set(out.index) == {"deep", "learning", "neural", "networks", "solo"}


def test_cdc_chunk_hashes_bit_exact_vs_direct():
    """cdc_chunk_hashes equals the direct per-doc O(n·w) reference on a
    random corpus: same cut rule as cdc_chunk_stats, chunk hash =
    Σ b[start+k]·base^k mod 2^64 (prefix-sum + modular-inverse rebase
    must be bit-identical to the direct sum)."""
    import random

    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.text import (
        cdc_chunk_hashes,
        cdc_chunk_stats,
    )

    BASE, M = 1099511628211, 2 ** 64

    def brute(docs, window=8, mask=64):
        out = []
        for did, s in enumerate(docs):
            b = s.encode()
            n = len(b)
            if n == 0:
                continue
            cuts = [j + window for j in range(max(n - window, 0))
                    if sum(b[j + k] * pow(BASE, k, M)
                           for k in range(window)) % M % mask == 0]
            bounds = [0] + cuts + [n]
            for st, en in zip(bounds[:-1], bounds[1:]):
                ch = sum(b[st + k] * pow(BASE, k, M)
                         for k in range(en - st)) % M
                out.append((did, en - st, ch if ch < 2 ** 63 else ch - M))
        return out

    random.seed(7)
    docs = ["".join(random.choice("abcde ") for _ in range(random.randint(0, 300)))
            for _ in range(40)] + ["", "abc", "a" * 7, "b" * 8]
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    got = list(zip(t["doc_id"].to_pylist() and
                   cdc_chunk_hashes(t)["doc_id"].to_pylist(),
                   cdc_chunk_hashes(t)["chunk_len"].to_pylist(),
                   cdc_chunk_hashes(t)["chunk_hash"].to_pylist()))
    assert got == brute(docs)
    # per-doc chunk counts agree with cdc_chunk_stats
    import collections
    cnt = collections.Counter(d for d, _, _ in got)
    cs = cdc_chunk_stats(t)
    assert all(cnt.get(d, 0) == n for d, n in
               zip(cs["doc_id"].to_pylist(), cs["n_chunks"].to_pylist()))


def test_cdc_shared_chunks_duplicate_docs_collapse():
    """Two byte-identical docs contribute identical (len, hash) chunk
    multisets — unique bytes is half the total."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.text import cdc_chunk_hashes

    import random

    random.seed(11)
    text = "".join(random.choice("abcdefgh ") for _ in range(2000))
    t = pa.table({"doc_id": [1, 2], "text": [text, text]})
    c = cdc_chunk_hashes(t)
    # per-doc (len, hash) multisets equal
    import collections
    by_doc = collections.defaultdict(list)
    for d, ln, h in zip(c["doc_id"].to_pylist(), c["chunk_len"].to_pylist(),
                        c["chunk_hash"].to_pylist()):
        by_doc[d].append((ln, h))
    assert sorted(by_doc[1]) == sorted(by_doc[2]) and len(by_doc[1]) > 1


def test_ccnet_buckets_rank_and_keep(tmp_path):
    """CCNet tercile pruning: rank by (score desc, doc_id asc),
    bucket = ⌊3(rank−1)/n⌋, keep = head+middle. Driven through the
    real query on a 6-doc fixture whose bigram scores are forced by
    repetition (more repeated bigrams → higher fluency score)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    docs = [
        (1, "alpha beta " * 30),       # many repeated bigrams → top score
        (2, "alpha beta " * 20),
        (3, "alpha beta " * 10),
        (4, "gamma delta " * 5),
        (5, "unique one two three"),
        (6, "x"),                      # no repeated bigram → bottom
    ]
    t = pa.table({"doc_id": [d for d, _ in docs],
                  "text": [s for _, s in docs]})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (Q.QUERIES["docs_ccnet_buckets"](str(tmp_path))
           .to_pandas().set_index("doc_id").sort_index())
    assert len(out) == 6
    # scores must be non-increasing along doc_id for this construction
    s = out["lm_score"]
    assert s[1] > s[2] > s[3] > s[4] >= s[5] >= s[6]
    # terciles of 6: ranks 1-2 → bucket 0, 3-4 → 1, 5-6 → 2
    assert out.loc[1, "bucket"] == 0 and out.loc[2, "bucket"] == 0
    assert out.loc[3, "bucket"] == 1 and out.loc[4, "bucket"] == 1
    assert out.loc[5, "bucket"] == 2 and out.loc[6, "bucket"] == 2
    assert out["keep"].tolist() == [True, True, True, True, False, False]


def test_dup_source_matrix_unordered_pairs(tmp_path):
    """Source matrix rolls near-dup pairs up by UNORDERED source pair
    (cross-source orientation-free, same-source on the diagonal)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    docs = [
        (1, base, "web"),
        (2, base + "iota", "books"),    # near-dup of 1, other source
        (3, base + "kappa", "web"),     # near-dup of 1, same source
        (4, "totally different words here nothing shared at all "
            "one two three four five six seven eight nine ten", "web"),
    ]
    t = pa.table({"doc_id": [d for d, _, _ in docs],
                  "text": [s for _, s, _ in docs],
                  "source": [src for _, _, src in docs]})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (Q.QUERIES["docs_dup_source_matrix"](str(tmp_path))
           .to_pandas().set_index(["source_a", "source_b"]))
    # pairs: (1,2) web-books, (1,3) web-web, (2,3) books-web → unordered
    assert out.loc[("books", "web"), "n_pairs"] == 2
    assert out.loc[("web", "web"), "n_pairs"] == 1
    assert len(out) == 2


def test_pmi_bigram_parts_hand():
    """PMI parts pin: adjacency never crosses documents, marginals fold
    over ALL bigrams (including pairs later dropped by min_count), and
    n_total is the corpus bigram count."""
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import pmi_bigram_parts

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        # doc1: a b / b c ; doc2: a b ; doc3 ends with 'a' and doc1
        # starts with 'a' in flat order — must NOT form a cross-doc pair
        "text": ["a b c", "a b", "z a"],
    })
    out = (pmi_bigram_parts(rd.from_arrow(docs).repartition(2), col="text",
                            min_count=2, num_partitions=4)
           .to_pandas().set_index(["w1", "w2"]))
    # bigrams: (a,b)×2, (b,c)×1, (z,a)×1 → only (a,b) survives min_count=2
    assert list(out.index) == [("a", "b")]
    row = out.loc[("a", "b")]
    assert row["pair_n"] == 2
    assert row["left_n"] == 2      # 'a' starts 2 bigrams
    assert row["right_n"] == 2     # 'b' ends 2 bigrams
    assert row["n_total"] == 4     # marginals/total include dropped pairs


def test_readability_parts_hand():
    """Readability pins: \\S+ word runs, [.!?]+ sentence runs (!? and
    ellipses collapse to one), vowel-run syllables, empty text zeros."""
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import readability_parts

    docs = pa.table({
        "source": ["a", "a", "b"],
        # 'Hello world. It is sunny!' → 5 words, 2 sentences,
        # syllables: e|o, o, I, i, u|y → 7
        "text": ["Hello world. It is sunny!", "Wait... what?!", None],
    })
    out = (readability_parts(rd.from_arrow(docs).repartition(2),
                             col="text", group_col="source")
           .to_pandas().set_index("source"))
    # 'Wait... what?!' → 2 words, 2 sentence runs ('...' and '?!'),
    # syllables: ai, a → 2
    assert out.loc["a"][["n_words", "n_sentences", "n_syllables",
                         "n_docs"]].tolist() == [7, 4, 9, 2]
    assert out.loc["b"][["n_words", "n_sentences", "n_syllables",
                         "n_docs"]].tolist() == [0, 0, 0, 1]


def test_term_freq_spectrum_boundaries():
    """Spectrum pins: power-of-2 bucket boundaries are exact (freq 2^k
    lands in bucket k), counts merge across blocks before bucketing."""
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import term_freq_spectrum

    docs = pa.table({"text": ["a a a", "a b b c", "d d d"]})
    # freqs: a=4 → bucket 2, b=2 → bucket 1, d=3 → bucket 1, c=1 → bucket 0
    out = (term_freq_spectrum(rd.from_arrow(docs).repartition(3),
                              col="text", num_partitions=4)
           .to_pandas().set_index("bucket").sort_index())
    assert out.loc[0].tolist() == [1, 1]    # n_terms, sum_freq
    assert out.loc[1].tolist() == [2, 5]
    assert out.loc[2].tolist() == [1, 4]


def test_adjacent_echo_distinct_tokens_and_pairing():
    """Echo pins: only (user → immediately-next assistant) pairs count
    (assistant→assistant and user→user don't), overlap counts DISTINCT
    assistant tokens present anywhere in the user turn (duplicates in
    either side collapse), empty assistant text contributes a pair
    with 0 tokens, and the day bucket comes from the ASSISTANT turn."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import adjacent_echo_stats

    base = np.datetime64("2024-03-01T23:59:00", "us")
    M = np.timedelta64(1, "m")
    df = pd.DataFrame({
        "conv": ["a"] * 4 + ["b"] * 2,
        "turn": [0, 1, 2, 3, 0, 1],
        "role": ["user", "assistant", "assistant", "user",
                 "user", "assistant"],
        # pair 1: user 'x y x' vs asst 'y y z' → asst distinct {y,z},
        #   overlap {y} → (1 overlap, 2 tokens); lands on 2024-03-02
        #   (assistant ts crosses midnight)
        # asst→asst turn 2 and trailing user turn 3: no pair
        # pair 2 (conv b): empty assistant → (0, 0); stays on 03-01
        #   (23:50) while pair 1's assistant at 00:01 crosses to 03-02
        "text": ["x y x", "y y z", "ignored", "x",
                 "p q", ""],
        "ts": [base, base + 2 * M, base + 3 * M, base + 4 * M,
               base - 10 * M, base - 9 * M],
    })
    out = adjacent_echo_stats(rd.from_pandas(df).repartition(2),
                              key="conv", order_col="turn",
                              role_col="role", text_col="text",
                              ts_col="ts").to_pandas()
    got = {str(r.day)[:10]: (r.n_pairs, r.sum_overlap, r.sum_asst_tokens)
           for r in out.itertuples()}
    assert got == {"2024-03-02": (1, 1, 2), "2024-03-01": (1, 0, 0)}


def test_conv_template_dedup_session_split_and_templating(tmp_path):
    """Session-dedup pins: a >30-min gap splits a conversation into
    sessions (an exactly-30-min gap does NOT), digit runs template to
    '#' so values differing only in numbers collapse, and the
    spectrum counts groups by size."""
    import pandas as pd
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_conv_template_dedup,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(1, "m")
    # user 7 events: two view events 31min apart → 2 sessions, each
    # canonicalizing to the same 1-turn template (latency digits
    # differ → '#' collapses them) → one group of size 2.
    # user 8: two view events exactly 30min apart → ONE 2-turn
    # session → its own group of size 1.
    # event_id % 10 picks the text form; ids 3,13,23,33 → bucket 3
    # (logline form 'TRACE latency_ms=... status=... msg=evt_view').
    t = pa.table({
        "event_id": pa.array([3, 13, 23, 33], pa.int64()),
        "ts": pa.array([base, base + 31 * M, base, base + 30 * M]),
        "user_id": pa.array([7, 7, 8, 8], pa.int64()),
        "event_type": ["view"] * 4,
        "value": [1.5, 2.5, 3.5, 4.5],
        "props": ["{}"] * 4,
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_conv_template_dedup(str(tmp_path)).to_pandas()
    got = {r.group_size: r.n_groups for r in out.itertuples()}
    assert got == {2: (1), 1: (1)}


def test_conv_curation_e2e_funnel_composition(tmp_path):
    """E2E curation funnel pins the STAGE COMPOSITION: the dedup
    winner is chosen BEFORE the echo filter runs (a duplicate session
    that would fail the echo filter is removed by dedup, and the
    surviving first-(conv, sess) winner is the one the filter judges);
    exactly-half echo overlap survives (strictly-more-than-half
    drops); a zero-pair session survives (0 <= 0); and the budget
    keeps the suffix at EXACTLY 64 tokens but drops the turn that
    crosses it."""
    import pandas as pd
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_conv_curation_e2e,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(1, "m")
    # conv1 (user 1): signup→purchase twice, split by a 31-min gap.
    #   Session A (eids 10, 20): lat 15 vs 25, status 203 vs 206 →
    #   echo overlap {INFO} = 1 of 4 → 2*1 <= 4 survives.
    #   Session B (eids 30, 44): lat 30 = 30, status 202 = 202 →
    #   overlap {INFO, latency_ms=30, status=202} = 3 of 4 → would be
    #   echo-dropped IF it won dedup. Same digit template as A.
    # conv2 (user 2): ONE signup→purchase session (exact-30-min gap
    #   does NOT split), same template, echo-heavy like B → deduped.
    #   Dedup winner of the 3-member group = (conv1, sess 0) = A.
    # conv3 (user 3): 17 view turns (tool role → no user→assistant
    #   pair → ovl=asst=0 survives), 4 tokens each = 68 > 64 → budget
    #   keeps the most-recent 16 turns (exactly 64 tokens).
    eids = [10, 20, 30, 44, 100, 114] + [
        1000 + 10 * (i // 5) + (i % 5) for i in range(17)]
    ts = [base, base + 1 * M, base + 32 * M, base + 33 * M,
          base, base + 30 * M] + [base + i * M for i in range(17)]
    uids = [1, 1, 1, 1, 2, 2] + [3] * 17
    etypes = ["signup", "purchase"] * 2 + ["signup", "purchase"] + [
        "view"] * 17
    vals = [1.5, 2.5, 3.0, 3.04, 4.0, 4.04] + [1.0] * 17
    t = pa.table({
        "event_id": pa.array(eids, pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(uids, pa.int64()),
        "event_type": etypes,
        "value": vals,
        "props": ["{}"] * len(eids),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_conv_curation_e2e(str(tmp_path)).to_pandas()
    got = {r.stage: (r.n_sessions, r.n_turns, r.n_tokens)
           for r in out.itertuples()}
    assert got == {
        "1_ingested": (4, 23, 92),
        "2_deduped": (2, 19, 76),
        "3_echo_filtered": (2, 19, 76),
        "4_budgeted": (2, 18, 72),
    }


def test_conv_repeated_questions_templating_and_scope(tmp_path):
    """Repeated-question pins: digit-differing user turns collapse to
    the same template and count as a repeat; the SAME question in a
    DIFFERENT conversation does not (per-conv scope); assistant/tool
    turns never count as questions."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_conv_repeated_questions,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(1, "m")
    # conv1 (user 1): clicks eid 11 & 21 (user role, bucket-1 logline,
    #   digits differ → same '#' template → ask_count 2), signup eid 31
    #   (user, distinct template → ask_count 1), view eid 41 (tool role
    #   → ignored).
    # conv2 (user 2): click eid 101 → SAME click template but its own
    #   conv → its own pair with ask_count 1; purchase eid 111
    #   (assistant role → ignored).
    t = pa.table({
        "event_id": pa.array([11, 21, 31, 41, 101, 111], pa.int64()),
        "ts": pa.array([base + i * M for i in range(6)]),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "event_type": ["click", "click", "signup", "view",
                       "click", "purchase"],
        "value": [1.5, 2.5, 3.5, 4.5, 5.5, 6.5],
        "props": ["{}"] * 6,
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_conv_repeated_questions(str(tmp_path)).to_pandas()
    got = {r.ask_count: r.n_pairs for r in out.itertuples()}
    assert got == {2: 1, 1: 2}


def test_winnow_fingerprints_brute_force_and_rightmost_tie():
    """Winnowing (Schleimer 2003) pins: bit-exact equality with a
    per-position brute force over random short docs (incl. empty and
    sub-window docs), and the RIGHTMOST-tie rule — an all-identical
    doc ('a'*12, every 8-gram hash equal) selects positions {4, 5}
    (leftmost-tie would select {1, 2})."""
    from opentelemetry_collector_contrib_ray.stages.text import (
        winnow_fingerprints,
    )

    K, W = 8, 4
    rng = np.random.default_rng(7)
    docs = ["".join(rng.choice(list("abcd "), int(rng.integers(0, 40))))
            for _ in range(120)]
    docs += ["", "abc", "a" * 12, "abcabcabcabcabcab"]
    t = pa.table({"doc_id": [f"d{i}" for i in range(len(docs))],
                  "text": docs})
    out = winnow_fingerprints(t, k=K, w=W)

    BASE = np.uint64(1099511628211)
    exp = set()
    for i, s in enumerate(docs):
        b = s.encode()
        n = len(b)
        hs = []
        for j in range(max(n - K + 1, 1)):
            h = np.uint64(0)
            with np.errstate(over="ignore"):
                for kk in range(K):
                    byte = b[j + kk] if j + kk < n else 0
                    h = h + np.uint64(byte) * (BASE ** np.uint64(kk))
            hs.append(int(h))
        for j in range(max(len(hs) - W + 1, 1)):
            wvals = hs[j:j + W]
            mn = min(wvals)
            p = j + max(ix for ix, v in enumerate(wvals) if v == mn)
            exp.add((f"d{i}", p + 1, mn))
    got = {(d, p, int(np.uint64(np.int64(h)))) for d, p, h in zip(
        out["doc_id"].to_pylist(), out["fp_pos"].to_pylist(),
        out["fp_hash"].to_pylist())}
    assert got == exp
    tie = {p for d, p, _ in got if d == f"d{len(docs) - 2}"}
    assert tie == {4, 5}


def test_docs_filter_ablation_unique_fail_semantics(tmp_path):
    """Ablation pins: n_unique_fail counts docs failing EXACTLY that
    one rule (a doc failing two rules contributes to both n_fail
    columns but to neither n_unique_fail), verified differentially
    against the gopher_rules flags themselves."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        _GOPHER_FLAGS,
        q_docs_filter_ablation,
    )
    from opentelemetry_collector_contrib_ray.stages.text import gopher_rules

    good = ("this is a fine document that we have written with care and "
            "the words flow to be of reasonable length " * 3)
    docs = [good,                       # passes everything
            "- one\n- two\n- three",    # bullets AND too few words
            good + " ............................",  # symbols only? or more
            # 3-char words keep mean word length in range → fails ONLY
            # the stopword rule
            "zzz qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss ddd fff ggg"]
    t = pa.table({"doc_id": [f"d{i}" for i in range(len(docs))],
                  "text": docs})
    flags = gopher_rules(t, min_words=10)
    fails = {f: (1 - np.asarray(flags[f].to_pylist(), dtype=int))
             for f in _GOPHER_FLAGS}
    nfail = sum(fails.values())
    exp = {f: (int(fails[f].sum()),
               int((fails[f] * (nfail == 1)).sum()))
           for f in _GOPHER_FLAGS}
    # the fixture must actually exercise both sides: at least one doc
    # failing exactly one rule and one failing more than one
    assert (nfail == 1).any() and (nfail > 1).any()

    pq.write_table(t.append_column("source", pa.array(["s"] * len(docs))),
                   tmp_path / "documents.parquet")
    out = q_docs_filter_ablation(str(tmp_path)).to_pandas()
    got = {r.rule: (r.n_fail, r.n_unique_fail) for r in out.itertuples()}
    assert got == exp


def test_conv_error_position_tercile_math(tmp_path):
    """Position-tercile pins: ⌊3·idx/n⌋ boundaries for n=4 (positions
    0,0,1,2), a single-turn conversation lands in tercile 0, and only
    5xx statuses count as hits (2xx view turns do not)."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_conv_error_position,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(1, "m")
    t = pa.table({
        "event_id": pa.array([11, 21, 31, 41, 51], pa.int64()),
        "ts": pa.array([base, base + M, base + 2 * M, base + 3 * M, base]),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": ["view", "view", "error", "error", "error"],
        "value": [1.0] * 5,
        "props": ["{}"] * 5,
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_conv_error_position(str(tmp_path)).to_pandas()
    got = {r.tercile: (r.n_turns, r.n_hits) for r in out.itertuples()}
    assert got == {0: (3, 1), 1: (1, 1), 2: (1, 1)}


def test_docs_token_fertility_composition(tmp_path):
    """Fertility pins: grouping is by PREDICTED language (LangId ∘
    token_stats composition), BPE counts split punctuation off words
    (fr doc: 7 BPE vs 5 ws tokens), and the empty doc lands in
    'unknown' with all-zero sums."""
    import re

    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_token_fertility,
    )

    docs = [
        ("the cat and the dog went to the park and it is nice", "en"),
        ("le chat, et la maison est une belle chose de la vie.", "fr"),
        ("", "unknown"),
    ]
    tok_re = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")
    exp = {}
    for text, lang in docs:
        d = exp.setdefault(lang, [0, 0, 0, 0])
        d[0] += 1
        d[1] += len(tok_re.findall(text))
        d[2] += len(text.split())
        d[3] += len(text)
    # the fr doc must actually exercise the bpe-vs-ws split
    assert exp["fr"][1] == exp["fr"][2] + 2

    t = pa.table({"doc_id": [f"d{i}" for i in range(len(docs))],
                  "text": [d[0] for d in docs]})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_docs_token_fertility(str(tmp_path)).to_pandas()
    got = {r.lang_pred: [r.n_docs, r.sum_bpe, r.sum_ws, r.sum_chars]
           for r in out.itertuples()}
    assert got == exp


def test_conv_tool_error_attribution_adjacency(tmp_path):
    """Attribution pins: only the IMMEDIATELY-next turn counts (a user
    turn between tool call and error breaks attribution), and a
    conversation-final tool call has no next turn so it never counts."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_conv_tool_error_attribution,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(1, "m")
    # view → tool 'browser'; purchase → tool 'db_query'; error →
    # role system with status=5xx text; click → role user.
    t = pa.table({
        "event_id": pa.array([11, 21, 31, 41, 51, 61], pa.int64()),
        "ts": pa.array([base + i * M for i in range(6)]),
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": ["view", "error", "view", "click", "error",
                       "purchase"],
        "value": [1.0] * 6,
        "props": ["{}"] * 6,
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_conv_tool_error_attribution(str(tmp_path)).to_pandas()
    got = {r.tool: (r.n_calls, r.n_next_error) for r in out.itertuples()}
    assert got == {"browser": (2, 1), "db_query": (1, 0)}


def test_events_lifecycle_audit_categories(tmp_path):
    """Lifecycle pins: all four categories, the same-timestamp tie
    counts as ok (strict <), and a user with neither event type is out
    of scope entirely."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_lifecycle_audit,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(1, "m")
    rows = [  # (user, etype, ts)
        (1, "signup", base), (1, "purchase", base + M),      # ok
        (2, "purchase", base), (2, "signup", base + M),      # before
        (3, "purchase", base),                               # w/o signup
        (4, "signup", base),                                 # no purchase
        (5, "view", base),                                   # out of scope
        (6, "signup", base + M), (6, "purchase", base + M),  # tie → ok
    ]
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[2] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": [r[1] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_lifecycle_audit(str(tmp_path)).to_pandas()
    got = {r.category: r.n_users for r in out.itertuples()}
    assert got == {"ok": 2, "purchase_before_signup": 1,
                   "purchase_without_signup": 1, "no_purchase": 1}


def test_conv_vocab_introduction_first_turn_attribution(tmp_path):
    """Vocab-introduction pins: a token repeated in a later turn is
    attributed ONLY to the first turn's role; duplicates inside the
    introducing turn collapse to one; the same token in another
    conversation is a fresh introduction there."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    df = pd.DataFrame({
        "conv_id": ["a", "a", "b"],
        "turn_idx": [0, 1, 0],
        "role": ["user", "assistant", "tool"],
        # turn a0 (user): x y x → introduces {x, y} (dup x collapses)
        # turn a1 (assistant): y z → y already seen → introduces {z}
        # conv b (tool): x → fresh in conv b → introduces {x}
        "text": ["x y x", "y z", "x"],
    })

    ds = rd.from_pandas(df).repartition(2)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_vocab_introduction("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {r.role: r.n_introduced for r in out.itertuples()}
    assert got == {"user": 2, "assistant": 1, "tool": 1}


def test_docs_dedup_threshold_sweep_tier_boundaries(tmp_path):
    """Sweep pins: a J=0.5 pair counts ONLY at tier 5 (the ≥ boundary),
    a J=0.8 pair counts at tiers 5–8 (40 ≥ 8·5 but not 9·5), and an
    identical pair counts at every tier — cumulative counts 3/2/2/2/1."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_dedup_threshold_sweep,
    )

    docs = [
        (1, "a b c d"),        # grams {abc, bcd}
        (2, "a b c"),          # gram {abc} → shared 1, union 2 → J=0.5
        (3, "x y z w"),        # identical pair → J=1
        (4, "x y z w"),
        (5, "p q r s t u v"),  # 5 grams
        (6, "p q r s t u"),    # 4 grams, all shared → J=4/5=0.8
    ]
    t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": [d[1] for d in docs]})
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_docs_dedup_threshold_sweep(str(tmp_path)).to_pandas()
    got = {r.threshold_tenths: r.n_pairs for r in out.itertuples()}
    assert got == {5: 3, 6: 2, 7: 2, 8: 2, 9: 1}


def test_events_type_cooccurrence_user_grain(tmp_path):
    """Co-occurrence pins: a user counts ONCE per pair regardless of
    event multiplicity, pairs are ordered a < b with no diagonal, and
    single-type users contribute nothing."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_type_cooccurrence,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [  # (user, etype) — user 1: 3 views + click + purchase;
              # user 2: click only; user 3: click + view
        (1, "view"), (1, "view"), (1, "view"), (1, "click"),
        (1, "purchase"), (2, "click"), (3, "click"), (3, "view")]
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([base] * len(rows)),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": [r[1] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_type_cooccurrence(str(tmp_path)).to_pandas()
    got = {(r.type_a, r.type_b): r.n_users for r in out.itertuples()}
    assert got == {("click", "view"): 2, ("click", "purchase"): 1,
                   ("purchase", "view"): 1}


def test_conv_turn_taking_boundaries(tmp_path):
    """Turn-taking pins: transitions never cross conversation
    boundaries (the last turn of conv a and first of conv b do not
    pair), and self-transitions count."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "b", "b"],
        "turn_idx": [0, 1, 2, 0, 1],
        "role": ["user", "assistant", "assistant", "tool", "user"],
    })
    ds = rd.from_pandas(df).repartition(2)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_turn_taking("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {(r.role_from, r.role_to): r.n_transitions
           for r in out.itertuples()}
    # conv a: user→assistant, assistant→assistant; conv b: tool→user;
    # NO assistant→tool pair across the a/b boundary
    assert got == {("user", "assistant"): 1, ("assistant", "assistant"): 1,
                   ("tool", "user"): 1}


def test_conv_tool_latency_gaps(tmp_path):
    """Tool-latency pins: the gap is to the NEXT turn of the same
    conversation (a conversation-final tool call is excluded), a
    same-timestamp pair contributes a zero gap, and sums/maxes are
    exact microseconds."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "b", "b"],
        "turn_idx": [0, 1, 2, 0, 1],
        "tool": ["browser", "", "db_query", "browser", ""],
        # browser a0→a1: 3 s; db_query a2: conversation-final → out;
        # browser b0→b1: same timestamp → 0 gap
        "ts": [base, base + 3 * S, base + 9 * S, base, base],
    })
    ds = rd.from_pandas(df).repartition(2)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_tool_latency("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {r.tool: (r.n_pairs, r.sum_gap_us, r.max_gap_us)
           for r in out.itertuples()}
    assert got == {"browser": (2, 3_000_000, 3_000_000)}


def test_conv_abandonment_final_turn_rules(tmp_path):
    """Abandonment pins: the final turn is the (ts, event_id)-max (a
    same-timestamp tie resolves to the higher event_id), turn counts
    SUM across blocks when a conversation is split, and every final
    role present gets its own row."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "b", "b", "c", "c", "d"],
        "event_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "role": ["user", "assistant", "user",      # a ends on user
                 "user", "assistant",              # b ends on assistant
                 "assistant", "tool",              # c: same-ts tie →
                 "system"],                        #   eid 7 (tool) wins
        "text": [""] * 8,
        "tool": [""] * 8,
        "ts": [base, base + S, base + 2 * S,
               base, base + S,
               base + S, base + S,
               base],
    })
    ds = rd.from_pandas(df).repartition(3)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_abandonment("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {r.final_role: (r.n_convs, r.sum_turns, r.max_turns)
           for r in out.itertuples()}
    assert got == {"user": (1, 3, 3), "assistant": (1, 2, 2),
                   "tool": (1, 2, 2), "system": (1, 1, 1)}


def test_events_streaks_islands(tmp_path):
    """Streak pins: a gap day breaks the run (0,1,2 then 4,5 → max 3),
    alternating days never chain (0,2,4 → 1), multiple events inside
    one day collapse to one active day, and the histogram counts
    users at their MAX streak only."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_streaks,
    )

    day0 = np.datetime64("2024-01-01T12:00:00", "us")
    D = np.timedelta64(1, "D")
    H = np.timedelta64(1, "h")
    rows = [  # (user, ts)
        (1, day0), (1, day0 + D), (1, day0 + 2 * D),
        (1, day0 + 4 * D), (1, day0 + 5 * D),          # max 3
        (2, day0 + 10 * D),                            # 1
        (3, day0), (3, day0 + 2 * D), (3, day0 + 4 * D),  # 1
        (4, day0 + 7 * D), (4, day0 + 8 * D),          # 2
        (4, day0 + 8 * D + H),                         # same-day dup
    ]
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_streaks(str(tmp_path)).to_pandas()
    got = {r.streak_len: r.n_users for r in out.itertuples()}
    assert got == {3: 1, 1: 2, 2: 1}


def test_events_dow_hour_matrix_formula(tmp_path):
    """Calendar-matrix pins: 2024-01-01 (a Monday) lands in dow=1
    under the shared (epoch_day + 4) % 7 formula (0 = Sunday), hours
    split rows into distinct cells, and counts accumulate per cell."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_dow_hour_matrix,
    )

    mon = np.datetime64("2024-01-01T13:00:00", "us")  # Monday 13:00
    sun = np.datetime64("2024-01-07T00:30:00", "us")  # Sunday 00:xx
    rows = [("view", mon), ("view", mon), ("click", mon), ("view", sun)]
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": [r[0] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_dow_hour_matrix(str(tmp_path)).to_pandas()
    got = {(r.event_type, r.dow, r.hour): r.n for r in out.itertuples()}
    assert got == {("view", 1, 13): 2, ("click", 1, 13): 1,
                   ("view", 0, 0): 1}


def test_docs_char_class_census_classes(tmp_path):
    """Census pins: each ASCII class counts its own codepoints only, a
    non-ASCII letter lands in n_other (classes are ASCII by
    declaration), and an empty doc is all zeros."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_char_class_census,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["Ab3 \n?", "", "é9"],
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (q_docs_char_class_census(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1].tolist() == [1, 1, 1, 2, 1]
    assert out.loc[2].tolist() == [0, 0, 0, 0, 0]
    assert out.loc[3].tolist() == [0, 0, 1, 0, 1]


def test_silence_stats_threshold_and_lead():
    """Silence pins: |i16| < 3277 is silent (0.05 FS → 1638 counts,
    0.5 FS → 16384 does not), lead_silent is the run BEFORE the first
    loud sample, and a fully-silent clip reads lead == n_samples."""
    from opentelemetry_collector_contrib_ray.stages.multimodal import silence_stats

    w1 = np.array([0.0, 0.05, 0.5, 0.0, -0.5], np.float32) \
        .astype(np.float64) / 1.0
    w2 = np.zeros(4, np.float64)
    col = pa.array([ (w1 / 1.0).tolist(), w2.tolist() ],
                   type=pa.list_(pa.float32()))
    t = pa.table({"media_id": pa.array([7, 8], pa.int64()),
                  "waveform": col})
    out = silence_stats(t).to_pandas().set_index("media_id")
    assert out.loc[7].tolist() == [5, 3, 2]
    assert out.loc[8].tolist() == [4, 4, 4]


def test_conv_tool_first_use_depth_buckets():
    """First-use pins: later uses of the same tool in a conversation
    never recount (min turn wins), turn_idx ≥ 9 clamps into bucket 9
    while sum_first_turn keeps the exact value, and each (conv, tool)
    contributes once."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "a", "b"],
        "turn_idx": [0, 1, 5, 12, 0],
        "role": ["user", "tool", "tool", "tool", "tool"],
        "text": [""] * 5,
        "tool": ["", "browser", "browser", "db_query", "browser"],
    })
    ds = rd.from_pandas(df).repartition(2)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_tool_first_use_depth("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {(r.tool, r.bucket): (r.n_convs, r.sum_first_turn)
           for r in out.itertuples()}
    assert got == {("browser", 1): (1, 1), ("browser", 0): (1, 0),
                   ("db_query", 9): (1, 12)}


def test_conv_duration_hist_buckets():
    """Duration pins: span is max−min ts (a single-turn conversation
    reads 0 s), day decades clamp at bucket 9, and second sums are
    exact across split blocks."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    rows = [("a", 1, base), ("a", 2, base + 1800 * S),       # 30 min → b0
            ("b", 3, base), ("b", 4, base + 216000 * S),     # 2.5 d → b2
            ("c", 5, base),                                  # 0 s → b0
            ("d", 6, base), ("d", 7, base + 1_728_000 * S)]  # 20 d → b9
    df = pd.DataFrame({
        "conv_id": [r[0] for r in rows],
        "event_id": [r[1] for r in rows],
        "role": ["user"] * len(rows),
        "text": [""] * len(rows),
        "tool": [""] * len(rows),
        "ts": [r[2] for r in rows],
    })
    ds = rd.from_pandas(df).repartition(3)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_duration_hist("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {r.bucket: (r.n_convs, r.sum_seconds) for r in out.itertuples()}
    assert got == {0: (2, 1800), 2: (1, 216000), 9: (1, 1_728_000)}


def test_docs_prefix_boilerplate_groups(tmp_path):
    """Boilerplate pins: grouping is on the first 32 CHARACTERS (a
    multibyte prefix groups identically in both engines), docs shorter
    than 32 chars group on their whole text, and singles never
    count."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_prefix_boilerplate,
    )

    p, q, e = "A" * 32, "B" * 32, "é" * 32
    texts = [p + "x", p + "y", p + "z",    # group of 3
             q + "1", q + "2",             # group of 2
             "short", "short",             # short-text group of 2
             e + "a", e + "b",             # multibyte group of 2
             "unique-doc"]                 # single → out
    t = pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_docs_prefix_boilerplate(str(tmp_path)).to_pandas()
    assert out.iloc[0].tolist() == [4, 9, 3]


def test_events_spike_days_threshold(tmp_path):
    """Spike pins: the test is STRICTLY greater than median + 3·MAD on
    the lower-median statistics; a flat series (MAD 0) flags any day
    above the median, and max_daily reads the true peak."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_spike_days,
    )

    day0 = np.datetime64("2024-01-01T00:00:00", "us")
    D = np.timedelta64(1, "D")
    rows = []
    # type "a": daily counts [2,2,2,2,9] → med 2, MAD 0, thr 2 → one
    # spike day (9) and max 9
    for day, cnt in enumerate([2, 2, 2, 2, 9]):
        rows += [("a", day0 + day * D)] * cnt
    # type "b": [1,3,5] → med 3, MAD 2, thr 9 → no spikes
    for day, cnt in enumerate([1, 3, 5]):
        rows += [("b", day0 + day * D)] * cnt
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": [r[0] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_spike_days(str(tmp_path)).to_pandas()
    got = {r.event_type: (r.n_days, r.n_spike_days, r.max_daily)
           for r in out.itertuples()}
    assert got == {"a": (5, 1, 9), "b": (3, 0, 5)}


def test_emb_dim_stats_quantization(tmp_path):
    """Dim-stats pins: the cents map is floor(x·10000 + 0.5) on the
    float32-promoted value (0.00025f → 3 rounds half-up, 0.00012f → 1
    floors), per-dimension min/max/sum survive cross-block folding,
    and dims index from 0."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_emb_dim_stats,
    )

    vecs = [[0.00025, 1.0], [0.00012, -2.5], [0.5, 0.25]]
    t = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = (q_emb_dim_stats(str(tmp_path)).to_pandas()
           .set_index("dim").sort_index())
    assert out.loc[0].tolist() == [3, 3 + 1 + 5000, 1, 5000]
    assert out.loc[1].tolist() == [3, 10000 - 25000 + 2500, -25000, 10000]


def test_events_stickiness_parts_distincts(tmp_path):
    """Stickiness pins: same-day repeats collapse to one user-day, a
    week is epoch-day // 7 (day 7 starts a new week), and the three
    counts are global distincts across blocks."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_stickiness_parts,
    )

    day0 = np.datetime64("2024-01-04T00:00:00", "us")  # epoch day %7==0
    assert (day0.astype("datetime64[D]").astype(int)) % 7 == 0
    D = np.timedelta64(1, "D")
    H = np.timedelta64(1, "h")
    rows = [(1, day0 + k * D) for k in range(8)]   # days 0..7 → 2 weeks
    rows += [(2, day0), (2, day0 + H)]             # same-day dup
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_stickiness_parts(str(tmp_path)).to_pandas()
    assert out.iloc[0].tolist() == [9, 3, 2]


def test_docs_line_length_profile_split_semantics(tmp_path):
    """Line-profile pins: a trailing newline yields a trailing empty
    line, an empty doc is one empty line, and lengths ≥ 90 clamp into
    bucket 9 with exact sums."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_line_length_profile,
    )

    texts = ["abc\ndefghij\n",  # 3, 7, '' → all bucket 0
             "x" * 95,          # bucket 9
             ""]                # one empty line → bucket 0
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": texts,
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_docs_line_length_profile(str(tmp_path)).to_pandas()
    got = {r.bucket: (r.n_lines, r.sum_len) for r in out.itertuples()}
    assert got == {0: (4, 10), 9: (1, 95)}


def test_conv_text_parse_rate_precedence():
    """Parse-rate pins: classification follows the ordered CASE
    (logline before kv), empty only when the text is exactly '', and
    broken JSON lands in other."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "conv_id": ["a"] * 6,
        "event_id": list(range(6)),
        "role": ["user"] * 6,
        "text": ["INFO latency_ms=5 status=200 msg=evt_x",   # logline
                 '{"event": "click", "latency_ms": 3}',      # json
                 "latency_ms=5 status=200 region=r1",        # kv
                 "",                                         # empty
                 "{broken json",                             # other
                 "latency_ms="],                             # other
        "tool": [""] * 6,
        "ts": [base] * 6,
    })
    ds = rd.from_pandas(df).repartition(2)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_text_parse_rate("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {(r.role, r.fmt): r.n_turns for r in out.itertuples()}
    assert got == {("user", "logline"): 1, ("user", "json"): 1,
                   ("user", "kv"): 1, ("user", "empty"): 1,
                   ("user", "other"): 2}


def test_events_dup_event_audit_groups(tmp_path):
    """Dup-audit pins: a triple repeated k times contributes k−1 extra
    rows, groups split by ANY differing key component, and a clean
    table reads all zeros."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_dup_event_audit,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    rows = [(1, "view", base)] * 3       # group of 3 → 2 extra
    rows += [(1, "view", base + S)]      # differs on ts → clean
    rows += [(1, "click", base)]         # differs on type → clean
    rows += [(2, "view", base)] * 2      # group of 2 → 1 extra
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[2] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": [r[1] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_dup_event_audit(str(tmp_path)).to_pandas()
    assert out.iloc[0].tolist() == [2, 3, 3]


def test_events_night_owl_segments_majority(tmp_path):
    """Segment pins: the rule is STRICTLY more than half in hours 0–5
    (an exact 50/50 user is daytime), hour 5 is night and hour 6 is
    not, and event mass sums per segment."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_night_owl_segments,
    )

    d = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    rows = [(1, d + 5 * H), (1, d + 5 * H), (1, d + 12 * H),  # 2/3 night
            (2, d + 5 * H), (2, d + 6 * H),                   # 1/2 → day
            (3, d + 6 * H)]                                   # 0/1 → day
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_night_owl_segments(str(tmp_path)).to_pandas()
    got = {r.segment: (r.n_users, r.sum_events) for r in out.itertuples()}
    assert got == {"night_owl": (1, 3), "daytime": (2, 3)}


def test_orders_weekday_revenue_dow_and_cents(tmp_path):
    """Weekday-revenue pins: 2024-01-01 (Monday) → dow 1 under the
    shared formula, and cents round half-up exactly."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_orders_weekday_revenue,
    )

    t = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_orderstatus": ["O"] * 3,
        "o_totalprice": pa.array([10.005, 0.004, 99.999], pa.float64()),
        "o_orderdate": pa.array(np.array(
            ["2024-01-01", "2024-01-01", "2024-01-07"],
            dtype="datetime64[D]")),
        "o_orderpriority": ["1-URGENT"] * 3,
    })
    pq.write_table(t, tmp_path / "orders.parquet")
    out = q_orders_weekday_revenue(str(tmp_path)).to_pandas()
    got = {r.dow: (r.n_orders, r.revenue_cents) for r in out.itertuples()}
    # 10.005*100+0.5 floors to 1001 (float64 10.005 ≈ 10.00499999),
    # 0.004 → 0, 99.999 → 10000
    import numpy as _np
    c1 = int(_np.floor(10.005 * 100 + 0.5)) + int(_np.floor(0.004 * 100 + 0.5))
    assert got == {1: (2, c1), 0: (1, int(_np.floor(99.999 * 100 + 0.5)))}


def test_events_weekend_effect_parts_split(tmp_path):
    """Weekend pins: Saturday and Sunday (dow 6 and 0) are weekend,
    Monday is not, and cents land in exactly one side per row."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_weekend_effect_parts,
    )

    rows = [("view", np.datetime64("2024-01-06T10:00:00", "us"), 1.0),   # Sat
            ("view", np.datetime64("2024-01-07T10:00:00", "us"), 2.0),   # Sun
            ("view", np.datetime64("2024-01-08T10:00:00", "us"), 4.0)]   # Mon
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": [r[0] for r in rows],
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "props": ["{}"] * 3,
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_weekend_effect_parts(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert [r.n_weekday, r.cents_weekday, r.n_weekend,
            r.cents_weekend] == [1, 400, 2, 300]


def test_multimodal_lum_collision_differential():
    """Lum-collision differential: the distributed result over the
    real oracle media table equals a naive pure-Python re-decode
    (codec directly, collections.Counter per image) for every one of
    the 256 images — decode layout, the 299/587/114 weights and the
    collision counting all re-derived on a second path."""
    from collections import Counter

    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_multimodal_lum_collision,
    )
    from opentelemetry_collector_contrib_ray.stages.codecs import decode_image
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        ensure_mm_oracle_tables,
    )

    d = ensure_mm_oracle_tables()
    out = (q_multimodal_lum_collision("unused").to_pandas()
           .set_index("media_id").sort_index())
    media = pq.read_table(f"{d}/media.parquet").to_pylist()
    assert len(out) == len(media) == 256
    for row in media:
        img = decode_image(row["payload"], row["meta.width"],
                           row["meta.height"]).astype(np.int64)
        lum = (299 * img[:, :, 0] + 587 * img[:, :, 1]
               + 114 * img[:, :, 2]).ravel()
        c = Counter(lum.tolist())
        got = out.loc[row["media_id"]]
        assert got["n_pixels"] == lum.size
        assert got["n_distinct_lum"] == len(c)
        assert got["sum_sq"] == sum(k * k for k in c.values())


def test_orders_basket_size_hist(tmp_path):
    """Basket pins: counts group per order across blocks and the
    histogram counts orders at their exact size."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_orders_basket_size_hist,
    )

    keys = [1, 1, 1, 2, 3, 3]
    t = pa.table({
        "l_orderkey": pa.array(keys, pa.int64()),
        "l_partkey": pa.array([1] * 6, pa.int64()),
        "l_suppkey": pa.array([1] * 6, pa.int64()),
        "l_linenumber": pa.array(list(range(1, 7)), pa.int32()),
        "l_quantity": pa.array([1.0] * 6),
        "l_extendedprice": pa.array([1.0] * 6),
        "l_discount": pa.array([0.0] * 6),
        "l_tax": pa.array([0.0] * 6),
        "l_returnflag": ["N"] * 6,
        "l_linestatus": ["O"] * 6,
        "l_shipdate": pa.array(
            np.array(["2024-01-01"] * 6, dtype="datetime64[us]")),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = q_orders_basket_size_hist(str(tmp_path)).to_pandas()
    got = {r.basket_size: r.n_orders for r in out.itertuples()}
    assert got == {3: 1, 1: 1, 2: 1}


def test_events_type_hour_entropy_parts(tmp_path):
    """Concentration pins: a single-hour burst reads sum_sq = n², a
    two-hour even split reads n²/2, and active hours count only hours
    with events."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_type_hour_entropy_parts,
    )

    d = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    rows = [("burst", d + 3 * H)] * 4
    rows += [("flat", d + 1 * H)] * 2 + [("flat", d + 2 * H)] * 2
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": [r[0] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_type_hour_entropy_parts(str(tmp_path)).to_pandas()
    got = {r.event_type: (r.n_events, r.n_active_hours, r.sum_sq)
           for r in out.itertuples()}
    assert got == {"burst": (4, 1, 16), "flat": (4, 2, 8)}


def test_lineitem_discount_bands(tmp_path):
    """Band pins: the giveback is the integer price-cents ×
    discount-cents product (Q6 discipline), and band 0 gives back
    nothing."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_lineitem_discount_bands,
    )

    t = pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_partkey": pa.array([1] * 3, pa.int64()),
        "l_suppkey": pa.array([1] * 3, pa.int64()),
        "l_linenumber": pa.array([1, 1, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 3),
        "l_extendedprice": pa.array([100.0, 50.0, 20.0]),
        "l_discount": pa.array([0.05, 0.05, 0.0]),
        "l_tax": pa.array([0.0] * 3),
        "l_returnflag": ["N"] * 3,
        "l_linestatus": ["O"] * 3,
        "l_shipdate": pa.array(
            np.array(["2024-01-01"] * 3, dtype="datetime64[us]")),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = q_lineitem_discount_bands(str(tmp_path)).to_pandas()
    got = {r.band: (r.n_items, r.gross_cents, r.giveback_units)
           for r in out.itertuples()}
    assert got == {5: (2, 15000, 75000), 0: (1, 2000, 0)}


def test_customer_balance_segments(tmp_path):
    """Segment pins: negative balances count separately while the
    cents mass nets them, and segments stay apart."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_customer_balance_segments,
    )

    t = pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": ["a", "b", "c"],
        "c_nationkey": pa.array([0, 0, 0], pa.int64()),
        "c_acctbal": pa.array([10.0, -5.0, 7.5]),
        "c_mktsegment": ["BUILDING", "BUILDING", "AUTOMOBILE"],
    })
    pq.write_table(t, tmp_path / "customer.parquet")
    out = q_customer_balance_segments(str(tmp_path)).to_pandas()
    got = {r.c_mktsegment: (r.n_customers, r.n_negative, r.balance_cents)
           for r in out.itertuples()}
    assert got == {"BUILDING": (2, 1, 500), "AUTOMOBILE": (1, 0, 750)}


def test_events_session_depth_hist(tmp_path):
    """Depth pins: a 2-hour gap is NOT a new session (strictly greater
    splits), depth ≥ 10 clamps into bucket 10, and single-event
    sessions land in bucket 1 (the bounce numerator)."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_session_depth_hist,
    )

    d = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    M = np.timedelta64(1, "m")
    rows = [(1, d), (1, d + 2 * H),              # exactly 2 h → same
            (1, d + 5 * H)]                      # > 2 h gap → new (1)
    rows += [(2, d + k * M) for k in range(11)]  # 11 events → bucket 10
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_session_depth_hist(str(tmp_path)).to_pandas()
    got = {r.depth_bucket: (r.n_sessions, r.sum_events)
           for r in out.itertuples()}
    assert got == {2: (1, 2), 1: (1, 1), 10: (1, 11)}


def test_lineitem_return_rate_by_month(tmp_path):
    """Return-rate pins: only flag 'R' counts as returned, cents
    attach only to returned lines, and the month key is
    year*100+month."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_lineitem_return_rate_by_month,
    )

    t = pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_partkey": pa.array([1] * 3, pa.int64()),
        "l_suppkey": pa.array([1] * 3, pa.int64()),
        "l_linenumber": pa.array([1, 1, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 3),
        "l_extendedprice": pa.array([100.0, 50.0, 25.0]),
        "l_discount": pa.array([0.0] * 3),
        "l_tax": pa.array([0.0] * 3),
        "l_returnflag": ["R", "N", "R"],
        "l_linestatus": ["O"] * 3,
        "l_shipdate": pa.array(np.array(
            ["2024-03-05", "2024-03-20", "2024-04-01"],
            dtype="datetime64[us]")),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = q_lineitem_return_rate_by_month(str(tmp_path)).to_pandas()
    got = {r.ship_month: (r.n_items, r.n_returned, r.returned_cents)
           for r in out.itertuples()}
    assert got == {202403: (2, 1, 10000), 202404: (1, 1, 2500)}


def test_motion_stats_single_and_multi_frame():
    """Motion pins: a single-frame video reads zero motion, total and
    max come from exact per-transition L1 sums."""
    from opentelemetry_collector_contrib_ray.stages.codecs import encode_rawv
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        motion_stats,
    )

    # 3 frames of 1x1x3: [0,0,0] → [10,0,0] (L1 10) → [10,5,0] (L1 5)
    fr = np.array([[[[0, 0, 0]]], [[[10, 0, 0]]], [[[10, 5, 0]]]],
                  np.uint8)
    single = np.array([[[[7, 7, 7]]]], np.uint8)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_rawv(fr), encode_rawv(single)],
                            pa.large_binary()),
    })
    out = motion_stats(t).to_pandas().set_index("media_id")
    assert out.loc[1].tolist() == [3, 15, 10]
    assert out.loc[2].tolist() == [1, 0, 0]


def test_docs_shouting_screen_strict(tmp_path):
    """Shouting pins: the rule is STRICTLY more upper than lower
    (a tie is not shouting), digits/symbols don't count either way,
    and languages stay apart."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_shouting_screen,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["HELLO world!!",   # 5 up vs 5 lo → tie → not shouting
                 "LOUD TEXT x",     # 8 vs 1 → shouting
                 "quiet 123",       # 0 vs 5 → no
                 "A"],              # 1 vs 0 → shouting
        "lang": ["en", "en", "en", "de"],
        "source": ["s"] * 4,
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_docs_shouting_screen(str(tmp_path)).to_pandas()
    got = {r.lang: (r.n_docs, r.n_shouting) for r in out.itertuples()}
    assert got == {"en": (3, 1), "de": (1, 1)}


def test_orders_ship_sla_by_priority(tmp_path):
    """SLA pins: the lag is to the FIRST (min) shipment, the boundary
    day 7 counts as within, and orders without lineitems are out of
    scope."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_orders_ship_sla_by_priority,
    )

    od = np.datetime64("2024-01-01", "us")
    D = np.timedelta64(1, "D")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([1] * 3, pa.int64()),
        "l_suppkey": pa.array([1] * 3, pa.int64()),
        "l_linenumber": pa.array([1, 2, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 3),
        "l_extendedprice": pa.array([1.0] * 3),
        "l_discount": pa.array([0.0] * 3),
        "l_tax": pa.array([0.0] * 3),
        "l_returnflag": ["N"] * 3,
        "l_linestatus": ["O"] * 3,
        # order 1 ships day 10 then day 7 → min = 7 → within
        # order 2 ships day 8 → outside
        "l_shipdate": pa.array([od + 10 * D, od + 7 * D, od + 8 * D]),
    }), tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1] * 3, pa.int64()),
        "o_orderstatus": ["O"] * 3,
        "o_totalprice": pa.array([1.0] * 3),
        "o_orderdate": pa.array([od, od, od]),
        "o_orderpriority": ["1-URGENT", "1-URGENT", "5-LOW"],
    }), tmp_path / "orders.parquet")
    out = q_orders_ship_sla_by_priority(str(tmp_path)).to_pandas()
    got = {r.o_orderpriority: (r.n_orders, r.n_within_7d, r.sum_lag_days)
           for r in out.itertuples()}
    assert got == {"1-URGENT": (2, 1, 15)}


def test_emb_quant_norm_hist_buckets(tmp_path):
    """Norm-hist pins: bucket is the exact integer MSB of Σ cents²
    (s = 2^k lands in bucket k, s = 2^k − 1 in k−1), and the zero
    vector reads bucket −1."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_emb_quant_norm_hist,
    )

    # cents are value·10⁴: [0.0016, 0] → cents [16, 0] → s=256 → b 8
    # [0.0001]*3 + pad0 → s=3 → bucket 1;  zero vector → -1
    vecs = [[0.0016, 0.0], [0.0001, 0.0001], [0.0, 0.0]]
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32()),
    }), tmp_path / "embeddings.parquet")
    out = q_emb_quant_norm_hist(str(tmp_path)).to_pandas()
    got = {(r.label, r.bucket): (r.n_vecs, r.sum_s)
           for r in out.itertuples()}
    assert got == {(0, 8): (1, 256), (0, 1): (1, 2), (1, -1): (1, 0)}


def test_conv_episode_count_hist():
    """Episode pins: exactly 2 h is the SAME episode (strictly greater
    splits), each conversation counts once at its episode count, and
    single-turn conversations read one episode."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    d = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    rows = [("a", d), ("a", d + 2 * H),        # same episode (== 2 h)
            ("a", d + 10 * H),                 # new → 2 episodes
            ("b", d),                          # 1 episode
            ("c", d), ("c", d + 3 * H), ("c", d + 9 * H)]  # 3 episodes
    df = pd.DataFrame({
        "conv_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "role": ["user"] * len(rows),
        "text": [""] * len(rows),
        "tool": [""] * len(rows),
        "ts": [r[1] for r in rows],
    })
    ds = rd.from_pandas(df).repartition(3)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_episode_count_hist("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {r.episode_bucket: (r.n_convs, r.sum_episodes)
           for r in out.itertuples()}
    assert got == {2: (1, 2), 1: (1, 1), 3: (1, 3)}


def test_part_type_price_stats(tmp_path):
    """Price-census pins: min/max survive cross-block folding and
    cents round half-up."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_part_type_price_stats,
    )

    t = pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": ["a", "b", "c"],
        "p_brand": ["B"] * 3,
        "p_type": ["STEEL", "STEEL", "BRASS"],
        "p_size": pa.array([1, 2, 3], pa.int32()),
        "p_retailprice": pa.array([10.005, 20.0, 5.5]),
    })
    pq.write_table(t, tmp_path / "part.parquet")
    out = (q_part_type_price_stats(str(tmp_path)).to_pandas()
           .set_index("p_type"))
    import numpy as _np
    c = int(_np.floor(10.005 * 100 + 0.5))
    assert out.loc["STEEL"].tolist() == [2, c, 2000, c + 2000]
    assert out.loc["BRASS"].tolist() == [1, 550, 550, 550]


def test_conv_role_mix_by_depth():
    """Depth-mix pins: turn 9 is decade 0's last slot, turn 10 opens
    decade 1, and turn 95+ clamps into decade 9."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    n = 100
    df = pd.DataFrame({
        "conv_id": ["a"] * n,
        "event_id": list(range(n)),
        "role": ["user" if i % 2 == 0 else "assistant"
                 for i in range(n)],
        "text": [""] * n,
        "tool": [""] * n,
        "ts": [base + i * S for i in range(n)],
    })
    ds = rd.from_pandas(df).repartition(3)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = real  # with_turn_idx path needed
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: (
            real_rank(ds) if with_turn_idx else ds)

        def real_rank(d):
            # emulate the rail's turn_idx: rank by (ts, event_id)
            pdf = d.to_pandas().sort_values(["conv_id", "ts", "event_id"])
            pdf["turn_idx"] = pdf.groupby("conv_id").cumcount() \
                .astype("int32")
            return rd.from_pandas(pdf).repartition(3)

        out = Q.q_conv_role_mix_by_depth("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {(r.depth_decade, r.role): r.n_turns for r in out.itertuples()}
    # decades 0..8 hold 10 turns each (5 user / 5 assistant); decade 9
    # holds turns 90..99 → also 5/5
    assert got[(0, "user")] == 5 and got[(0, "assistant")] == 5
    assert got[(9, "user")] == 5 and got[(9, "assistant")] == 5
    assert sum(got.values()) == 100


def test_supplier_nation_census(tmp_path):
    """Census pins: the nation NAME attaches via the dim join, and
    negative balances count separately while cents net."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_supplier_nation_census,
    )

    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": ["x", "y", "z"],
        "s_nationkey": pa.array([0, 0, 1], pa.int64()),
        "s_acctbal": pa.array([10.0, -2.5, 4.0]),
    }), tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": ["FRANCE", "KENYA"],
        "n_regionkey": pa.array([0, 1], pa.int64()),
    }), tmp_path / "nation.parquet")
    out = q_supplier_nation_census(str(tmp_path)).to_pandas()
    got = {r.n_name: (r.n_suppliers, r.n_negative, r.balance_cents)
           for r in out.itertuples()}
    assert got == {"FRANCE": (2, 1, 750), "KENYA": (1, 0, 400)}


def test_events_first_event_census(tmp_path):
    """First-touch pins: the first event is the (ts, event_id)-min (a
    same-ts tie resolves to the LOWER event_id), and event counts sum
    across blocks."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_first_event_census,
    )

    d = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    rows = [  # (eid, user, type, ts)
        (5, 1, "view", d), (6, 1, "purchase", d + S),   # first = view
        (2, 2, "purchase", d), (3, 2, "view", d),        # tie → eid 2
        (9, 3, "signup", d + 9 * S),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[3] for r in rows]),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": [r[2] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_first_event_census(str(tmp_path)).to_pandas()
    got = {r.first_type: (r.n_users, r.sum_events)
           for r in out.itertuples()}
    assert got == {"view": (1, 2), "purchase": (1, 2), "signup": (1, 1)}


def test_orders_status_month_mix(tmp_path):
    """Status-mix pins: months separate, statuses separate, cents
    exact."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_orders_status_month_mix,
    )

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1] * 3, pa.int64()),
        "o_orderstatus": ["O", "F", "O"],
        "o_totalprice": pa.array([10.0, 20.0, 40.0]),
        "o_orderdate": pa.array(np.array(
            ["2024-02-01", "2024-02-10", "2024-03-01"],
            dtype="datetime64[us]")),
        "o_orderpriority": ["1-URGENT"] * 3,
    }), tmp_path / "orders.parquet")
    out = q_orders_status_month_mix(str(tmp_path)).to_pandas()
    got = {(r.order_month, r.o_orderstatus): (r.n_orders, r.revenue_cents)
           for r in out.itertuples()}
    assert got == {(202402, "O"): (1, 1000), (202402, "F"): (1, 2000),
                   (202403, "O"): (1, 4000)}


def test_conv_tool_next_role():
    """Handback pins: the next turn must be in the SAME conversation
    (a conversation-final tool call reads 'none', the first turn of
    the next conversation never pairs), and non-tool turns don't
    count as calls."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "b", "b"],
        "event_id": [1, 2, 3, 4, 5],
        "role": ["tool", "assistant", "tool", "user", "tool"],
        "text": [""] * 5,
        "tool": ["browser", "", "db_query", "", "browser"],
        # a: browser→assistant, db_query conv-final → none
        # b: user turn (no tool), browser conv-final → none
        "ts": [base, base + S, base + 2 * S, base, base + S],
    })
    ds = rd.from_pandas(df).repartition(2)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_tool_next_role("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {(r.tool, r.next_role): r.n_calls for r in out.itertuples()}
    assert got == {("browser", "assistant"): 1, ("db_query", "none"): 1,
                   ("browser", "none"): 1}


def test_audio_clip_stats_threshold():
    """Clipping pins through the REAL encode→decode path: a 0.995 FS
    sample (encoder quantizes at ·32767) exceeds the 32440 clip
    threshold, a 0.5 FS sample does not, and the recovered |i16| peak
    is exact."""
    from opentelemetry_collector_contrib_ray.stages.codecs import encode_wav
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        AudioDecoder,
    )

    w1 = np.array([0.995, -0.5, 0.1], np.float64)
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media_type": ["audio/wav"],
        "payload": pa.array([encode_wav(w1, 8000)], pa.large_binary()),
        "meta.width": pa.array([0], pa.int32()),
        "meta.height": pa.array([0], pa.int32()),
        "meta.sample_rate": pa.array([8000], pa.int32()),
        "meta.duration_ms": pa.array([1], pa.int32()),
    })
    dec = AudioDecoder()(t)
    col = dec["waveform"]
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    i16 = np.abs(np.round(np.asarray(c.flatten(), np.float64)
                          * 32768.0)).astype(np.int64)
    expect = [int(round(abs(v) * 32767)) for v in w1]
    assert i16.tolist() == expect
    assert (i16 >= 32440).sum() == 1      # only the 0.995 sample clips
    assert i16.max() == expect[0]


def test_events_active_days_hist(tmp_path):
    """Active-days pins: same-day repeats collapse, the bucket clamps
    at 19, and gaps don't matter (total, not consecutive)."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_active_days_hist,
    )

    d0 = np.datetime64("2024-01-01T06:00:00", "us")
    D = np.timedelta64(1, "D")
    H = np.timedelta64(1, "h")
    rows = [(1, d0), (1, d0 + H), (1, d0 + 5 * D)]    # 2 active days
    rows += [(2, d0 + k * 2 * D) for k in range(25)]  # 25 days → 19
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_active_days_hist(str(tmp_path)).to_pandas()
    got = {r.days_bucket: (r.n_users, r.sum_days)
           for r in out.itertuples()}
    assert got == {2: (1, 2), 19: (1, 25)}


def test_docs_junk_census(tmp_path):
    """Junk-census pins: empty and whitespace-only are disjoint
    classes, short counts chars not bytes, and the char mass is
    exact."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_junk_census,
    )

    texts = ["", "  \t\n", "short one", "é" * 25]
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": texts,
        "lang": ["en"] * 4,
        "source": ["s"] * 4,
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_docs_junk_census(str(tmp_path)).to_pandas()
    assert out.iloc[0].tolist() == [4, 1, 1, 3, 0 + 4 + 9 + 25]


def test_events_resurrection_census(tmp_path):
    """Resurrection pins: the gap is BETWEEN active days (adjacent
    days gap 0), the max gap wins, single-day users read gap 0, and
    the bucket is week-decades clamped at 9."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_resurrection_census,
    )

    d0 = np.datetime64("2024-01-01T06:00:00", "us")
    D = np.timedelta64(1, "D")
    rows = [(1, d0), (1, d0 + 1 * D), (1, d0 + 10 * D)]  # max gap 8 → b1
    rows += [(2, d0)]                                    # gap 0 → b0
    rows += [(3, d0), (3, d0 + 100 * D)]                 # 99 → b9
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_resurrection_census(str(tmp_path)).to_pandas()
    got = {r.gap_bucket: (r.n_users, r.sum_gap_days)
           for r in out.itertuples()}
    assert got == {1: (1, 8), 0: (1, 0), 9: (1, 99)}


def test_docs_source_lang_matrix(tmp_path):
    """Matrix pins: cells separate on both keys and char mass counts
    characters."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_source_lang_matrix,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["abc", "dé", "xyzzy"],
        "lang": ["en", "fr", "en"],
        "source": ["web", "web", "books"],
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_docs_source_lang_matrix(str(tmp_path)).to_pandas()
    got = {(r.source, r.lang): (r.n_docs, r.sum_chars)
           for r in out.itertuples()}
    assert got == {("web", "en"): (1, 3), ("web", "fr"): (1, 2),
                   ("books", "en"): (1, 5)}


def test_events_daily_volatility_parts(tmp_path):
    """Volatility pins: an absent day is a BOUNDARY (its delta is 0,
    not a spike to/from zero), and sum/max read exact |Δ|."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_daily_volatility_parts,
    )

    d0 = np.datetime64("2024-01-01T00:00:00", "us")
    D = np.timedelta64(1, "D")
    rows = []
    # type a: days 0,1,2 counts 2,5,1 → deltas 3,4 → sum 7 max 4
    for day, cnt in [(0, 2), (1, 5), (2, 1)]:
        rows += [("a", d0 + day * D)] * cnt
    # type b: days 0 and 5 (gap) counts 4,9 → no adjacent pair → 0
    for day, cnt in [(0, 4), (5, 9)]:
        rows += [("b", d0 + day * D)] * cnt
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": [r[0] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_daily_volatility_parts(str(tmp_path)).to_pandas()
    got = {r.event_type: (r.n_days, r.sum_abs_delta, r.max_abs_delta)
           for r in out.itertuples()}
    assert got == {"a": (3, 7, 4), "b": (2, 0, 0)}


def test_multimodal_image_aspect_census():
    """Aspect pins over the real media table: bands clamp to
    [25, 400], every image lands exactly once, and pixel mass is
    exact."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_multimodal_image_aspect_census,
    )
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        ensure_mm_oracle_tables,
    )

    d = ensure_mm_oracle_tables()
    out = q_multimodal_image_aspect_census("unused").to_pandas()
    meta = pq.read_table(f"{d}/media.parquet",
                         columns=["meta.width", "meta.height"])
    w = meta["meta.width"].to_numpy().astype(np.int64)
    h = meta["meta.height"].to_numpy().astype(np.int64)
    assert out["n_images"].sum() == len(w)
    assert out["sum_pixels"].sum() == int((w * h).sum())
    assert out["aspect_band"].between(25, 400).all()
    band = np.clip(100 * w // np.maximum(h, 1), 25, 400)
    import collections
    exp = collections.Counter(band.tolist())
    got = dict(zip(out["aspect_band"], out["n_images"]))
    assert got == dict(exp)


def test_logs_template_conv_spread():
    """Spread pins: distinct-conversation counts collapse repeats
    within a conversation while line counts keep them, and digit
    masking unifies variable text."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "conv_id": ["a", "a", "b", "c"],
        "event_id": [1, 2, 3, 4],
        "role": ["user"] * 4,
        # 'lat=5 ok' and 'lat=77 ok' mask to the same template
        "text": ["lat=5 ok", "lat=77 ok", "lat=9 ok", "hello"],
        "tool": [""] * 4,
        "ts": [base] * 4,
    })
    ds = rd.from_pandas(df).repartition(2)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_logs_template_conv_spread("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {r.template: (r.n_convs, r.n_lines) for r in out.itertuples()}
    assert got == {"lat=# ok": (2, 3), "hello": (1, 1)}


def test_orders_cadence_hist(tmp_path):
    """Cadence pins: single-order customers are out of scope, the
    lower median picks the ⌈n/2⌉-th smallest gap (gaps [7, 100] →
    7), and buckets are week-decades."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_orders_cadence_hist,
    )

    d0 = np.datetime64("2024-01-01", "us")
    D = np.timedelta64(1, "D")
    rows = [(1, d0), (1, d0 + 7 * D), (1, d0 + 107 * D),  # gaps 7,100 → med 7 → b1
            (2, d0),                                       # single → out
            (3, d0), (3, d0 + 70 * D)]                     # gap 70 → b9? 70//7=10→9
    t = pa.table({
        "o_orderkey": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderstatus": ["O"] * len(rows),
        "o_totalprice": pa.array([1.0] * len(rows)),
        "o_orderdate": pa.array([r[1] for r in rows]),
        "o_orderpriority": ["1-URGENT"] * len(rows),
    })
    pq.write_table(t, tmp_path / "orders.parquet")
    out = q_orders_cadence_hist(str(tmp_path)).to_pandas()
    got = {r.cadence_bucket: (r.n_customers, r.sum_median_gap)
           for r in out.itertuples()}
    assert got == {1: (1, 7), 9: (1, 70)}


def test_conv_tool_diversity_hist():
    """Diversity pins: pure-chat conversations count in bucket 0,
    repeated use of one tool is still diversity 1, and ≥5 clamps."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [("a", ""), ("a", ""),                      # 0 tools
            ("b", "browser"), ("b", "browser"),        # 1
            ("c", "browser"), ("c", "db_query"),       # 2
            ("d", "t1"), ("d", "t2"), ("d", "t3"),
            ("d", "t4"), ("d", "t5"), ("d", "t6")]     # 6 → bucket 5
    df = pd.DataFrame({
        "conv_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "role": ["user"] * len(rows),
        "text": [""] * len(rows),
        "tool": [r[1] for r in rows],
        "ts": [base] * len(rows),
    })
    ds = rd.from_pandas(df).repartition(3)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_tool_diversity_hist("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {r.tool_bucket: (r.n_convs, r.sum_tools)
           for r in out.itertuples()}
    assert got == {0: (1, 0), 1: (1, 1), 2: (1, 2), 5: (1, 6)}


def test_events_user_type_concentration_hist(tmp_path):
    """Concentration pins: a single-type user reads 100% (bucket 9 by
    the 10-decade clamp), a perfect 2-way split reads 50% (bucket 5),
    and the ratio is the exact integer floor."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_user_type_concentration_hist,
    )

    d = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [(1, "view")] * 4                    # 100 → bucket 9
    rows += [(2, "view")] * 2 + [(2, "click")] * 2   # 50 → bucket 5
    rows += [(3, "view"), (3, "click"), (3, "error")]  # 3/9→33 → b3
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([d] * len(rows)),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": [r[1] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_user_type_concentration_hist(str(tmp_path)).to_pandas()
    got = {r.conc_bucket: (r.n_users, r.sum_pct)
           for r in out.itertuples()}
    assert got == {9: (1, 100), 5: (1, 50), 3: (1, 33)}


def test_docs_word_len_bands(tmp_path):
    """Band pins: tokens are maximal non-ws runs (leading/trailing and
    repeated whitespace add nothing), the band is the integer floor
    mean, and tokenless docs are out of scope."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_word_len_bands,
    )

    texts = ["  ab   cd  ",      # 2 tokens, 4 chars → band 2
             "abcdefgh",         # 1 token, 8 → band 8
             "a bb ccc",         # 3 tokens, 6 chars → 2
             " \t\n",            # tokenless → out
             "x" * 100]          # band 100 → clamp 19
    t = pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_docs_word_len_bands(str(tmp_path)).to_pandas()
    got = {r.band: (r.n_docs, r.sum_tokens) for r in out.itertuples()}
    assert got == {2: (2, 5), 8: (1, 1), 19: (1, 1)}


def test_emb_exact_dup_census(tmp_path):
    """Dup-census pins: equality is on the FULL quantized vector (a
    1e-4-scale difference that survives quantization splits the
    group), k copies contribute k−1 extras, and floats that quantize
    equal collapse."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_emb_exact_dup_census,
    )

    vecs = [[0.5, 1.0], [0.5, 1.0], [0.5, 1.0],   # triple → 2 extra
            [0.5, 1.1],                            # differs → clean
            [0.25, 0.0], [0.25000002, 0.0]]        # quantize equal → pair
    t = pa.table({
        "vec_id": pa.array(list(range(1, len(vecs) + 1)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = q_emb_exact_dup_census(str(tmp_path)).to_pandas()
    assert out.iloc[0].tolist() == [2, 3, 3]


def test_conv_verbosity_amplification_hist():
    """Amplification pins: the percent is the integer floor of
    100·a//u, no-user-chars conversations are out of scope, and
    sums survive conversation splits across blocks."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [  # (conv, role, text)
        ("a", "user", "xxxx"), ("a", "assistant", "y" * 10),  # 250 → b5
        ("b", "user", "xx"), ("b", "assistant", "y"),         # 50 → b1
        ("c", "assistant", "zzz"),                            # u=0 → out
        ("d", "user", "x" * 100), ("d", "assistant", ""),     # 0 → b0
    ]
    df = pd.DataFrame({
        "conv_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "role": [r[1] for r in rows],
        "text": [r[2] for r in rows],
        "tool": [""] * len(rows),
        "ts": [base] * len(rows),
    })
    ds = rd.from_pandas(df).repartition(3)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_verbosity_amplification_hist("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {r.amp_bucket: (r.n_convs, r.sum_pct) for r in out.itertuples()}
    assert got == {5: (1, 250), 1: (1, 50), 0: (1, 0)}


def test_part_size_price_moments(tmp_path):
    """Moment pins: all six sums are exact integers over the cents
    transform."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_part_size_price_moments,
    )

    t = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": ["a", "b"],
        "p_brand": ["B"] * 2,
        "p_type": ["STEEL"] * 2,
        "p_size": pa.array([2, 5], pa.int32()),
        "p_retailprice": pa.array([10.0, 20.0]),
    })
    pq.write_table(t, tmp_path / "part.parquet")
    out = q_part_size_price_moments(str(tmp_path)).to_pandas()
    assert out.iloc[0].tolist() == [2, 7, 3000, 29, 5_000_000,
                                    2 * 1000 + 5 * 2000]


def test_events_mau_series(tmp_path):
    """MAU pins: a user active in two months counts in both, repeats
    within a month collapse, and event counts stay raw."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_mau_series,
    )

    rows = [(1, "2024-01-05"), (1, "2024-01-20"), (1, "2024-02-01"),
            (2, "2024-01-31"), (3, "2024-02-15")]
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_mau_series(str(tmp_path)).to_pandas()
    got = {r.month: (r.n_active_users, r.n_events)
           for r in out.itertuples()}
    assert got == {202401: (2, 3), 202402: (2, 2)}


def test_conv_user_monologue_hist():
    """Monologue pins: runs break at conversation edges and at any
    non-user turn, a conversation with no user turns reads run 0, and
    ≥5 clamps."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    rows = [  # (conv, role)
        ("a", "user"), ("a", "user"), ("a", "assistant"), ("a", "user"),
        # a: runs 2 then 1 → max 2
        ("b", "assistant"), ("b", "tool"),       # b: 0
        ("c", "user")] + [("d", "user")] * 7     # c: 1; d: 7 → clamp 5
    df = pd.DataFrame({
        "conv_id": [r[0] for r in rows],
        "event_id": list(range(len(rows))),
        "role": [r[1] for r in rows],
        "text": [""] * len(rows),
        "tool": [""] * len(rows),
        "ts": [base + i * S for i in range(len(rows))],
    })
    ds = rd.from_pandas(df).repartition(3)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_user_monologue_hist("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    got = {r.run_bucket: (r.n_convs, r.sum_max_run)
           for r in out.itertuples()}
    assert got == {2: (1, 2), 0: (1, 0), 1: (1, 1), 5: (1, 7)}


def test_multimodal_store_census():
    """Store-census pins over the real oracle tables: per-type object
    counts and byte masses equal a direct metadata recompute."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_multimodal_store_census,
    )
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        ensure_mm_oracle_tables,
    )

    d = ensure_mm_oracle_tables()
    out = (q_multimodal_store_census("unused").to_pandas()
           .set_index("media_type").sort_index())
    import collections
    exp = collections.defaultdict(list)
    for tbl in ("media", "audio", "video"):
        t = pq.read_table(f"{d}/{tbl}.parquet",
                          columns=["media_type", "payload"])
        for mt, p in zip(t["media_type"].to_pylist(),
                         t["payload"].to_pylist()):
            exp[mt].append(len(p))
    for mt, sizes in exp.items():
        row = out.loc[mt]
        assert row["n_objects"] == len(sizes)
        assert row["sum_bytes"] == sum(sizes)
        assert row["min_bytes"] == min(sizes)
        assert row["max_bytes"] == max(sizes)


def test_customer_region_census(tmp_path):
    """Region pins: the two-level dim resolution maps customer →
    nation → region, and negatives net in cents."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_customer_region_census,
    )

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": ["a", "b", "c"],
        "c_nationkey": pa.array([0, 1, 2], pa.int64()),
        "c_acctbal": pa.array([10.0, -4.0, 6.0]),
        "c_mktsegment": ["BUILDING"] * 3,
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": ["FRANCE", "GERMANY", "KENYA"],
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": ["EUROPE", "AFRICA"],
    }), tmp_path / "region.parquet")
    out = q_customer_region_census(str(tmp_path)).to_pandas()
    got = {r.r_name: (r.n_customers, r.n_negative, r.balance_cents)
           for r in out.itertuples()}
    assert got == {"EUROPE": (2, 1, 600), "AFRICA": (1, 0, 600)}


def test_lineitem_tax_discount_matrix(tmp_path):
    """Matrix pins: cells separate on both bands and gross cents are
    exact."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_lineitem_tax_discount_matrix,
    )

    t = pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_partkey": pa.array([1] * 3, pa.int64()),
        "l_suppkey": pa.array([1] * 3, pa.int64()),
        "l_linenumber": pa.array([1, 1, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 3),
        "l_extendedprice": pa.array([100.0, 50.0, 20.0]),
        "l_discount": pa.array([0.05, 0.05, 0.0]),
        "l_tax": pa.array([0.02, 0.08, 0.02]),
        "l_returnflag": ["N"] * 3,
        "l_linestatus": ["O"] * 3,
        "l_shipdate": pa.array(np.array(["2024-01-01"] * 3,
                                        dtype="datetime64[us]")),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = q_lineitem_tax_discount_matrix(str(tmp_path)).to_pandas()
    got = {(r.tax_band, r.disc_band): (r.n_items, r.gross_cents)
           for r in out.itertuples()}
    assert got == {(2, 5): (1, 10000), (8, 5): (1, 5000),
                   (2, 0): (1, 2000)}


def test_events_ts_precision_and_id_continuity(tmp_path):
    """Audit pins: minute-aligned implies second-aligned, a 500 ms
    timestamp is neither, and the id panel reads exact count/min/max
    across blocks."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_id_continuity_audit,
        q_events_ts_precision_audit,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    MS = np.timedelta64(1, "ms")
    S = np.timedelta64(1, "s")
    rows = [(7, base),              # minute+second aligned
            (3, base + 30 * S),     # second aligned only
            (9, base + 500 * MS)]   # neither
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": ["view"] * 3,
        "value": [1.0] * 3,
        "props": ["{}"] * 3,
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_ts_precision_audit(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert [r.n_events, r.n_sec_aligned, r.n_min_aligned] == [3, 2, 1]
    out2 = q_events_id_continuity_audit(str(tmp_path)).to_pandas()
    assert out2.iloc[0].tolist() == [3, 3, 9]


def test_events_intersession_gap_hist(tmp_path):
    """Gap pins: the gap runs END→next START (in-session time never
    counts), single-session users contribute nothing, and ≥9-day
    gaps clamp."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_intersession_gap_hist,
    )

    d0 = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    D = np.timedelta64(1, "D")
    rows = [(1, d0), (1, d0 + 1 * H),          # session 1 (ends +1h)
            (1, d0 + 1 * H + 26 * H),          # gap 26h → bucket 1
            (2, d0),                           # single session → none
            (3, d0), (3, d0 + 100 * D)]        # gap ~100d → bucket 9
    t = pa.table({
        "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_intersession_gap_hist(str(tmp_path)).to_pandas()
    got = {r.gap_bucket: (r.n_gaps, r.sum_gap_seconds)
           for r in out.itertuples()}
    assert got == {1: (1, 26 * 3600), 9: (1, 100 * 86400)}


def test_conv_tool_latency_slo():
    """SLO pins: the 10 s boundary is inclusive, conversation-final
    calls are excluded, and 60 s catches what 10 s misses."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "a", "a", "a", "b"],
        "turn_idx": [0, 1, 2, 3, 4, 5, 0],
        "tool": ["browser", "", "browser", "", "browser", "", "browser"],
        "text": [""] * 7,
        "role": ["tool", "assistant"] * 3 + ["tool"],
        # gaps: 10 s (inclusive → in10), 30 s (in60 only), 120 s
        # (neither); conv-final b call excluded
        "ts": [base, base + 10 * S,
               base + 100 * S, base + 130 * S,
               base + 200 * S, base + 320 * S,
               base],
    })
    ds = rd.from_pandas(df).repartition(2)
    real = Q.transcripts_from_events
    try:
        Q.transcripts_from_events = lambda sf, with_turn_idx=True: ds
        out = Q.q_conv_tool_latency_slo("unused").to_pandas()
    finally:
        Q.transcripts_from_events = real
    r = out.set_index("tool").loc["browser"]
    assert [r.n_pairs, r.n_within_10s, r.n_within_60s] == [3, 1, 2]


def test_lineitem_quantity_profile(tmp_path):
    """Quantity pins: quantities group on the rounded integer and
    gross cents sum exactly."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_lineitem_quantity_profile,
    )

    t = pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_partkey": pa.array([1] * 3, pa.int64()),
        "l_suppkey": pa.array([1] * 3, pa.int64()),
        "l_linenumber": pa.array([1, 1, 1], pa.int32()),
        "l_quantity": pa.array([2.0, 2.0, 5.0]),
        "l_extendedprice": pa.array([10.0, 30.0, 7.0]),
        "l_discount": pa.array([0.0] * 3),
        "l_tax": pa.array([0.0] * 3),
        "l_returnflag": ["N"] * 3,
        "l_linestatus": ["O"] * 3,
        "l_shipdate": pa.array(np.array(["2024-01-01"] * 3,
                                        dtype="datetime64[us]")),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = q_lineitem_quantity_profile(str(tmp_path)).to_pandas()
    got = {r.quantity: (r.n_items, r.gross_cents)
           for r in out.itertuples()}
    assert got == {2: (2, 4000), 5: (1, 700)}


def test_docs_length_gini_and_error_dow(tmp_path):
    """Gini pins: ranks ascend over (len, doc_id) so equal lengths
    tie-break deterministically; error-dow pins: only 'error' rows
    count and the shared dow formula applies."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_length_gini_parts,
        q_events_error_rate_by_dow,
    )

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["aa", "aa", "bbbb"],   # lens 2,2,4 → ranks 1,2,3
        "lang": ["en"] * 3,
        "source": ["s"] * 3,
    }), tmp_path / "documents.parquet")
    out = q_docs_length_gini_parts(str(tmp_path)).to_pandas()
    # Σ rank·len = 1·2 + 2·2 + 3·4 = 18
    assert out.iloc[0].tolist() == [3, 8, 18]

    mon = np.datetime64("2024-01-01T10:00:00", "us")
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([mon, mon, mon]),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": ["error", "view", "error"],
        "value": [1.0] * 3,
        "props": ["{}"] * 3,
    }), tmp_path / "events.parquet")
    out2 = q_events_error_rate_by_dow(str(tmp_path)).to_pandas()
    got = {r.dow: (r.n_events, r.n_errors) for r in out2.itertuples()}
    assert got == {1: (3, 2)}


def test_docs_dup_rate_by_source(tmp_path):
    """Dup-rate pins: a cross-source mirror counts against BOTH
    sources, within-source repeats all count, and unique docs
    don't."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_dup_rate_by_source,
    )

    texts_sources = [("mirror", "web"), ("mirror", "books"),
                     ("twice", "web"), ("twice", "web"),
                     ("unique", "books")]
    t = pa.table({
        "doc_id": pa.array(list(range(1, len(texts_sources) + 1)),
                           pa.int64()),
        "text": [x[0] for x in texts_sources],
        "lang": ["en"] * len(texts_sources),
        "source": [x[1] for x in texts_sources],
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_docs_dup_rate_by_source(str(tmp_path)).to_pandas()
    got = {r.source: (r.n_docs, r.n_dup_docs) for r in out.itertuples()}
    assert got == {"web": (3, 3), "books": (2, 1)}


def test_orders_priority_segment_matrix(tmp_path):
    """Matrix pins: the segment attaches through the customer dim and
    cells separate on both keys."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_orders_priority_segment_matrix,
    )

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": ["a", "b"],
        "c_nationkey": pa.array([0, 0], pa.int64()),
        "c_acctbal": pa.array([1.0, 1.0]),
        "c_mktsegment": ["BUILDING", "AUTOMOBILE"],
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderstatus": ["O"] * 3,
        "o_totalprice": pa.array([10.0, 20.0, 40.0]),
        "o_orderdate": pa.array(np.array(["2024-01-01"] * 3,
                                         dtype="datetime64[us]")),
        "o_orderpriority": ["1-URGENT", "5-LOW", "1-URGENT"],
    }), tmp_path / "orders.parquet")
    out = q_orders_priority_segment_matrix(str(tmp_path)).to_pandas()
    got = {(r.c_mktsegment, r.o_orderpriority):
           (r.n_orders, r.revenue_cents) for r in out.itertuples()}
    assert got == {("BUILDING", "1-URGENT"): (1, 1000),
                   ("BUILDING", "5-LOW"): (1, 2000),
                   ("AUTOMOBILE", "1-URGENT"): (1, 4000)}

"""Golden tests for the LLM-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from temp_data_pipeline_spark.llm import multimodal, similarity, text
from temp_data_pipeline_spark.llm.dedup import (
    bucket_overflow_stats,
    cap_bucket,
    embedding_neardup_pairs,
    exact_dedup,
    jaccard,
    minhash_dedup,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_neardup_pairs,
)

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), DOC_SCHEMA)


# ------------------------------------------------------------------ text


def test_token_and_char_counts(spark):
    df = docs(spark, ["a b c", "hello world"])
    out = {r.doc_id: r for r in df.select(
        "doc_id",
        text.token_count("text").alias("nt"),
        text.char_count("text").alias("nc"),
        text.avg_token_len("text").alias("av"),
    ).collect()}
    assert out[0].nt == 3 and out[0].nc == 5
    assert out[1].nt == 2 and math.isclose(out[1].av, 5.0)


def test_tokens_regex_bpe_style(spark):
    df = docs(spark, ["hello, world 42!"])
    toks = df.select(text.tokens_regex("text").alias("t")).first()["t"]
    assert toks == ["hello", ",", "world", "42", "!"]


def test_lang_id_markers(spark):
    df = docs(spark, [
        "the cat and the dog is in a box",
        "le chat et la maison est une merveille",
        "der hund und die katze ist ein tier",
        "xyzzy qwerty plugh",
    ])
    out = {r.doc_id: r.lang for r in df.select(
        "doc_id", text.lang_id("text").alias("lang")).collect()}
    assert out[0] == "en" and out[1] == "fr" and out[2] == "de" and out[3] == "und"


def test_quality_score_monotonicity(spark):
    good = "the quick brown fox jumps over the lazy dog " * 5
    spam = "buy buy buy buy buy buy buy buy buy buy " * 5
    df = docs(spark, [good, spam])
    out = {r.doc_id: r.q for r in df.select(
        "doc_id", text.quality_score("text").alias("q")).collect()}
    assert out[0] > out[1]  # diverse text beats repetition


def test_rolling_fingerprint_shift_invariance(spark):
    # identical window content → same min-window fingerprint appears
    a = "one two three four five six seven eight nine ten"
    b = "zzz " + a  # shifted by one token; windows overlap heavily
    df = docs(spark, [a, b])
    fps = [r.fp for r in df.select(
        text.rolling_fingerprint("text", window=4).alias("fp")).collect()]
    assert fps[0] is not None and fps[1] is not None


# ------------------------------------------------------------------ dedup


def test_exact_dedup_keeps_min_id(spark):
    df = docs(spark, ["same text", "other text", "same text"])
    kept = sorted(r.doc_id for r in exact_dedup(df).collect())
    assert kept == [0, 1]


def test_jaccard_and_shingles(spark):
    df = docs(spark, ["a b c d e", "a b c d x"])
    sh = df.select("doc_id", shingles("text", 3).alias("s"))
    a = sh.filter("doc_id = 0").select(F.col("s").alias("_a"))
    b = sh.filter("doc_id = 1").select(F.col("s").alias("_b"))
    j = a.crossJoin(b).select(jaccard(F.col("_a"), F.col("_b")).alias("j")).first()["j"]
    # shingles: {abc,bcd,cde} vs {abc,bcd,cdx}: inter 2, union 4
    assert math.isclose(j, 0.5)


def test_minhash_identical_docs_equal_signatures(spark):
    df = docs(spark, ["w1 w2 w3 w4 w5 w6", "w1 w2 w3 w4 w5 w6", "zz yy xx ww vv uu"])
    sigs = df.select(
        "doc_id", minhash_signature(shingles("text", 2), k=8).alias("s")
    ).collect()
    by_id = {r.doc_id: r.s for r in sigs}
    assert by_id[0] == by_id[1]
    assert by_id[0] != by_id[2]


def test_minhash_dedup_removes_near_duplicate(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " changed"
    other = " ".join(f"zzz{i}" for i in range(40))
    df = docs(spark, [base, near, other])
    kept = sorted(r.doc_id for r in minhash_dedup(df, threshold=0.7, bands=8).collect())
    assert kept == [0, 2]  # near-dup of doc0 dropped, unrelated doc kept


def test_ngram_jaccard_pairs(spark):
    df = docs(spark, ["a b c d e", "a b c d x", "q w e r t"])
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2)], StructType([StructField("id_a", LongType()),
                                      StructField("id_b", LongType())])
    )
    out = {(r.id_a, r.id_b): r.jaccard for r in
           ngram_jaccard_pairs(df, pairs, n=3).collect()}
    assert math.isclose(out[(0, 1)], 0.5)
    assert out[(0, 2)] == 0.0


def test_simhash_close_for_similar_docs(spark):
    base = " ".join(f"tok{i}" for i in range(50))
    near = base + " extra"
    far = " ".join(f"zzz{i}" for i in range(50))
    df = docs(spark, [base, near, far])
    s = {r.doc_id: r.sh for r in df.select(
        "doc_id", simhash("text").alias("sh")).collect()}
    mask = (1 << 64) - 1  # signatures are signed longs; compare as u64
    ham_near = bin((s[0] ^ s[1]) & mask).count("1")
    ham_far = bin((s[0] ^ s[2]) & mask).count("1")
    assert ham_near < ham_far
    assert ham_near <= 6


def test_simhash_neardup_pairs_finds_twin(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    df = docs(spark, [base, base + " x", " ".join(f"q{i}" for i in range(60))])
    pairs = simhash_neardup_pairs(df, max_hamming=5).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}


def test_gopher_flags_golden(spark):
    good = ("the quick brown fox jumps over that lazy dog and we have "
            "fun with it all day long " * 3)  # 51 words, stopwords, alpha
    short = "too few words here"
    symbols = "### " * 30 + "the be of and that have with words " * 7
    df = docs(spark, [good, short, symbols])
    flags = text.gopher_flags("text")
    out = {r.doc_id: r for r in df.select(
        "doc_id", *[flags[k].alias(k) for k in flags]).collect()}
    assert out[0].gopher_pass
    assert not out[1].word_count_ok and not out[1].gopher_pass
    assert not out[2].symbol_ratio_ok and not out[2].gopher_pass


def test_gopher_bullet_and_ellipsis_lines(spark):
    base = "the be of and that have with " + "word " * 50
    bullets = "\n".join(["- item one"] * 9 + [base])  # 90% bullet lines
    dots = "\n".join(["trailing thought..."] * 4 + [base] * 6)  # 40% ellipsis
    df = docs(spark, [bullets, dots])
    flags = text.gopher_flags("text")
    out = {r.doc_id: r for r in df.select(
        "doc_id", *[flags[k].alias(k) for k in flags]).collect()}
    assert out[0].bullet_ok  # exactly at 0.9 boundary → <= passes
    assert not out[1].ellipsis_ok


def test_gopher_filter_keeps_passing_docs(spark):
    good = ("the quick brown fox jumps over that lazy dog and we have "
            "fun with it all day long " * 3)
    df = docs(spark, [good, "tiny"])
    kept = text.gopher_filter(df).collect()
    assert [r.doc_id for r in kept] == [0]


def test_cap_bucket_keeps_lowest_ids_and_reports_overflow(spark):
    rows = [(i, "hot") for i in range(10)] + [(99, "cold")]
    df = spark.createDataFrame(
        rows, StructType([StructField("id", LongType()), StructField("k", StringType())])
    )
    out = cap_bucket(df, ["k"], "id", 3)
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 99]
    ov = bucket_overflow_stats(df, ["k"], 3).collect()
    assert len(ov) == 1 and ov[0].k == "hot" and ov[0].n_dropped == 7
    # cap=None is a no-op
    assert cap_bucket(df, ["k"], "id", None).count() == 11


def test_hot_bucket_cap_bounds_pair_count(spark):
    # 50 identical docs: every simhash chunk bucket holds all 50 rows.
    # Uncapped → C(50,2)=1225 pairs; cap=5 keeps ids 0-4 per bucket →
    # exactly C(5,2)=10 pairs, same lowest-id representative.
    df = docs(spark, ["same boilerplate banner text"] * 50)
    assert simhash_neardup_pairs(df, max_bucket=None).count() == 1225
    capped = simhash_neardup_pairs(df, max_bucket=5)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(a, b) for a in range(5) for b in range(5) if a < b}


def test_cap_does_not_change_normal_corpus_results(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    df = docs(spark, [base, base + " x", " ".join(f"q{i}" for i in range(60))])
    with_cap = {(r.id_a, r.id_b) for r in simhash_neardup_pairs(df, max_hamming=5).collect()}
    no_cap = {(r.id_a, r.id_b)
              for r in simhash_neardup_pairs(df, max_hamming=5, max_bucket=None).collect()}
    assert with_cap == no_cap == {(0, 1)}


# ------------------------------------------------------------- similarity

EMB_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
)


def emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], EMB_SCHEMA
    )


def test_cosine_topk_exact(spark):
    vecs = [[1, 0, 0], [0.9, 0.1, 0], [0, 1, 0], [-1, 0, 0]]
    df = emb_df(spark, vecs)
    out = similarity.cosine_topk(df, [1.0, 0.0, 0.0], k=2).collect()
    assert [r.vec_id for r in out] == [0, 1]
    assert math.isclose(out[0].cosine, 1.0)


def test_ann_lsh_topk_contains_true_neighbor(spark):
    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(16)]
    near = [x + rng.gauss(0, 0.01) for x in base]
    vecs = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(50)]
    vecs[7] = near
    df = emb_df(spark, vecs)
    out = similarity.ann_lsh_topk(df, base, k=5, nbits=8, bands=4)
    assert 7 in [r.vec_id for r in out.collect()]


def test_ivf_topk_contains_true_neighbor(spark):
    import random

    rng = random.Random(11)
    base = [rng.gauss(0, 1) for _ in range(8)]
    vecs = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(60)]
    vecs[13] = [x * 1.01 for x in base]
    df = emb_df(spark, vecs)
    out = similarity.ivf_topk(df, base, k=5, n_centroids=4, nprobe=2, sample_size=60)
    assert 13 in [r.vec_id for r in out.collect()]


def test_pq_topk_contains_true_neighbor(spark):
    import random

    rng = random.Random(17)
    base = [rng.gauss(0, 1) for _ in range(16)]
    vecs = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(80)]
    vecs[23] = [x + rng.gauss(0, 0.005) for x in base]
    df = emb_df(spark, vecs)
    out = similarity.pq_topk(df, base, k=5, m=4, n_codes=8, sample_size=80)
    assert 23 in [r.vec_id for r in out.collect()]


def test_pq_encode_identical_vectors_identical_codes(spark):
    """PQ codes are a pure function of the vector: exact duplicates
    must collapse to the same code row (the property that makes the
    code table a 32x-smaller dedup/index surface)."""
    import random

    rng = random.Random(3)
    v = [rng.gauss(0, 1) for _ in range(16)]
    w = [rng.gauss(0, 1) for _ in range(16)]
    df = emb_df(spark, [v, w, list(v), list(w)])
    books = similarity.fit_pq(df, m=4, k=4, sample_size=4, iters=2)
    rows = {r.vec_id: list(r.codes) for r in similarity.pq_encode(df, books).collect()}
    assert rows[0] == rows[2] and rows[1] == rows[3]
    assert len(rows[0]) == 4


def test_pq_adc_ranks_by_true_distance_when_codes_exact(spark):
    """With k >= n_distinct_vectors each vector is its own centroid,
    codes reconstruct exactly, and the ADC ranking must equal the true
    squared-distance ranking."""
    vecs = [
        [0.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0],
        [2.0, 0.0, 0.0, 0.0],
        [3.0, 0.0, 0.0, 0.0],
    ]
    df = emb_df(spark, vecs)
    books = similarity.fit_pq(df, m=2, k=4, sample_size=4, iters=3)
    out = similarity.pq_topk(df, [0.9, 0.0, 0.0, 0.0], k=4, codebooks=books)
    assert [r.vec_id for r in out.collect()] == [1, 0, 2, 3]


def test_embedding_neardup_pairs(spark):
    import random

    rng = random.Random(3)
    v = [rng.gauss(0, 1) for _ in range(16)]
    vecs = [v, [x * 1.001 for x in v]] + [
        [rng.gauss(0, 1) for _ in range(16)] for _ in range(20)
    ]
    df = emb_df(spark, vecs)
    pairs = embedding_neardup_pairs(df, threshold=0.99, nbits=8).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}


# ------------------------------------------------------------- multimodal


def test_multimodal_feature_extraction_plumbing(spark):
    media = spark.createDataFrame(
        [
            (1, "image", "image/png", b"fakebytes1", None, None, None, None),
            (2, "image", "image/png", b"fakebytes2", None, None, None, None),
            (3, "image", "image/png", None, None, None, None, None),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r.asset_id: r for r in multimodal.extract_image_features(media).collect()}
    assert len(out) == 3
    assert out[1].n_bytes == 10 and len(out[1].features) == 8
    assert out[1].checksum != out[2].checksum
    assert out[3].n_bytes == 0  # null content → empty bytes, not a crash
    # determinism: same input → same features
    again = {r.asset_id: r for r in multimodal.extract_image_features(media).collect()}
    assert again[1].features == out[1].features


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_multimodal_real_decode_executes(spark):
    """real=True must EXECUTE in every environment: PIL when present,
    the pure-stdlib png_lite codec otherwise — either way actual PNG
    bytes are decoded, and junk bytes yield the documented zero row."""
    from temp_data_pipeline_spark.llm import png_lite

    if _has_pil():
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (3, 2)).save(buf, format="PNG")
        png_bytes = buf.getvalue()
    else:
        # 3x2 RGB: two rows of red/green/blue-ish pixels
        px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255,
                    10, 20, 30, 40, 50, 60, 70, 80, 90])
        png_bytes = png_lite.encode(3, 2, 3, px)
    media = spark.createDataFrame(
        [(1, "image", "image/png", png_bytes, None, None, None, None),
         (2, "image", "image/png", b"not-a-png", None, None, None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r.asset_id: r for r in
           multimodal.extract_image_features(media, real=True).collect()}
    assert (out[1].width, out[1].height) == (3, 2)
    assert all(0.0 <= f <= 1.0 for f in out[1].features)
    assert (out[2].width, out[2].height) == (0, 0)
    assert out[2].features == [0.0] * 8


def test_audio_real_wav_decode(spark):
    """real=True decodes an actual WAV container via stdlib wave —
    this path runs for real even without any external audio libs."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    rate, n = 8000, 8000  # 1 second of 440 Hz sine, 16-bit mono
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack(
                    "<h", int(20000 * math.sin(2 * math.pi * 440 * i / rate))
                )
                for i in range(n)
            )
        )
    wav_bytes = buf.getvalue()
    media = spark.createDataFrame(
        [
            (1, "audio", "audio/wav", wav_bytes, None, None, None, None),
            (2, "audio", "audio/wav", b"not-a-wav", None, None, None, None),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = {
        r["asset_id"]: r
        for r in multimodal.extract_audio_features(media, real=True).collect()
    }
    assert out[1]["duration_ms"] == 1000
    # RMS of a full-scale-ish sine ≈ amplitude/sqrt(2) in [0, 1] units
    expect = 20000 / 32768.0 / math.sqrt(2)
    for f in out[1]["features"]:
        assert abs(f - expect) < 0.01
    assert out[2]["duration_ms"] == 0 and out[2]["features"] == [0.0] * 8


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(1, "video", "video/mp4", b"v", None, None, None, 3500)],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in rows] == [0, 1000, 2000, 3000]


def test_resize_spec(spark):
    media = spark.createDataFrame(
        [(1, "image", None, None, None, 1024, 768, None),
         (2, "image", None, None, None, 100, 50, None)],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r.asset_id: r for r in multimodal.resize_spec(media, max_side=512).collect()}
    assert (out[1].target_width, out[1].target_height) == (512, 384)
    assert (out[2].target_width, out[2].target_height) == (100, 50)  # no upscale


def test_resize_images_executes_pipeline(spark):
    media = spark.createDataFrame(
        [(1, "image", "image/png", b"imgbytes", None, 1024, 768, None),
         (2, "image", "image/png", b"other", None, 100, 50, None),
         (3, "audio", "audio/wav", b"aud", None, None, None, 2000)],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r.asset_id: r for r in
           multimodal.resize_images(media, max_side=512).collect()}
    assert set(out) == {1, 2}  # audio row filtered out
    assert (out[1].width, out[1].height) == (512, 384)
    assert (out[2].width, out[2].height) == (100, 50)
    assert out[1].content and out[1].content != b"imgbytes"
    # deterministic stand-in: same input → same bytes
    again = {r.asset_id: r for r in
             multimodal.resize_images(media, max_side=512).collect()}
    assert bytes(again[1].content) == bytes(out[1].content)
    # real=True executes in every environment (PIL or png_lite): feed
    # an actual PNG and get back a decodable PNG at the target dims
    from temp_data_pipeline_spark.llm import png_lite

    png_8x4 = png_lite.encode(8, 4, 3, bytes((i * 7) % 256 for i in range(8 * 4 * 3)))
    real_media = spark.createDataFrame(
        [(1, "image", "image/png", png_8x4, None, 8, 4, None)],
        multimodal.MEDIA_SCHEMA,
    )
    real_out = multimodal.resize_images(real_media, max_side=4, real=True).collect()[0]
    assert (real_out.width, real_out.height) == (4, 2)
    w2, h2, ch2, _px2 = png_lite.decode(bytes(real_out.content))
    assert (w2, h2, ch2) == (4, 2, 3)


def test_audio_feature_plumbing(spark):
    media = spark.createDataFrame(
        [
            (1, "audio", "audio/wav", b"fakewav1", None, None, None, 4000),
            (2, "image", "image/png", b"img", None, None, None, None),
            (3, "audio", "audio/wav", None, None, None, None, None),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r["asset_id"]: r for r in multimodal.extract_audio_features(media).collect()}
    assert set(out) == {1, 3}  # image row filtered out
    assert out[1]["duration_ms"] == 4000 and out[1]["n_bytes"] == 8
    assert out[3]["n_bytes"] == 0
    assert len(out[1]["features"]) == 8


def test_era5_binary_distributed_bad_file_marker(spark, tmp_path):
    (tmp_path / "a.nc").write_bytes(b"\x00fake-netcdf")
    (tmp_path / "b.txt").write_bytes(b"ignored")
    from temp_data_pipeline_spark.sources.era5 import read_era5_binary_distributed
    from temp_data_pipeline_spark.sources.stations import StationMeta

    st = StationMeta(station_id="KLGA", lat=40.78, lon=-73.87)
    rows = read_era5_binary_distributed(spark, str(tmp_path), st).collect()
    # unparseable bytes: one marker row per .nc file, txt filtered out
    assert len(rows) == 1
    assert rows[0]["error"] and "a.nc" in rows[0]["error"]


def test_curate_corpus_end_to_end(spark):
    """Full curation pipeline over real testdata: monotone stage
    shrinkage, complete split labeling, deterministic reruns."""
    from temp_data_pipeline_spark.llm.pipeline import curate_corpus, curation_report
    from temp_data_pipeline_spark.sources.registry import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    # the synthetic corpus has no English stopwords: relax that rule
    rules = {"min_stopword_hits": 0}
    out = curate_corpus(d, quality_rules=rules)
    stats = curation_report(d, quality_rules=rules)
    assert stats.n_input >= stats.n_quality >= stats.n_exact >= stats.n_neardup > 0
    assert sum(stats.splits.values()) == stats.n_neardup
    assert set(stats.splits) <= {"train", "val", "test"}
    assert out.count() == stats.n_neardup
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in curate_corpus(d, quality_rules=rules).collect())
    assert ids1 == ids2


# ---------------------------------------------------------------------------
# SemDeDup (k-means cells + within-cell cosine dedup)
# ---------------------------------------------------------------------------


def test_semdedup_golden(spark):
    from temp_data_pipeline_spark.llm.similarity import semdedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),   # exact duplicate of 1
        (3, [0.9, 0.1, 0.0, 0.0]),   # cos(1,3) ≈ 0.9938 → semantic dup
        (4, [0.0, 1.0, 0.0, 0.0]),   # other cell, kept
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semdedup(df, threshold=0.9, centroids=cents).collect()
    }
    assert out[1] == (0, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)
    assert out[4] == (1, True)


def test_semdedup_cross_cell_blind(spark):
    """Similar vectors in DIFFERENT cells are not compared — the
    documented SemDeDup recall trade for linear scaling."""
    from temp_data_pipeline_spark.llm.similarity import semdedup

    rows = [
        (1, [1.0, 0.05, 0.0, 0.0]),
        (2, [1.0, -0.05, 0.0, 0.0]),  # cos(1,2) ≈ 0.995 but cells differ
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1.0, 0.5, 0.0, 0.0], [1.0, -0.5, 0.0, 0.0]]
    out = {r["vec_id"]: r["kept"] for r in semdedup(df, centroids=cents).collect()}
    assert out == {1: True, 2: True}


def test_semdedup_fitted_quantizer_runs(spark):
    """fit_kmeans path: deterministic across two invocations."""
    from temp_data_pipeline_spark.llm.similarity import semdedup
    from temp_data_pipeline_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    a = semdedup(e, threshold=0.4, n_centroids=4).orderBy("vec_id").collect()
    b = semdedup(e, threshold=0.4, n_centroids=4).orderBy("vec_id").collect()
    assert a == b
    assert len(a) == e.count()


class TestFilteredTopk:
    def test_filter_applied_before_ranking(self, spark):
        rows = [
            (1, [1.0, 0.0], "a"),
            (2, [0.99, 0.14], "b"),   # closest to q but filtered out
            (3, [0.8, 0.6], "a"),
            (4, [0.0, 1.0], "a"),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "tag"])
        out = similarity.filtered_topk(
            df, [1.0, 0.0], F.col("tag") == "a", k=2
        ).collect()
        assert [r["vec_id"] for r in out] == [1, 3]

    def test_predicate_reaches_scan(self, spark, tmp_path):
        """The metadata filter must appear as a pushed parquet filter,
        not a post-scan residual only."""
        p = str(tmp_path / "vecs")
        spark.createDataFrame(
            [(i, [float(i), 1.0], i % 3) for i in range(50)],
            "vec_id long, embedding array<double>, label int",
        ).write.parquet(p)
        df = spark.read.parquet(p)
        plan = similarity.filtered_topk(
            df, [1.0, 0.0], F.col("label") == 1, k=3
        )._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "label" in plan.split("PushedFilters")[1][:80]


class TestQuantizeInt8:
    def test_codes_and_scale_golden(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            ["vec_id", "embedding"],
        )
        out = {r["vec_id"]: (r["scale"], r["codes"])
               for r in similarity.quantize_int8(df).collect()}
        assert out[1] == (1.0 / 127.0, [127, -63, 32, 0])  # round half up
        assert out[2] == (0.0, [0, 0, 0, 0])  # zero vector → zero codes

    def test_reconstruction_error_bounded(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-2, 2) for _ in range(16)]) for i in range(100)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        got = {r["vec_id"]: (r["scale"], r["codes"])
               for r in similarity.quantize_int8(df).collect()}
        for vid, vec in rows:
            scale, codes = got[vid]
            assert all(-127 <= c <= 127 for c in codes)
            for x, c in zip(vec, codes):
                # symmetric quantization error ≤ scale/2 per element
                assert abs(x - c * scale) <= scale / 2 + 1e-12

    def test_no_shuffle_in_plan(self, spark):
        df = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(10)], ["vec_id", "embedding"]
        )
        plan = similarity.quantize_int8(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # map-only: runs at scan speed


def test_embedding_neardup_supports_string_ids(spark):
    from temp_data_pipeline_spark.llm.dedup import embedding_neardup_pairs

    rows = [("docA", [1.0, 0.0]), ("docB", [0.999, 0.04]), ("docC", [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = embedding_neardup_pairs(df, threshold=0.9, nbits=8, bands=4).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {("docA", "docB")}


def test_embedding_neardup_cosine_deterministic_across_runs(spark):
    import random

    from temp_data_pipeline_spark.llm.dedup import embedding_neardup_pairs

    rng = random.Random(3)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = sorted(map(tuple, embedding_neardup_pairs(df, threshold=0.2).collect()))
    b = sorted(map(tuple, embedding_neardup_pairs(df, threshold=0.2).collect()))
    assert a == b and len(a) > 0  # max-over-buckets makes values stable


def test_ivf_knn_join_finds_planted_neighbors(spark):
    import random

    rng = random.Random(23)
    vecs = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(60)]
    # plant: vec 50 ~ vec 10, vec 51 ~ vec 20 (distinct directions)
    vecs[50] = [x * 1.01 for x in vecs[10]]
    vecs[51] = [x * 0.99 for x in vecs[20]]
    df = emb_df(spark, vecs)
    cents = similarity.fit_kmeans(df, n_centroids=4, sample_size=60)
    queries = df.filter("vec_id >= 50")
    index = df.filter("vec_id < 50")
    out = similarity.ivf_knn_join(
        queries, index, cents, k=3, nprobe=2
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    # every query got ranked results, top-1 is its planted twin
    assert sorted(r for r, _ in by_q[50]) == [1, 2, 3]
    assert min(by_q[50])[1] == 10
    assert min(by_q[51])[1] == 20


def test_ivf_knn_join_no_cartesian(spark):
    import random

    rng = random.Random(29)
    vecs = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(40)]
    df = emb_df(spark, vecs)
    cents = similarity.fit_kmeans(df, n_centroids=4, sample_size=40)
    plan = (
        similarity.ivf_knn_join(
            df.filter("vec_id >= 30"), df.filter("vec_id < 30"), cents
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan

"""Training-data curation operators: splits, decontamination,
repetition signals, per-group selection.

These are the pipeline steps between raw crawl and training shards:

- ``hash_split``: deterministic train/val/test assignment from a
  content-stable hash — the only split that survives re-runs,
  backfills, and multi-engine pipelines (row position is meaningless
  at 100 TB; hash identity is not).
- ``ngram_overlap``: eval decontamination — for every train document,
  how many distinct token n-grams it shares with the test corpus.
  The standard "n-gram collision" check run before training.
- ``repetition_stats``: Gopher-style repetition signals (top-token
  fraction, distinct-token ratio) used to drop boilerplate/spam.
- ``topk_per_group``: keep the best k documents per group (language,
  domain, ...) — window row_number, one shuffle.

Everything is built-in-function Column algebra (JVM-side, codegen);
the n-gram path reuses the materialized-token-array barrier from
llm/dedup.py so hash/shingle lambdas see attributes, not re-evaluated
expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.dedup import ngrams_of, shingles_of, tokenized
from temp_data_pipeline_spark.llm.text import md5_int60

__all__ = [
    "corpus_line_dedup",
    "deterministic_shuffle",
    "curation_funnel",
    "curation_gate_columns",
    "dup_ngram_stats",
    "hash_split",
    "intra_dup_ngram_stats",
    "line_dedup",
    "mix_temperature",
    "ngram_overlap",
    "ngram_overlap_single",
    "repetition_stats",
    "span_dedup",
    "stratified_sample",
    "top_keywords",
    "topk_per_group",
    "vocab_coverage",
]


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    weights: dict[str, int] | None = None,
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Deterministic percentage split keyed on ``md5(salt || id)``.

    ``weights`` maps split name → integer percent (must sum to 100);
    default 80/10/10 train/val/test.  The md5-derived 60-bit bucket is
    bit-identical in DuckDB (see llm/text.py::md5_int60), so split
    membership is reproducible across engines — re-running the
    pipeline, or running it elsewhere, never migrates a document
    between train and test.
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"weights must sum to 100, got {weights}")
    bucket = md5_int60(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 100
    expr = None
    edge = 0
    for name, pct in weights.items():
        edge += pct
        cond = bucket < edge
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out, expr)


def top_keywords(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    with_score: bool = False,
) -> DataFrame:
    """TF-IDF-style keyword extraction: the k most characteristic
    terms per document.

    Ranking is the integer tuple (tf DESC, df ASC, term ASC) —
    "frequent in this document, rare in the corpus" — which orders
    identically to tf·idf with a monotone idf whenever tf ties break
    by rarity, and (deliberately) involves no floating-point log: the
    ranking is bit-exact across engines, so the conformance query can
    hash-compare. `with_score=True` adds the conventional
    tf·ln(N/df) double for consumers that want the magnitude.

    Plan shape: explode → per-(doc,term) count (map-side combine) →
    per-term document frequency → broadcast-or-shuffle join back →
    one window on doc_id. Every shuffle carries (id, term, int) rows.
    """
    toks = df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    joined = tf.join(dfreq, "term")
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    out = (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("long").alias("rank"), "term", "tf", "df")
    )
    if with_score:
        # the corpus size is only needed for the idf magnitude; keep
        # this count inside the branch — the rank-only path (the
        # conformance query) must not pay an eager extra scan for it
        n_docs = df.select(id_col).distinct().count()
        out = out.withColumn(
            "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
        )
    return out


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``md5(salt || id) % 10^6 < frac · 10^6`` with the fraction chosen
    by its stratum. Corpus-mix rebalancing (e.g. downsample one
    language, keep all of another) as a map-only filter:

    - deterministic and engine-stable (same md5-int60 family as
      hash_split — DuckDB reproduces membership exactly), so reruns
      and backfills select the SAME rows — no RNG state, no
      sampleBy() seed drift between Spark versions;
    - composable with hash_split: different salts decorrelate the
      sample from the train/test assignment.

    Unknown strata fall back to ``default_frac`` (0.0 = drop).
    """
    bucket = md5_int60(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 1_000_000
    frac = None
    for name, f in fractions.items():
        cond = F.col(strata_col) == name
        thr = F.lit(int(round(f * 1_000_000)))
        frac = F.when(cond, thr) if frac is None else frac.when(cond, thr)
    frac = frac.otherwise(F.lit(int(round(default_frac * 1_000_000))))
    return df.filter(bucket < frac)


def exact_sample(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    seed: str = "sample0",
) -> DataFrame:
    """Deterministic EXACT-k uniform sample: the ``k`` rows with the
    smallest md5-derived rank of (seed, id) — "give me exactly one
    million eval docs from the ten-billion-doc corpus", where
    ``stratified_sample``'s fractional filter can only hit a count in
    expectation. Same engine-stable hash family (membership
    reproducible across reruns, backfills, and engines; new seed =
    fresh sample, salts decorrelate from splits/shuffles).

    Physical shape: orderBy(hash, id).limit(k) — Spark compiles this
    to TakeOrderedAndProject, a per-partition top-k heap + driver
    merge of k·P candidate rows, NOT a global sort: no shuffle of the
    corpus, and memory bounded by k per task. The classic distributed
    reservoir sample, expressed declaratively. Ranks are not
    returned (a sample is a set); compose with
    ``deterministic_shuffle`` for an ordered sample."""
    h = md5_int60(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    return (
        df.withColumn("_h", h)
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("_h")
    )


def ngram_overlap(
    train: DataFrame,
    test: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 6,
    hash_grams: bool = True,
) -> DataFrame:
    """Per-train-document count of distinct token ``n``-grams shared
    with ANY test document — the eval-decontamination primitive.

    Physical shape: both corpora tokenize map-side, explode to
    (gram) rows, the test side is reduced to DISTINCT grams, and one
    hash join + a count-by-doc finishes it. With ``hash_grams`` the
    join/distinct key is ``xxhash64(gram)`` instead of the gram text:
    8-byte shuffle keys in place of ~n-word strings (measured ~1.3×
    at sf0.1, and the ratio grows with gram width) — counts are then
    exact up to 64-bit gram-hash collisions (~q²/2⁶⁵ for q distinct
    grams; immaterial below ~10¹⁸ grams). Pass ``hash_grams=False``
    for the byte-exact contract.

    When train and test are filters of the SAME corpus, prefer
    ``ngram_overlap_single`` — one scan instead of two.

    Documents shorter than ``n`` tokens contribute their single
    truncated gram (concat_ws skips the null picks) — identical to
    list-slice truncation in DuckDB, so the oracle agrees on edge
    docs.
    """
    def grams(df: DataFrame) -> DataFrame:
        t = tokenized(df, text_col, keep=[id_col])
        g = t.select(
            F.col(id_col), F.explode(shingles_of(F.col("_tok"), n)).alias("gram")
        )
        if hash_grams:
            g = g.select(id_col, F.xxhash64("gram").alias("gram"))
        return g

    test_grams = grams(test).select("gram").distinct()
    train_grams = grams(train)
    # count_distinct, not count: a gram repeated inside one train doc
    # is still ONE shared gram (the documented contract and the
    # DuckDB oracle's DISTINCT) — plain count was only accidentally
    # equal on corpora without intra-doc n-gram repeats
    return (
        train_grams.join(test_grams, "gram", "inner")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("gram")).alias("n_shared"))
    )


def ngram_overlap_single(
    df: DataFrame,
    test_cond,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 6,
    hash_grams: bool = True,
) -> DataFrame:
    """`ngram_overlap` when train and test are partitions of ONE
    corpus (``test_cond`` a boolean Column): gram generation runs in
    a single scan that tags each row's side, so the source is read
    once — at 100 TB that halves the dominant cost (two full
    tokenize+shingle passes become one).
    """
    # evaluate test_cond BEFORE tokenizing: tokenized() prunes every
    # column except id_col + the token array, so a condition over any
    # other column (split labels, source, dates) would fail to resolve
    # if applied downstream
    tagged = df.withColumn("_is_test", test_cond)
    t = tokenized(tagged, text_col, keep=[id_col, "_is_test"])
    key = F.xxhash64("gram") if hash_grams else F.col("gram")
    g = t.select(
        F.col(id_col),
        F.col("_is_test"),
        F.explode(shingles_of(F.col("_tok"), n)).alias("gram"),
    ).select(id_col, key.alias("g"), "_is_test")
    test_grams = g.filter(F.col("_is_test")).select("g").distinct()
    return (
        g.filter(~F.col("_is_test"))
        .join(test_grams, "g", "inner")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("g")).alias("n_shared"))
    )


def dup_ngram_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Cross-document duplicated n-gram fraction — the MassiveText /
    Gopher INTER-document repetition signal: what share of a
    document's n-gram occurrences also appear in some OTHER document.
    High values mark boilerplate (headers, licence blocks, templated
    spam) that exact- and near-dedup at document granularity miss.

    Physical shape: tokenize map-side, explode positional n-grams
    (duplicates kept — occurrences, not shingle sets), immediately
    collapse each gram to its ``xxhash64`` (the gram text never
    shuffles — 8-byte keys instead of ~8-word strings), and
    hash-partition ONCE by that key.  Because ``HashPartitioning(g)``
    satisfies the clustering required by both ``groupBy(g, doc)`` and
    the document-frequency window over ``g``, the occurrence count and
    the in-place df computation run on that single exchange with no
    further shuffle — the only other exchange is the tiny final
    count-by-doc.  (An earlier 3-exchange form keyed every shuffle by
    the full gram string; same answer, ~10× the shuffle bytes.)
    Collision risk of equating grams by 64-bit hash is birthday-bound
    (~n²/2⁶⁵; ≪1e-6 even at billions of distinct grams) and only ever
    inflates a df from 1, never corrupts counts.

    Returns (id, n_grams, n_dup_grams): total n-gram occurrences and
    occurrences whose gram appears in >1 distinct document.
    """
    t = tokenized(df, text_col, keep=[id_col])
    grams = t.select(
        F.col(id_col),
        F.explode(ngrams_of(F.col("_tok"), n)).alias("gram"),
    ).select(F.col(id_col), F.xxhash64("gram").alias("g"))
    per_doc = (
        grams.repartition("g")
        .groupBy("g", id_col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    df_w = F.count(F.lit(1)).over(Window.partitionBy("g"))
    return (
        per_doc.withColumn("df", df_w)
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") > 1, F.col("c")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_dup_grams"),
        )
    )


def repetition_stats(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals: ``top_token_frac`` (share of
    the most frequent token) and ``distinct_ratio`` (type/token
    ratio).  High top-token fraction or low distinct ratio flags
    boilerplate, keyword spam, and degenerate generations — the
    Gopher/C4 family of quality filters.

    Two shuffles, both keyed by (doc, token) / (doc): standard
    map-reduce shape that scales linearly; no per-doc quadratic array
    scans.
    """
    toks = tokenized(df, text_col, keep=[id_col]).select(
        F.col(id_col), F.explode(F.col("_tok")).alias("w")
    )
    per_token = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    return per_token.groupBy(id_col).agg(
        (F.max("c").cast("double") / F.sum("c")).alias("top_token_frac"),
        (F.count(F.lit(1)).cast("double") / F.sum("c")).alias("distinct_ratio"),
        F.sum("c").alias("n_tokens"),
    )


def intra_dup_ngram_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """WITHIN-document duplicate n-gram fraction — the Gopher
    (Rae et al. 2021, Table A1) intra-document repetition filter:
    what share of a document's n-gram occurrences are repeats of an
    n-gram already seen in the SAME document.  Complements
    `dup_ngram_stats` (inter-document boilerplate) and
    `repetition_stats` (token-level): a looping generation or a
    copy-pasted paragraph lights this up even when every token is
    common and no other document shares the text.

    Shape: one explode + one (id, gram-hash) aggregation + one (id)
    aggregation — dup occurrences of a gram = count − 1.  Keys hash to
    8 bytes before the shuffle (same birthday-bound collision argument
    as dup_ngram_stats: a collision can only merge two grams WITHIN
    one document).  All map-reduce, linear at any corpus size.

    Returns (id, n_grams, n_intra_dup, dup_frac) with
    dup_frac = n_intra_dup / n_grams (0.0 for docs shorter than n).
    """
    t = tokenized(df, text_col, keep=[id_col])
    grams = t.select(
        F.col(id_col),
        F.explode(ngrams_of(F.col("_tok"), n)).alias("gram"),
    ).select(F.col(id_col), F.xxhash64("gram").alias("g"))
    per = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_grams"),
        (F.sum("c") - F.count(F.lit(1))).cast("long").alias("n_intra_dup"),
        ((F.sum("c") - F.count(F.lit(1))) / F.sum("c")).cast("double").alias(
            "dup_frac"
        ),
    )


def span_dedup(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 6,
) -> DataFrame:
    """Corpus-wide EXACT substring (token-span) deduplication — the
    Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better") ExactSubstr family, at span granularity: the text
    is cut into non-overlapping ``n``-token chunks, every chunk whose
    exact text already occurred at an earlier (doc, position) anywhere
    in the corpus is REMOVED, and each document is reassembled from
    its surviving chunks. Unlike document-level dedup this deletes
    boilerplate (licence blocks, navigation, templated headers)
    embedded inside otherwise-unique documents. (The reference has no
    sub-document dedup at all; its whole-row distinct is SURVEY §2.3.)

    Canonical occurrence = first in (doc_id, position) order, so the
    output is deterministic and rerun-stable. The trailing ``len % n``
    tokens are always kept (too short to be a chunk).

    Physical shape — linear, one logical clustering:
      tokenize map-side → posexplode chunk spans → 60-bit md5 key
      (8-byte shuffle keys; the md5 family keeps DuckDB replayable,
      switch to xxhash64 off the conformance path for cheaper hashes)
      → ONE hash exchange on the key; row_number picks the canonical
      occurrence on that exchange → re-key by doc for reassembly
      (sort_array over each doc's kept chunks) → left join back so
      fully-deduplicated documents still emit a row (empty text).
    No window ever spans more than one chunk-key's occurrence list, so
    skewed spans (a chunk repeated millions of times) cost one
    partition's sort of (doc_id, pos) pairs — payload text is dropped
    before the exchange for dropped occurrences only after the rank,
    so carry is (key, doc, pos, span): ~span bytes per occurrence,
    the unavoidable minimum for reassembly.

    Returns (id, text_clean, n_spans, n_kept): total span count
    (chunks + trailing remainder, if any) and surviving count.
    """
    t = tokenized(df, text_col, keep=[id_col])
    nc = F.floor(F.size("_tok") / n).cast("int")
    chunk_spans = F.transform(
        F.when(nc > 0, F.sequence(F.lit(0), nc - 1)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda p: F.concat_ws(" ", F.slice(F.col("_tok"), p * n + 1, n)),
    )
    rem_len = F.size("_tok") - nc * n
    rem_span = F.when(
        rem_len > 0,
        F.array(F.concat_ws(" ", F.slice(F.col("_tok"), nc * n + 1, rem_len))),
    ).otherwise(F.array().cast("array<string>"))
    occ = t.select(
        F.col(id_col),
        nc.alias("_nc"),
        F.posexplode(F.concat(chunk_spans, rem_span)).alias("pos", "span"),
    ).select(
        id_col,
        "pos",
        "span",
        # the remainder (pos == _nc) gets a per-doc unique key: it
        # never participates in dedup but rides the same pipeline
        F.when(
            F.col("pos") < F.col("_nc"), md5_int60(F.col("span"))
        ).otherwise(
            md5_int60(
                F.concat(
                    F.lit("rem:"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col("pos").cast("string"),
                )
            )
        ).alias("_k"),
    )
    w = Window.partitionBy("_k").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    kept = (
        occ.repartition("_k")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "span"))),
                lambda s: s["span"],
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    totals = t.select(
        F.col(id_col),
        (nc + F.when(rem_len > 0, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_spans"),
    )
    return totals.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_spans",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def mix_temperature(
    df: DataFrame,
    *,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-flattened corpus mixing: downsample each stratum so
    the surviving distribution follows ``n_s^alpha`` — the standard
    multilingual/source rebalancing step (alpha = 1 keeps the natural
    mix, alpha → 0 approaches uniform; alpha 0.3–0.7 are the published
    LM-pretraining settings).

    Keep fraction per stratum: f_s = (n_s / n_min)^(alpha-1) — the
    smallest stratum keeps everything, larger ones shed by a power of
    their size ratio. Membership is the same deterministic md5 bucket
    as stratified_sample/hash_split, so reruns keep identical rows and
    DuckDB reproduces them exactly.

    The per-stratum counts are ONE tiny aggregate (bounded by the
    number of strata — languages/sources, not rows) collected to the
    driver; the filter itself is map-only. For alpha=0.5 the fraction
    routes through sqrt (IEEE-correctly-rounded, so the conformance
    oracle reproduces thresholds bit-exactly); other alphas use pow.
    """
    import math

    counts = {
        r[0]: r[1] for r in df.groupBy(strata_col).count().collect()
    }
    if not counts:
        return df.filter(F.lit(False))
    n_min = min(counts.values())
    thr: dict[str, int] = {}
    for s, cn in counts.items():
        if alpha == 0.5:
            f = math.sqrt(n_min / cn)
        else:
            f = (cn / n_min) ** (alpha - 1.0)
        thr[s] = int(math.floor(f * 1_000_000))
    bucket = md5_int60(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 1_000_000
    expr = None
    for s, t_ in thr.items():
        # NULL strata count toward n_min like any group, so their rows
        # must get their threshold too — a plain == comparison is
        # never true for NULL and would silently drop the whole group
        cond = F.col(strata_col).isNull() if s is None else F.col(strata_col) == s
        expr = F.when(cond, F.lit(t_)) if expr is None else expr.when(cond, F.lit(t_))
    return df.filter(bucket < expr.otherwise(F.lit(0)))


def curation_funnel(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    gopher_kwargs: dict | None = None,
    max_top_token_frac: float = 0.2,
    min_distinct_ratio: float = 0.4,
    classifier_dim: int = 512,
    classifier_salt: str = "w:",
    min_score: float = 0.0,
) -> DataFrame:
    """The end-to-end curation pipeline as ONE pass, with a per-stage
    survivor funnel — the report every data team publishes next to a
    training corpus ("N crawled → N after quality rules → N after
    repetition → N after classifier → N after dedup"):

      raw → Gopher rule suite → repetition gates (top-token fraction,
      type/token ratio) → hashed linear classifier score ≥ threshold
      → exact dedup (first doc per md5 fingerprint *among survivors*)

    Physical shape: every gate including the classifier score is a
    map-only expression computed in ONE scan (the classifier here
    derives its weight from the bucket hash inline — the md5 weight
    family of llm/classifier.py::hashed_weights; swap in the
    broadcast-join path of classifier_score for trained weights).
    Dedup canonicalization is one window over the md5 fingerprint,
    and the funnel itself is one tiny aggregate — so the whole
    pipeline costs one scan + one hash exchange at any corpus size,
    versus five sequential filter jobs.

    Returns 5 rows: (stage_idx, stage, n_docs), cumulative — each
    stage counts documents surviving it AND all previous stages.
    """
    staged = curation_gate_columns(
        df,
        text_col=text_col,
        id_col=id_col,
        gopher_kwargs=gopher_kwargs,
        max_top_token_frac=max_top_token_frac,
        min_distinct_ratio=min_distinct_ratio,
        classifier_dim=classifier_dim,
        classifier_salt=classifier_salt,
        min_score=min_score,
    )
    agg = staged.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("_g").cast("long")).alias("n1"),
        F.sum(F.col("_gr").cast("long")).alias("n2"),
        F.sum(F.col("_grc").cast("long")).alias("n3"),
        F.sum(F.col("_all").cast("long")).alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(5, 0, 'raw', n0, 1, 'gopher', n1, 2, 'repetition', n2, "
            "3, 'classifier', n3, 4, 'dedup', n4) AS (stage_idx, stage, n_docs)"
        )
    )


def curation_gate_columns(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: list[str] | None = None,
    gopher_kwargs: dict | None = None,
    max_top_token_frac: float = 0.2,
    min_distinct_ratio: float = 0.4,
    classifier_dim: int = 512,
    classifier_salt: str = "w:",
    min_score: float = 0.0,
) -> DataFrame:
    """The funnel's gate computation as a reusable frame: (id, *keep,
    _fp, _g, _gr, _grc, _all) where _g/_gr/_grc are the cumulative
    Gopher / +repetition / +classifier gates and _all additionally
    requires being the canonical (min-id) surviving copy of the md5
    fingerprint. ONE scan of map-only expressions plus ONE window on
    the fingerprint — shared by `curation_funnel` (which aggregates
    the counts) and `llm/pipeline.prepare_training_shards` (which
    keeps the surviving rows)."""
    from temp_data_pipeline_spark.llm import text as T

    c = F.col(text_col)
    t = T.tokens(c)
    nt = F.size(t)
    flags = T.gopher_flags(text_col, **(gopher_kwargs or {}))
    g_ok = flags["gopher_pass"]

    distinct_ratio = F.size(F.array_distinct(t)).cast("double") / nt
    # max token multiplicity == longest run in the sorted token array:
    # sort_array + one linear fold, O(n log n) per document, vs the
    # naive distinct × per-element filter which is O(distinct · n)
    # and quadratic on distinct-heavy long docs (ADVICE r4)
    _sorted = F.sort_array(t)
    _runstep = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
        .otherwise(F.lit(1))
        .alias("run"),
        F.greatest(
            acc["best"],
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    _max_count = F.aggregate(
        _sorted,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        _runstep,
        lambda acc: acc["best"],
    )
    top_token_frac = _max_count.cast("double") / nt
    r_ok = (top_token_frac <= max_top_token_frac) & (
        distinct_ratio >= min_distinct_ratio
    )

    # integer-valued weights summed as BIGINT: exact, order-independent
    w_sum = F.aggregate(
        t,
        F.lit(0).cast("bigint"),
        lambda acc, tok: acc
        + (
            (
                md5_int60(
                    F.concat(
                        F.lit(classifier_salt),
                        (md5_int60(tok) % classifier_dim).cast("string"),
                    )
                )
                % 2001
            )
            - 1000
        ),
    )
    score = w_sum.cast("double") / nt
    c_ok = score >= min_score

    base = df.select(
        F.col(id_col),
        *[F.col(k) for k in (keep or [])],
        F.md5(c).alias("_fp"),
        g_ok.alias("_g"),
        (g_ok & r_ok).alias("_gr"),
        (g_ok & r_ok & c_ok).alias("_grc"),
    )
    w = Window.partitionBy("_fp")
    canonical = F.min(F.when(F.col("_grc"), F.col(id_col))).over(w) == F.col(id_col)
    return base.withColumn("_all", F.col("_grc") & canonical)


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    *,
    k: int = 3,
    descending: bool = True,
    tie_break: str = "doc_id",
) -> DataFrame:
    """Best-``k`` rows per group: window row_number over
    (group, order desc, tie).  One shuffle on the group key; the
    rank filter happens before any downstream projection so payload
    columns for dropped rows never move again.
    """
    ordering = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(tie_break).asc(),
    ]
    w = Window.partitionBy(group_col).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def corpus_report(
    df: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
    all_sentinel: str = "<all>",
) -> DataFrame:
    """Corpus-mix report: per (source, lang), per source, per lang, and
    overall — document counts, token budget, exact median tokens, and
    mean document length — in ONE shuffle via GROUPING SETS (the
    Expand operator fans each row into its four grouping rows before
    a single hash exchange; four separate groupBys would scan and
    shuffle four times).

    Rolled-up key levels surface as ``all_sentinel`` (caller must pick
    a sentinel that can't collide with real key values; real NULL keys
    would be indistinguishable from rollup rows otherwise).
    """
    from temp_data_pipeline_spark.llm.text import token_count

    base = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        token_count(text_col).cast("bigint").alias("n_toks"),
        F.length(text_col).cast("bigint").alias("n_chars"),
    )
    agg = (
        base.groupingSets(
            [["source", "lang"], ["source"], ["lang"], []], "source", "lang"
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("n_chars").alias("_sum_chars"),
            F.expr("percentile(n_toks, 0.5D)").alias("p50_tokens"),
        )
    )
    avg = F.col("_sum_chars").cast("double") / F.col("n_docs").cast("double")
    return agg.select(
        F.coalesce("source", F.lit(all_sentinel)).alias("source"),
        F.coalesce("lang", F.lit(all_sentinel)).alias("lang"),
        "n_docs",
        "n_tokens",
        "p50_tokens",
        (F.floor(avg * 100.0 + 0.5) / 100.0).alias("avg_chars"),
    )


def line_dedup(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Intra-document exact line deduplication — the C4/RefinedWeb
    page-cleaning step that strips repeated nav bars, cookie banners,
    and boilerplate lines a crawler stamps onto every paragraph
    boundary. Keeps each line's FIRST occurrence, preserving order.

    Map-only array expressions (split on newline → keep line i iff
    its first occurrence index is i → rejoin): zero shuffles, runs at
    scan speed at any corpus size. Per-document cost is O(lines²)
    via array_position, which is the right trade for web pages
    (tens-to-hundreds of lines) because it keeps the operator in
    whole-stage codegen; corpora with pathological line counts should
    pre-chunk. The same (l, i) -> position = i filter is expressible
    verbatim in DuckDB, so the op is oracle-exact.

    Returns (id, text_clean, n_lines, n_kept).
    """
    import re as _re

    # F.split takes a REGEX; array_join takes a literal. Escape the
    # separator so both sides agree for any sep (e.g. "|" would
    # otherwise split between every character while rejoining with a
    # literal pipe). re.escape only backslash-escapes non-alphanumerics,
    # which Java regex accepts identically.
    lines = F.split(F.col(text_col), _re.escape(sep))
    kept = F.filter(
        lines, lambda l, i: (F.array_position(lines, l) - 1) == i
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, sep).alias("text_clean"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
    )


def corpus_line_dedup(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """CORPUS-level frequent-line removal — the CCNet/RefinedWeb
    boilerplate pass that deletes lines appearing in ``min_docs`` or
    more DISTINCT documents (cookie banners, nav bars, license
    footers stamped across a crawl). Complements ``line_dedup``,
    which only dedups within one document: a banner occurring once
    per page survives intra-doc dedup and only corpus statistics can
    catch it. Keeps each surviving line in original order; documents
    whose every line is boilerplate stay in the output with empty
    text (dropping them is a separate quality gate's decision).

    Physical shape, sized for 100 TB:
    - posexplode lines (map-only; line order rides along as ``pos``),
    - distinct (doc, line) → count docs per line — ONE exchange at
      line cardinality with map-side partial distinct/combine,
    - the frequent set (count ≥ min_docs) is tiny by construction —
      boilerplate is by definition few distinct strings — so the
      removal join back onto the line table is a broadcast-hash
      LEFT ANTI join (hinted; AQE would pick it anyway),
    - reassemble per document: one groupBy(doc) with sort_array over
      (pos, line) structs — per-doc state is one web page, never
      corpus-sized.
    Lines join on their full text, not a hash: a 64-bit hash
    collision would silently merge two distinct lines' counts, and
    the shuffle already carries the line string for reassembly.

    Returns (id, text_clean, n_lines, n_kept).
    """
    import re as _re

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            "pos", "line"
        ),
    )
    frequent = (
        lines.select(id_col, "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= int(min_docs))
        .select("line")
    )
    kept = lines.join(F.broadcast(frequent), "line", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    # left-join the full id set back: a document losing ALL its lines
    # must surface as empty text, not vanish (same absent-means-zero
    # contract as llm/embed.py's dense view)
    n_lines = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), _re.escape(sep)))
        .cast("long")
        .alias("n_lines"),
    )
    return n_lines.join(reassembled, id_col, "left").select(
        F.col(id_col),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


def vocab_coverage(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    coverage: float = 0.95,
) -> DataFrame:
    """Corpus vocabulary with cumulative-coverage trim — the
    sentencepiece-style "keep the smallest vocabulary covering X% of
    token occurrences" report that sizes tokenizers and OOV budgets.

    Ranks tokens by (count DESC, token ASC) and keeps every token
    whose PRECEDING cumulative occurrence share is < ``coverage``
    (so the vocabulary is the minimal prefix reaching it). All-integer
    rank/count columns; the coverage test multiplies out the division
    (cum_before · 10⁶ < coverage · 10⁶ · total) so the cut is exact
    integer math in both engines. The cross-multiply runs in
    decimal(38,0): occurrence totals are corpus-sized (~2e13 tokens at
    100 TB of text), so a BIGINT product would overflow right at the
    advertised scale — DuckDB's HUGEINT product is already safe.

    Physical shape: explode → count per token (map-side combine, one
    exchange at vocabulary cardinality, not corpus size) → one window
    over the vocab for the running sum. The window is a single
    partition, which is correct here: a vocabulary is small by
    definition (≤ a few million rows even at 100 TB of text).

    Returns (rank, token, n_occ, cum_occ) for the kept prefix.
    """
    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_occ"))
    w = Window.orderBy(F.col("n_occ").desc(), F.col("token").asc())
    thr = int(round(coverage * 1_000_000))
    ranked = counts.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        "n_occ",
        F.sum("n_occ").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("cum_occ"),
    )
    total = counts.agg(F.sum("n_occ").cast("long").alias("_total"))
    dec = "decimal(38,0)"
    return (
        ranked.crossJoin(F.broadcast(total))
        .filter(
            (F.col("cum_occ") - F.col("n_occ")).cast(dec) * F.lit(1_000_000)
            < F.lit(thr).cast(dec) * F.col("_total").cast(dec)
        )
        .select("rank", "token", "n_occ", "cum_occ")
    )


def deterministic_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    out: str = "shuffle_rank",
    n_buckets: int | None = None,
) -> DataFrame:
    """Reproducible global permutation — the epoch shuffle a training
    run needs to be RESTARTABLE: order is a pure function of
    (seed, id), so any worker, any restart, any engine derives the
    same sequence; change the seed string per epoch for a fresh
    permutation. Contrast with ``ORDER BY rand()``, which is neither
    reproducible nor stable under retries — a task retry that
    re-draws randomness can duplicate or drop rows from the epoch.

    Rank is md5-derived (engine-replayable, like hash_split) with the
    id as tiebreak for identical hashes. The rank is computed with
    the same two-level prefix-sum shape as ``budget.py`` — NOT an
    unpartitioned ``Window.orderBy`` (one task sorts the corpus):

      1. bucket rows by the TOP BITS of the 60-bit hash (bucket
         order == hash order, and a uniform hash means uniform
         buckets — no skew regardless of id distribution),
      2. row_number within each bucket (parallel windows),
      3. per-bucket counts → cumulative offsets (a window over
         n_buckets rows), broadcast back and added.

    Returns the input plus (out) = 1-based dense position.
    """
    spark = df.sparkSession
    B = n_buckets or spark.sparkContext.defaultParallelism * 4
    k = max(1, (B - 1).bit_length())  # buckets = 2^k, shift = 60-k
    h = md5_int60(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    part = df.withColumn("_h", h).withColumn(
        "_b", F.shiftright(F.col("_h"), 60 - k)
    )
    w_in = Window.partitionBy("_b").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    part = part.withColumn("_rn", F.row_number().over(w_in))
    # 2^k rows — the single-partition window runs over the bucket
    # summary, never the data
    w_b = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_off", F.coalesce(F.sum("_cnt").over(w_b), F.lit(0)))
        .select("_b", "_off")
    )
    return (
        part.join(F.broadcast(offsets), "_b")
        .withColumn(out, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_h", "_b", "_rn", "_off")
    )

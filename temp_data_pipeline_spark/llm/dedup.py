"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

Scale design (the whole point of these operators):
- Exact dedup is a hash groupBy — one shuffle on a 64-bit content
  hash, never on the full text.
- MinHash+LSH avoids the O(n²) pair space: signatures are computed
  map-side with array expressions (no UDFs), banded, and candidate
  pairs come from a self-equi-join on (band_id, band_hash) — the only
  shuffle is on band keys. Exact Jaccard verification runs only on
  candidates.
- SimHash gives near-dup detection for small edits: 64-bit signature
  map-side; banding on 16-bit chunks for candidates; Hamming-distance
  verify via bit_count(xor).
- Embedding near-dup uses random-hyperplane LSH over the vector
  column, then exact cosine on bucket-mates.

Greedy representative selection: a document is a duplicate if it pairs
with ANY lower-id document (standard keep-lowest-id policy) — one
semi-join over the candidate pairs. The iterative alternative
(explicit duplicate clusters via distributed connected components)
is layered on the same pair output in `llm/cluster.py`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm.text import md5_int60, tokens
from temp_data_pipeline_spark.session import ensure_parallelism


def cap_bucket(
    df: DataFrame, keys: list[str], order_col: str, cap: int | None
) -> DataFrame:
    """Bound LSH bucket size before a self-join.

    A bucket with k rows yields k²/2 candidate pairs in ONE task — a
    corpus with mass-duplicated boilerplate (k copies of a banner page)
    turns the band self-join quadratic. Keeping only the `cap`
    lowest-id rows per bucket bounds any bucket's pair count at cap²/2
    while preserving keep-lowest-id dedup semantics for the capped
    bucket's survivors (every dropped row still matches the bucket's
    minimum id through the retained rows' pairs in the common case of
    true duplicates; genuinely distinct colliders beyond `cap` lose
    recall, which is the documented trade).

    The row_number window partitions by the same keys the self-join
    shuffles on, so the exchange is reused — the cap costs a sort
    within already-required partitions, not an extra shuffle.
    Use `bucket_overflow_stats` to observe what was truncated.
    """
    if cap is None:
        return df
    w = Window.partitionBy(*keys).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def bucket_overflow_stats(
    df: DataFrame, keys: list[str], cap: int
) -> DataFrame:
    """Buckets whose population exceeds `cap` (what cap_bucket drops):
    one row per overflowing bucket with its total count. Run on the
    banded frame when auditing recall loss on a suspect corpus."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > cap)
        .withColumn("n_dropped", F.col("n_rows") - cap)
    )

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact text. The shuffle key is
    xxhash64(text) + the text equality check, so shuffled bytes stay
    small even for long documents."""
    h = F.xxhash64(F.col(text_col)).alias("_h")
    keep = (
        df.select(F.col(id_col), F.col(text_col), h)
        .groupBy("_h", text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def exact_dup_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(keep_id, n_copies) per distinct text."""
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash
# ---------------------------------------------------------------------------


def shingles_of(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token-array column.

    PERF: `tok` must be a plain attribute (a materialized column), not
    a `split(...)` expression — the transform lambda indexes `tok` n
    times per shingle position, and a captured non-attribute
    expression is re-evaluated on every element visit (≈10× slower).
    Route expressions through `tokenized()` first.

    try_element_at: out-of-range picks on short documents yield null,
    which concat_ws skips — identical to DuckDB list indexing (and
    safe under Spark 4's default ANSI mode, where element_at throws).
    """
    starts = F.sequence(F.lit(1), F.greatest(F.size(tok) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            starts,
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(tok, i + j) for j in range(n)]
            ),
        )
    )


def ngrams_of(tok: Column, n: int = 3) -> Column:
    """Positional word n-grams (every occurrence, duplicates kept) —
    the occurrence-counting sibling of `shingles_of` for repetition /
    duplicated-fraction metrics. Same attribute-capture and
    try_element_at rules apply."""
    starts = F.sequence(F.lit(1), F.greatest(F.size(tok) - (n - 1), F.lit(1)))
    return F.transform(
        starts,
        lambda i: F.concat_ws(" ", *[F.try_element_at(tok, i + j) for j in range(n)]),
    )


def tokenized(df: DataFrame, text_col: str, keep: list[str], out: str = "_tok") -> DataFrame:
    """Project `keep` + a materialized token array (explode-of-1
    barrier, so downstream per-element lambdas see an attribute).
    Repartitions single-split sources so the CPU-bound hash work that
    follows uses every core."""
    return ensure_parallelism(df).select(
        *keep, F.explode(F.array(tokens(text_col))).alias(out)
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles straight from text. Convenience/testing
    form — O(tokens·n) re-splits; production paths use
    tokenized() + shingles_of()."""
    return shingles_of(tokens(col), n)


def minhash_signature(
    shingle_col: Column, k: int = 16, hash_fn: str = "xxhash64"
) -> Column:
    """k-minimum independent hash values over the shingle set.

    hash_fn="xxhash64": production path — k seeded xxhash64 hashes.
    hash_fn="md5": oracle-parity path — md5(seed || shingle) first 15
    hex chars as int60, reproducible in DuckDB SQL.

    Single fold over the shingle array: the accumulator is the
    length-k min-vector, updated with all k hashes of each shingle in
    one visit. (k separate array_min(transform(...)) expressions would
    make CollapseProject inline — and re-evaluate — the upstream
    tokenize/shingle expression k times.)
    """
    def _hashes(s: Column) -> Column:
        if hash_fn == "xxhash64":
            return F.array(*[F.xxhash64(F.lit(i), s) for i in range(k)])
        return F.array(
            *[
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"s{i}:"), s)), 1, 15), 16, 10
                ).cast("long")
                for i in range(k)
            ]
        )

    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), k)
    return F.aggregate(
        shingle_col,
        init,
        lambda acc, s: F.zip_with(acc, _hashes(s), lambda a, h: F.least(a, h)),
    )


def lsh_band_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 4,
    max_bucket: int | None = 1000,
    materialize: bool = True,
) -> DataFrame:
    """Candidate pairs from banded signatures.

    Explode the signature into `bands` band-hashes, self-join on
    (band, band_hash), keep (a < b) pairs. Distinct pairs only.
    Buckets are capped at `max_bucket` rows (lowest ids kept) so a
    mass-duplicated document can't make one task quadratic.
    """
    # explode-of-1 barrier: ensure the signature is a plain attribute
    # before the band expressions reference it several times each
    sig_attr = df.select(
        F.col(id_col), F.explode(F.array(F.col(sig_col))).alias("__sig")
    )
    banded = sig_attr.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("__sig"),
                                b * (F.size(F.col("__sig")) / bands).cast("int") + 1,
                                (F.size(F.col("__sig")) / bands).cast("int"),
                            ),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    # materialize capped bands before the self-join — else both sides
    # re-run the caller's whole signature pipeline (shingle + minhash)
    banded = cap_bucket(banded, ["band", "band_hash"], id_col, max_bucket)
    if materialize:
        banded = banded.localCheckpoint()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard similarity of two array-set columns."""
    inter = F.size(F.array_intersect(set_a, set_b)).cast("double")
    union = F.size(F.array_union(set_a, set_b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    max_bucket: int | None = 1000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Full MinHash-LSH near-dup removal: keep docs that do NOT match a
    lower-id doc at ≥ threshold exact Jaccard (candidates from LSH).

    hash_fn="xxhash64" is the production path; "md5" uses the
    md5-int60 family reproducible in DuckDB SQL (oracle parity).

    Run `exact_dedup` first on corpora with mass-duplicated texts —
    exact copies collapse in one linear shuffle and never reach the
    (capped) band buckets."""
    # explode-of-1 barriers keep tokens, shingles, and the signature as
    # real attributes (evaluated once per row each), not inlined exprs
    with_tok = tokenized(df, text_col, [id_col])
    with_sh = with_tok.select(
        F.col(id_col),
        F.explode(F.array(shingles_of(F.col("_tok"), n_shingle))).alias("_sh"),
    )
    with_sig = with_sh.select(
        F.col(id_col),
        F.col("_sh"),
        F.explode(
            F.array(minhash_signature(F.col("_sh"), k, hash_fn=hash_fn))
        ).alias("_sig"),
    )
    pairs = lsh_band_pairs(with_sig, id_col, "_sig", bands, max_bucket=max_bucket)
    sh_only = with_sh.select(F.col(id_col), F.col("_sh"))
    verified = (
        pairs.join(
            sh_only.select(
                F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a")
            ),
            "id_a",
        )
        .join(
            sh_only.select(
                F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b")
            ),
            "id_b",
        )
        .withColumn("_jac", jaccard(F.col("_sh_a"), F.col("_sh_b")))
        .filter(F.col("_jac") >= threshold)
        .select("id_a", "id_b", "_jac")
    )
    dup_ids = verified.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dup_ids, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given (id_a, id_b) pairs."""
    sh = tokenized(df, text_col, [id_col]).select(
        F.col(id_col), shingles_of(F.col("_tok"), n).alias("_sh")
    )
    return (
        pairs.join(sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_b")), "id_b")
        .select("id_a", "id_b", jaccard(F.col("_a"), F.col("_b")).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_vote_udf(nbits: int):
    """Arrow pandas UDF: token-hash array → packed SimHash signature.

    The per-bit majority vote is a (tokens × nbits) bit-matrix
    reduction — the same dense-kernel class as plane_bands_udf, and
    like it, >5× faster as one numpy expression per Arrow batch than
    as an interpreted Catalyst fold (higher-order functions are not
    codegen'd; the fold walks tokens×nbits expression-tree nodes per
    row).  Input hashes stay JVM-computed (xxhash64 / md5_int60), so
    the hash definition — and DuckDB oracle parity — lives in exactly
    one place; this kernel is integer-only (no float summation-order
    concerns).  Bit 63 packs via uint64→int64 view, identical to the
    fold's two's-complement -(1<<63) place value.
    """
    import numpy as np

    shifts = np.arange(nbits, dtype=np.uint64)

    @F.pandas_udf("long")
    def _sig(tok_h: pd.Series) -> pd.Series:
        out = []
        for arr in tok_h:
            if arr is None:
                out.append(None)
                continue
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            if len(h) == 0:
                out.append(0)
                continue
            bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            packed = ((votes > 0).astype(np.uint64) << shifts).sum(
                dtype=np.uint64
            )
            out.append(int(packed.astype(np.int64)))
        return pd.Series(out, dtype="object")

    return _sig


def simhash(
    col: Column | str,
    nbits: int = 64,
    hash_fn: str = "xxhash64",
    kernel: str = "arrow",
) -> Column:
    """SimHash signature over distinct tokens: per-bit majority vote of
    token hashes; bit set when the vote is strictly positive.

    Token hashing is always JVM-side (codegen); the vote/pack runs as
    an Arrow numpy kernel by default (see simhash_vote_udf), or as a
    pure-Catalyst fold with kernel="fold" — one fold carrying the
    length-nbits vote counter (an nbits-separate-aggregates
    formulation would make CollapseProject re-evaluate tokenize+hash
    nbits times).  Both produce identical signatures (integer-only
    arithmetic); the fold keeps plans UDF-free where that matters
    more than the ~5× vote-stage speedup.
    """
    t = F.array_distinct(tokens(col))
    if hash_fn == "xxhash64":
        tok_h = F.transform(t, lambda x: F.xxhash64(x))
    else:
        tok_h = F.transform(t, lambda x: md5_int60(x))
        nbits = min(nbits, 60)

    if kernel == "arrow":
        return simhash_vote_udf(nbits)(tok_h)

    votes = F.aggregate(
        tok_h,
        F.array_repeat(F.lit(0), nbits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[F.shiftright(h, b).bitwiseAND(1).cast("int") for b in range(nbits)]
            ),
            lambda c, bit: c + F.when(bit == 1, 1).otherwise(-1),
        ),
    )
    # bit 63 is the sign bit: 1<<63 only fits a long as its
    # two's-complement negative value
    place = F.array(
        *[
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
            for b in range(nbits)
        ]
    )
    return F.aggregate(
        F.zip_with(
            votes,
            place,
            lambda c, v: F.when(c > 0, v).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int | None = 1000,
    hash_fn: str = "xxhash64",
    nbits: int = 64,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the signature into 4 16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal), join
    on chunk equality, verify with bit_count(xor). Chunk buckets are
    capped at `max_bucket` rows (see cap_bucket). hash_fn="md5" is the
    DuckDB-reproducible 60-bit variant (oracle parity); the pigeonhole
    still holds — 4 chunks cover bits 0..63 and 60-bit signatures just
    leave the top chunk 12 bits wide."""
    sigs = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(F.array(simhash(text_col, nbits=nbits, hash_fn=hash_fn))).alias(
            "_sig"
        ),
    )
    chunks = sigs.select(
        id_col,
        "_sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("_sig"), 16 * i).bitwiseAND(0xFFFF)
                    for i in range(4)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    # materialize the capped signature chunks before the self-join:
    # both join sides would otherwise re-run the whole tokenize+hash
    # signature pipeline (measured 2x cold wall-clock at sf0.1). The
    # checkpoint is O(docs·4) skinny rows — the distributed analog of
    # "write signatures once, then join", which is also the 100 TB
    # shape (signatures are a fraction of corpus bytes).
    chunks = cap_bucket(chunks, ["chunk_id", "chunk"], id_col, max_bucket)
    if materialize:
        chunks = chunks.localCheckpoint()
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._sig").alias("_sa"),
            F.col("b._sig").alias("_sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("_sa"), F.col("_sb")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding near-dup (cosine)
# ---------------------------------------------------------------------------


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns via
    zip_with + aggregate — JVM-side, no UDF.

    Elements are cast to double BEFORE multiplying (float×float then
    cast loses precision and diverges from engines that cast first,
    e.g. DuckDB's CAST(x AS DOUBLE[]) oracle path); the sequential
    left-fold accumulation order matches a scalar loop exactly.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def plane_bands_udf(planes, bands: int):
    """Arrow pandas UDF computing hyperplane-LSH band values for a
    vector column: one numpy matmul per Arrow batch instead of
    nbits×dim interpreted Catalyst lambda steps per row (measured
    >10× on the signature stage — dense linear algebra is the one
    place the vectorized-UDF path beats built-in Column algebra,
    because higher-order functions are interpreted, not codegen'd).

    Band b's value packs sign bits of planes [b·per_band, (b+1)·per_band)
    with weight ``1 << i`` — bit-layout-identical to the DuckDB oracle
    (_BAND_SQL in plans/llm_queries.py) and to the previous fold-based
    form.  Sign(dot) is robust to summation-order ulp differences
    except for |dot| ≲ 1e-13·‖v‖‖p‖, a measure-zero event for
    Gaussian planes; the exact-cosine verify stage stays in
    sequential-fold Column form, so emitted VALUES are unaffected.
    """
    import numpy as np

    mat = np.asarray(planes, dtype=np.float64).T  # (dim, nbits)
    nbits = mat.shape[1]
    per_band = nbits // bands
    weights = (np.int64(1) << np.arange(per_band, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def _bands(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (m @ mat) >= 0.0  # (n, nbits)
        vals = bits.reshape(len(m), bands, per_band).astype(np.int64) @ weights
        return pd.Series(list(vals))

    return _bands


def l2_normalize_udf():
    """Arrow pandas UDF: L2-normalize an array<float/double> column in
    float64 (zero-norm vectors pass through unscaled, matching the
    ``CASE WHEN nrm > 0`` oracle form). Batch numpy replaces two
    interpreted 64-element folds per row."""
    import numpy as np

    @F.pandas_udf("array<double>")
    def _norm(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        n = np.sqrt((m * m).sum(axis=1, keepdims=True))
        np.divide(m, n, out=m, where=n > 0)
        return pd.Series(list(m))

    return _norm


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    nbits: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket: int | None = 1000,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate vectors via banded random-hyperplane LSH:
    nbits sign bits (deterministic planes from seed) split into
    `bands` chunks; candidates share at least one chunk (requiring the
    full signature to match has vanishing recall below cosine ≈ 0.95);
    exact cosine verifies candidates. Emits pairs ≥ threshold.
    Band buckets are capped at `max_bucket` rows (see cap_bucket).

    Verify is BUCKET-LOCAL BLOCK COMPUTE (the FAISS-style shape):
    every capped band bucket ships its ≤max_bucket normalized rows to
    ONE applyInPandas group, which scores all within-bucket pairs as
    a single numpy matmul and emits only survivors. Candidates never
    exist as rows — versus the previous (band self-join → pair dedup
    → two vector join-backs → per-pair dot) plan this removes the
    quadratic candidate exchange entirely: what moves is bucket rows
    (corpus × bands × vector bytes, cap-bounded per bucket), not
    candidate pairs × two vectors (orders of magnitude more at any
    realistic collision rate). A pair sharing several buckets scores
    in each; the final dedup shuffles survivors only.
    """
    import random

    import numpy as np

    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"])
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(nbits)]

    # one scan computes both Arrow kernels (normalize + band matmul)
    rows = ensure_parallelism(df).select(
        F.col(id_col),
        l2_normalize_udf()(F.col(vec_col)).alias("_vn"),
        F.posexplode(plane_bands_udf(planes, bands)(F.col(vec_col))).alias(
            "band_id", "band_val"
        ),
    )
    rows = cap_bucket(rows, ["band_id", "band_val"], id_col, max_bucket)
    if materialize:
        rows = rows.localCheckpoint()

    thr = float(threshold)
    _id = id_col

    def _bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[_id].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(pdf["_vn"].to_numpy())[order]
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        upper = sims[iu]
        keep = upper >= thr
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][keep]],
                "id_b": ids[iu[1][keep]],
                "cosine": upper[keep],
            }
        )

    # cap_bucket's window and this groupBy share the (band_id,
    # band_val) clustering — one exchange feeds both. The id schema
    # follows the input (string/decimal ids work; ordering semantics
    # are whatever `<` means for the type, as in the join-based plan).
    id_type = dict(rows.dtypes)[id_col]
    pairs = rows.groupBy("band_id", "band_val").applyInPandas(
        _bucket_pairs, f"id_a {id_type}, id_b {id_type}, cosine double"
    )
    # max over co-bucketed duplicates: different-shaped per-bucket
    # matmuls may disagree in the last ulp, and dropDuplicates would
    # keep an arbitrary one — max is deterministic
    return pairs.groupBy("id_a", "id_b").agg(F.max("cosine").alias("cosine"))

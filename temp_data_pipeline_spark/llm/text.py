"""Text analysis operators for training-data pipelines.

Everything here is a pure Column expression over built-in
`pyspark.sql.functions` — JVM-side, whole-stage-codegen-friendly, no
Python UDFs in the hot path. At 100 TB these run as map-only stages
with zero shuffles.

Two hash families are provided where hashing is involved:
- ``xxhash64`` (Spark built-in) — the fast production path;
- ``md5``-derived 60-bit ints — slower, but bit-identical to what
  DuckDB can compute, which is what the oracle-tier queries use
  (plans/llm_queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-language stopword markers (tiny public stopword lists) for the
# n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "is", "in"),
    "fr": ("le", "la", "les", "et", "un", "une", "est"),
    "es": ("el", "los", "las", "y", "un", "una", "es"),
    "de": ("der", "die", "das", "und", "ein", "ist", "nicht"),
}


def tokens(col: Column | str, pattern: str = " ") -> Column:
    """Whitespace tokenization. Single-space split keeps empty tokens —
    deliberately identical to DuckDB ``string_split`` for oracle
    parity. Use ``tokens_regex`` for linguistic tokenization."""
    return F.split(F.col(col) if isinstance(col, str) else col, pattern)


def tokens_regex(col: Column | str) -> Column:
    """BPE-ish tokenizer: words, numbers, or single punctuation marks —
    the pre-tokenization regex family used by GPT-style BPE vocabs."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)
    return toks


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_count(col: Column | str) -> Column:
    return F.length(F.col(col) if isinstance(col, str) else col)


def avg_token_len(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - (F.size(tokens(c)) - 1)).cast("double") / F.size(tokens(c))


def distinct_token_ratio(col: Column | str) -> Column:
    """Lexical diversity: |set(tokens)| / |tokens| — near-0 for
    boilerplate/spam, near-1 for natural text."""
    t = tokens(col)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    t = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(t, lambda x: F.array_contains(sw, x))).cast("double") / F.size(t)


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[^\w\s]", "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.greatest(
        F.length(c), F.lit(1)
    )


def quality_score(col: Column | str, min_chars: int = 100, max_chars: int = 20000) -> Column:
    """Composite [0,1] quality heuristic: length gate × lexical
    diversity × (1 − punctuation excess). The standard cheap pre-filter
    before expensive dedup/classification stages."""
    c = F.col(col) if isinstance(col, str) else col
    length_ok = (F.length(c) >= min_chars) & (F.length(c) <= max_chars)
    score = (
        F.when(length_ok, F.lit(1.0)).otherwise(F.lit(0.3))
        * distinct_token_ratio(c)
        * (1 - F.least(punct_ratio(c) * 2, F.lit(1.0)))
    )
    return F.round(score, 6)


# Gopher/MassiveText document-quality rules (Rae et al. 2021,
# "Scaling Language Models", Appendix A1.1) — the published filter
# suite LLM corpus pipelines start from.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flags(
    col: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> dict[str, Column]:
    """The Gopher rule set as named boolean Columns (all JVM-side
    expressions, map-only). Keys: word_count_ok, mean_word_len_ok,
    symbol_ratio_ok, bullet_ok, ellipsis_ok, alpha_ok, stopword_ok,
    gopher_pass (conjunction). Thresholds default to the published
    values; pass a different config per corpus."""
    c = F.col(col) if isinstance(col, str) else col
    t = tokens(c)
    n_words = F.size(t)
    lines = F.split(c, "\n")
    n_lines = F.size(lines)

    def occurrences(needle: str, width: int) -> Column:
        return (F.length(c) - F.length(F.regexp_replace(c, needle, ""))) / width

    n_symbols = (
        occurrences(r"\#", 1) + occurrences(r"\.\.\.", 3) + occurrences("…", 1)
    )
    mean_len = avg_token_len(c)
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("- ") | l.startswith("* ") | l.startswith("• "),
            )
        ).cast("double")
        / F.greatest(n_lines, F.lit(1))
    )
    ellipsis_frac = (
        F.size(
            F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
        ).cast("double")
        / F.greatest(n_lines, F.lit(1))
    )
    alpha_frac = (
        F.size(F.filter(t, lambda w: w.rlike("[a-zA-Z]"))).cast("double")
        / F.greatest(n_words, F.lit(1))
    )
    sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(F.array_intersect(F.array_distinct(t), sw))

    flags = {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_ok": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "symbol_ratio_ok": (n_symbols / F.greatest(n_words, F.lit(1)))
        <= max_symbol_word_ratio,
        "bullet_ok": bullet_frac <= max_bullet_line_frac,
        "ellipsis_ok": ellipsis_frac <= max_ellipsis_line_frac,
        "alpha_ok": alpha_frac >= min_alpha_word_frac,
        "stopword_ok": stop_hits >= min_stopword_hits,
    }
    combined = None
    for f in flags.values():
        combined = f if combined is None else (combined & f)
    flags["gopher_pass"] = combined
    return flags


def gopher_filter(df, text_col: str = "text", **rule_overrides):
    """Keep only documents passing every Gopher rule. Keyword
    overrides forward to gopher_flags (tune thresholds per corpus —
    e.g. `min_stopword_hits=0` for non-English or synthetic text)."""
    return df.filter(gopher_flags(text_col, **rule_overrides)["gopher_pass"])


def lang_id(col: Column | str) -> Column:
    """Stopword-profile language ID: argmax of per-language marker-token
    counts; 'und' when no profile matches. CASE-chain argmax with a
    fixed tie order (en > fr > es > de) so results are deterministic."""
    t = tokens(col)
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        counts[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    best = F.greatest(*counts.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in ("en", "fr", "es", "de"):
        expr = expr.when(counts[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint_md5(col: Column | str) -> Column:
    """Full-document content fingerprint (hex md5)."""
    return F.md5(F.col(col) if isinstance(col, str) else col)


def md5_int60(col: Column) -> Column:
    """First 15 hex chars of md5 as a non-negative 60-bit long —
    computable identically in DuckDB:
    CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def rolling_hash_of(tok_h: Column, window: int = 8, base: int = 257, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash over a *materialized* token-hash array
    (Rabin-Karp style): the min of per-window hashes — a winnowing-like
    document fingerprint robust to local edits. Pure array expressions,
    no UDF.

    PERF: `tok_h` must be a plain attribute — the window lambda slices
    it per start position, and a captured non-attribute expression is
    re-evaluated on every element visit (turns O(n·w) into O(n²·w))."""
    n = F.size(tok_h)
    starts = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    win_hash = F.transform(
        starts,
        lambda s: F.aggregate(
            F.slice(tok_h, s + 1, window),
            F.lit(0).cast("long"),
            lambda acc, h: F.pmod(acc * base + F.pmod(h, F.lit(mod)), F.lit(mod)),
        ),
    )
    return F.array_min(win_hash)


def rolling_fingerprint(col: Column | str, window: int = 8, base: int = 257, mod: int = (1 << 31) - 1) -> Column:
    """Convenience form of rolling_hash_of straight from text — fine on
    small frames/tests; production paths materialize token hashes first
    (see plans/llm_queries.py)."""
    tok_h = F.transform(tokens(col), lambda x: F.xxhash64(x))
    return rolling_hash_of(tok_h, window, base, mod)


def normalize_text(
    df,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    nfc: bool = True,
) -> "DataFrame":
    """Crawl-text normalization — the cleanup every curation pipeline
    runs before hashing/dedup so that byte-level noise (stray control
    chars, run-on whitespace, decomposed Unicode) can't make identical
    content hash differently:

    1. strip C0/C1 control characters (except \\t \\n),
    2. collapse runs of spaces/tabs to one space; trim each line's
       edges; collapse 3+ newlines to 2 (paragraph-preserving, the
       C4/CCNet convention),
    3. Unicode NFC composition — gated to rows that actually CONTAIN
       non-ASCII (an rlike pre-filter), so the pandas-UDF tier never
       runs on the overwhelmingly-ASCII bulk of a web corpus and the
       hot path stays whole-stage codegen.

    Steps 1–2 are JVM regexp_replace chains (map-only, zero
    shuffles). Step 3 is an Arrow-batched pandas UDF over
    ``unicodedata.normalize`` — Python, but only for the rows no
    JVM builtin can serve, and only when ``nfc=True``.

    Returns (id, text_norm, changed).
    """
    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    from pyspark.sql import functions as F

    def _nfc_fn(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    t = F.col(text_col)
    # 1) control chars (keep \t \n; \r normalizes to \n first)
    t = F.regexp_replace(t, "\r\n?", "\n")
    t = F.regexp_replace(
        t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]", ""
    )
    # 2) whitespace discipline
    t = F.regexp_replace(t, "[ \\t]+", " ")
    t = F.regexp_replace(t, " ?\\n ?", "\n")      # trim line edges
    t = F.regexp_replace(t, "\\n{3,}", "\n\n")
    t = F.trim(t)

    if nfc:
        _nfc = F.pandas_udf(_nfc_fn, "string")

        # materialize the regexp chain once as an attribute, then the
        # NFC gate references it twice without re-evaluation; original
        # text rides along so `changed` needs no join back
        staged = df.select(
            F.col(id_col), F.col(text_col).alias("_orig"), t.alias("_t")
        )
        norm = F.when(
            F.col("_t").rlike("[^\\x00-\\x7F]"), _nfc(F.col("_t"))
        ).otherwise(F.col("_t"))
    else:
        staged = df.select(
            F.col(id_col), F.col(text_col).alias("_orig"), t.alias("_t")
        )
        norm = F.col("_t")
    return staged.select(
        F.col(id_col),
        norm.alias("text_norm"),
        (norm != F.col("_orig")).alias("changed"),
    )

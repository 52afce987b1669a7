"""BPE tokenization: bounded-sample fit + distributed JVM-only apply.

Byte-pair encoding (Sennrich et al. 2016) is the tokenizer family of
GPT/LLaMA-class models; a training-data pipeline needs it twice —
fitting a vocabulary on a corpus sample, and encoding the full corpus
to count/pack real model tokens.

Fit follows the engine's bounded-driver-fit pattern (fit_kmeans,
fit_pq): classic BPE training is inherently sequential (each merge
depends on the previous), so it runs driver-side on an explicitly
bounded, deterministically chosen document sample, exactly how
production tokenizers are trained (on a corpus slice, never the full
100 TB).

Apply is where scale lives, and it is PURE JVM COLUMN ALGEBRA — no
Python UDF, no per-row interpreter:

  1. wrap every non-space character c as \\x01c\\x02 (one regexp);
  2. fold the ranked merge list with plain string `replace`:
     merge (a,b) → replace(\\x01a\\x02\\x01b\\x02 → \\x01ab\\x02).
     The sentinel wrapping is what makes this EXACT classic BPE:
     adjacent candidate matches share no characters (unlike
     space-padded symbols), so leftmost non-overlapping replacement
     reproduces the reference regex-with-lookaround semantics — and
     plain `replace` exists identically in DuckDB, which makes the
     whole encode oracle-replayable via list_reduce;
  3. unwrap: \\x02\\x01 boundaries become the subword separator.

Spaces are never wrapped, so merges cannot cross word boundaries —
the per-word independence of classic BPE without per-word explosion:
each document is encoded in ONE pass over one string per merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_bpe", "bpe_encode_expr", "fit_bpe", "fit_bpe_distributed"]

_S, _E = "\x01", "\x02"  # symbol start/end sentinels


def fit_bpe(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 32,
    sample_docs: int = 4096,
) -> list[tuple[str, str]]:
    """Classic BPE training on a bounded, deterministic sample: the
    first ``sample_docs`` documents by id. Each round counts adjacent
    symbol pairs (frequency-weighted by word count) and merges the
    most frequent pair everywhere; ties break lexicographically so
    the fit is reproducible across engines and runs.

    Returns the ranked merge list [(a, b), ...] — feed to apply_bpe.
    """
    rows = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(text_col).alias("t"))
        .orderBy(F.col(id_col))
        .limit(sample_docs)
        .collect()
    )
    word_freq: dict[tuple[str, ...], int] = {}
    for r in rows:
        for w in r["t"].split(" "):
            if w:
                key = tuple(w)
                word_freq[key] = word_freq.get(key, 0) + 1
    return _merge_loop(word_freq, n_merges)


def fit_bpe_distributed(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 32,
    max_vocab_words: int | None = 1 << 17,
) -> list[tuple[str, str]]:
    """BPE training on the FULL corpus's word statistics: ONE
    distributed word-frequency aggregation over every document (the
    only pass that touches the data — at 100 TB this is a plain
    explode→groupBy shuffle), then the same deterministic merge loop
    as ``fit_bpe`` over the aggregated (word, freq) table, which is
    VOCABULARY-sized, not corpus-sized.  This removes ``fit_bpe``'s
    sample bias — the pair counts are exact over the whole corpus —
    while keeping the sequential merge loop on a driver-bounded
    input.

    ``max_vocab_words`` caps the driver table at the most frequent
    words (ties broken lexicographically for reproducibility); the
    cap is LOUD, and ``None`` disables it (exact on any vocabulary —
    the conformance query's mode, so the SQL oracle corresponds at
    every scale).  Dropped tail words are the low-frequency mass that
    barely moves pair counts — the standard fastBPE/HuggingFace
    trainer shape (word counts first, merges over the count table).
    The aggregated table is persisted across the size probe and the
    collect, so the corpus-sized scan runs ONCE either way.

    Returns the ranked merge list [(a, b), ...] — feed to apply_bpe,
    identical contract to ``fit_bpe``."""
    words = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.split(F.col(text_col), " ", -1)
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_vocab_words is None:
        rows = words.collect()
    else:
        cached = words.persist()
        try:
            n_words = cached.count()
            take = cached
            if n_words > max_vocab_words:
                print(
                    f"fit_bpe_distributed: vocabulary {n_words} words "
                    f"exceeds max_vocab_words={max_vocab_words}; "
                    "training on the most frequent cap (tail mass "
                    "dropped — raise the cap to include it)"
                )
                take = cached.orderBy(
                    F.col("freq").desc(), F.col("w")
                ).limit(max_vocab_words)
            rows = take.collect()
        finally:
            cached.unpersist()
    word_freq: dict[tuple[str, ...], int] = {}
    for r in rows:
        key = tuple(r["w"])
        word_freq[key] = word_freq.get(key, 0) + int(r["freq"])
    return _merge_loop(word_freq, n_merges)


def _merge_loop(
    word_freq: dict[tuple[str, ...], int], n_merges: int
) -> list[tuple[str, str]]:
    """The classic sequential BPE merge loop over a (word-symbols ->
    frequency) table — shared by the sampled and distributed fits;
    deterministic (ties: highest count, then lexicographically
    smallest pair)."""
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, freq in word_freq.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + freq
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        merges.append(best)
        a, b = best
        ab = a + b
        new_freq: dict[tuple[str, ...], int] = {}
        for sym, freq in word_freq.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_freq[t] = new_freq.get(t, 0) + freq
        word_freq = new_freq
    return merges


def bpe_encode_expr(
    col: Column | str, merges: list[tuple[str, str]], sep: str = "|"
) -> Column:
    """Column expression encoding whitespace-separated text with the
    ranked ``merges``: subwords within a word join with ``sep``,
    original spaces stay spaces. All built-in string functions —
    codegen-friendly, zero Python, and replayable in DuckDB with the
    byte-identical replace sequence."""
    c = F.col(col) if isinstance(col, str) else col
    return _unwrap(_encoded(c, merges), sep)


def _encoded(c: Column, merges: list[tuple[str, str]]) -> Column:
    # raw \x01/\x02 bytes in crawled text would read as sentinels and
    # corrupt the unwrap — strip them first (mirror this in any oracle)
    clean = F.regexp_replace(c, f"[{_S}{_E}]", "")
    wrapped = F.regexp_replace(clean, "([^ ])", f"{_S}$1{_E}")
    if not merges:  # empty F.array() types as array<void> — skip the fold
        return wrapped
    pairs = F.array(
        *[
            F.struct(
                F.lit(f"{_S}{a}{_E}{_S}{b}{_E}").alias("p"),
                F.lit(f"{_S}{a}{b}{_E}").alias("r"),
            )
            for a, b in merges
        ]
    )
    return F.aggregate(pairs, wrapped, lambda acc, m: F.replace(acc, m["p"], m["r"]))


def _unwrap(enc: Column, sep: str) -> Column:
    """Sentinel-wrapped encoding → human form: within-word subword
    boundaries become ``sep``, sentinels vanish, spaces stay."""
    return F.replace(
        F.replace(F.replace(enc, F.lit(_E + _S), F.lit(sep)), F.lit(_S), F.lit("")),
        F.lit(_E),
        F.lit(""),
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "|",
) -> DataFrame:
    """Encode every document: (id, bpe, n_subwords). ``n_subwords``
    is the real model-token count — the number the chunker/packer and
    token-budget reports should use instead of whitespace words.
    Map-only; runs at scan speed at any corpus size."""
    c = F.col(text_col)
    enc = _encoded(c, merges)
    # every subword is wrapped exactly once → count of \x01 = tokens
    n_sub = (F.length(enc) - F.length(F.replace(enc, F.lit(_S), F.lit("")))).cast(
        "long"
    )
    return df.select(
        F.col(id_col), _unwrap(enc, sep).alias("bpe"), n_sub.alias("n_subwords")
    )

"""Text analysis operators (SURVEY.md §2 C4 + training-data ops).

All pure built-in column expressions (codegen'd, no UDF): token
counting, quality scoring, language-ID heuristic, document
fingerprinting. Each has an exact SQL equivalent for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smallquery_spark.operators.dedup import tokens

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# (Deterministic rule — the oracle replicates it verbatim; real quality
# would come from a trained model, out of scope for the v1 image.)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "zh": ["的", "了", "是"],
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text, lowercase=False))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish subword proxy: alnum runs plus single non-space symbols
    (RE2-safe pattern — no lookarounds — so the oracle matches exactly).

    ~4 chars/token heuristics are worse; counting alnum runs + symbols
    tracks real tokenizer counts closely enough for data budgeting.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def quality_features(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append length / token / punctuation / stopword-ratio features and
    a composite quality score in [0, 1]."""
    c = F.col(text_col)
    toks = tokens(text_col)
    n_tok = F.size(toks)
    stop = F.array([F.lit(w) for ws in LANG_MARKERS.values() for w in ws])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    avg_word = (F.length(c) - (n_tok - 1)) / n_tok
    return (
        df.withColumn("n_chars_m", F.length(c))
        .withColumn("n_tokens", n_tok)
        .withColumn("punct_ratio", n_punct / F.greatest(F.length(c), F.lit(1)))
        .withColumn("stopword_ratio", n_stop / F.greatest(n_tok, F.lit(1)))
        .withColumn("avg_word_len", avg_word)
        .withColumn(
            "quality_score",
            F.least(
                F.lit(1.0),
                F.greatest(
                    F.lit(0.0),
                    0.5 * F.least(F.col("n_tokens") / 50.0, F.lit(1.0))
                    + 0.3 * (1.0 - F.col("punct_ratio"))
                    + 0.2 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)),
                ),
            ),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word vote per language; highest count wins (ties by
    language code order). Deterministic, SQL-replicable."""
    toks = tokens(text_col)
    out = df
    for lang, markers in LANG_MARKERS.items():
        marks = F.array([F.lit(m) for m in markers])
        out = out.withColumn(
            f"__n_{lang}", F.size(F.filter(toks, lambda t: F.array_contains(marks, t)))
        )
    scores = F.array(
        *[
            F.struct(
                F.col(f"__n_{lang}").alias("n"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # max by (n, reversed-lang) with ties to the earliest code: sort desc
    # by n, asc by lang → element 1.
    best = F.sort_array(scores, asc=False)  # struct sort: by n desc then lang desc
    out = out.withColumn(
        "pred_lang",
        F.when(best[0]["n"] == 0, F.lit("unknown")).otherwise(best[0]["lang"]),
    )
    return out.drop(*[f"__n_{lang}" for lang in LANG_MARKERS])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set (robust to token shuffling — catches permuted near-dups)."""
    return df.withColumn(
        "fingerprint",
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(tokens(text_col))), " "
            )
        ),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into overlapping token windows (context-window
    prep for training). Chunk ``i`` covers tokens
    ``[i*stride, i*stride + size)``; windows start while ``i*stride <
    n_tokens`` so every token lands in ≥1 chunk (tail chunks may be
    short). Pure built-ins: tokenize → posexplode(sequence of starts) →
    slice — a narrow fan-out, no shuffle, no UDF; at 100 TB this is the
    map stage feeding the tokenizer."""
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return (
        df.withColumn("__toks", toks)
        .withColumn("__n", n)
        .select(
            "*",
            F.posexplode(starts).alias("chunk_idx", "__start"),
        )
        .filter((F.col("__start") < F.col("__n")) | (F.col("__n") == 0))
        .withColumn(
            "chunk_text",
            F.array_join(F.slice("__toks", F.col("__start") + 1, size), " "),
        )
        .withColumn(
            "n_chunk_tokens",
            F.least(F.lit(size), F.col("__n") - F.col("__start")).cast("int"),
        )
        .withColumn("chunk_idx", F.col("chunk_idx").cast("bigint"))
        .drop("__toks", "__n", "__start")
    )

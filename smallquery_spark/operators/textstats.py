"""Text analysis operators (SURVEY.md §2 C4 + training-data ops).

Token counting, quality scoring, language-ID heuristic, document
fingerprinting. Each has an exact SQL equivalent for the DuckDB oracle.

The per-document INTEGER counts behind quality/fingerprint run as one
Arrow-vectorized pandas UDF pass (see _text_counts_udf for the measured
why: interpreted higher-order lambdas, re-inlined by filter pushdown,
cost ~35us/row vs <1us vectorized); every derived float and everything
else here stays pure built-in column expressions, so oracle parity is
carried by Catalyst arithmetic, not Python.
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


def _text_counts_udf():
    """Arrow-vectorized struct UDF computing the four INTEGER counts the
    quality features derive from: n_chars, n_tokens, n_punct, n_stop.

    Why a pandas UDF for counts only: the pure-expression version is
    re-evaluated wherever Catalyst inlines it — a filter on
    quality_score pushed below the feature projection duplicates the
    tokenizing split() up to 9x per row and the interpreted
    stopword-filter lambda 2x (measured: 17s for 500k docs at gen-sf10).
    Catalyst extracts Python UDFs into one ArrowEvalPython node, so the
    counts are computed exactly once, vectorized. Every FLOAT (ratios,
    quality_score) stays a Catalyst expression over these ints —
    bit-for-bit identical to the previous plan and to the oracles.

    Parity notes (must match Spark's JVM semantics exactly):
    - tokens: split(trim(lower(text)), '\\s+') — Java \\s is ASCII-only
      and trim strips ' ' only, hence re.ASCII and strip(' ').
    - n_punct: length - length(regexp_replace(text, '[^\\w\\s]', ''))
      with Java ASCII \\w — re.ASCII again (CJK chars count as punct on
      both engines, and in DuckDB's RE2 oracle).
    - counts are Spark INT (length/size return int32).
    """
    import re

    import pandas as pd

    stop = frozenset(w for ws in LANG_MARKERS.values() for w in ws)
    ws_re = re.compile(r"\s+", re.ASCII)
    punct_re = re.compile(r"[^\w\s]", re.ASCII)

    def counts(text):
        n_chars, n_toks, n_punct, n_stop = [], [], [], []
        for s in text:
            if s is None:
                n_chars.append(None)
                n_toks.append(None)
                n_punct.append(None)
                n_stop.append(None)
                continue
            toks = ws_re.split(s.lower().strip(" "))
            n_chars.append(len(s))
            n_toks.append(len(toks))
            n_punct.append(len(s) - len(punct_re.sub("", s)))
            n_stop.append(sum(1 for w in toks if w in stop))
        return pd.DataFrame(
            {
                "n_chars": pd.array(n_chars, dtype="Int32"),
                "n_tokens": pd.array(n_toks, dtype="Int32"),
                "n_punct": pd.array(n_punct, dtype="Int32"),
                "n_stop": pd.array(n_stop, dtype="Int32"),
            }
        )

    counts.__annotations__ = {"text": pd.Series, "return": pd.DataFrame}
    # asNondeterministic: the function IS deterministic, but the flag
    # stops PushPredicateThroughProject from substituting the UDF call
    # into downstream filter conditions — without it a quality filter
    # makes Catalyst evaluate the UDF twice (one ArrowEvalPython below
    # the filter, another for the surviving projection).
    return F.pandas_udf(
        counts,
        "struct<n_chars: int, n_tokens: int, n_punct: int, n_stop: int>",
    ).asNondeterministic()


def _text_profile_udf():
    """One-pass variant of _text_counts_udf that also emits the
    sorted-distinct-token md5 fingerprint (see fingerprint() for the
    parity argument). Pipelines that need both (c10/c31) tokenize and
    Arrow-transfer each document ONCE instead of twice."""
    import hashlib
    import re

    import pandas as pd

    stop = frozenset(w for ws in LANG_MARKERS.values() for w in ws)
    ws_re = re.compile(r"\s+", re.ASCII)
    punct_re = re.compile(r"[^\w\s]", re.ASCII)

    def profile(text):
        n_chars, n_toks, n_punct, n_stop, fps = [], [], [], [], []
        for s in text:
            if s is None:
                n_chars.append(None)
                n_toks.append(None)
                n_punct.append(None)
                n_stop.append(None)
                fps.append(None)
                continue
            toks = ws_re.split(s.lower().strip(" "))
            n_chars.append(len(s))
            n_toks.append(len(toks))
            n_punct.append(len(s) - len(punct_re.sub("", s)))
            n_stop.append(sum(1 for w in toks if w in stop))
            fps.append(
                hashlib.md5(
                    " ".join(sorted(set(toks))).encode("utf-8")
                ).hexdigest()
            )
        return pd.DataFrame(
            {
                "n_chars": pd.array(n_chars, dtype="Int32"),
                "n_tokens": pd.array(n_toks, dtype="Int32"),
                "n_punct": pd.array(n_punct, dtype="Int32"),
                "n_stop": pd.array(n_stop, dtype="Int32"),
                "fingerprint": fps,
            }
        )

    profile.__annotations__ = {"text": pd.Series, "return": pd.DataFrame}
    # asNondeterministic: see _text_counts_udf — single-evaluation pin.
    return F.pandas_udf(
        profile,
        "struct<n_chars: int, n_tokens: int, n_punct: int, n_stop: int,"
        " fingerprint: string>",
    ).asNondeterministic()


def quality_features(
    df: DataFrame, text_col: str = "text", with_fingerprint: bool = False
) -> DataFrame:
    """Append length / token / punctuation / stopword-ratio features and
    a composite quality score in [0, 1]; with_fingerprint=True also
    appends the near-dup fingerprint from the SAME tokenization pass.

    Integer counts come from one Arrow-vectorized pass (see
    _text_counts_udf for why); every derived float below is the same
    Catalyst expression as always, so results are bit-identical to the
    pure-expression formulation."""
    if with_fingerprint:
        tc = _text_profile_udf()(F.col(text_col))
    else:
        tc = _text_counts_udf()(F.col(text_col))
    df = df.withColumn("__tc", tc)
    n_chars = F.col("__tc.n_chars")
    n_tok = F.col("__tc.n_tokens")
    n_punct = F.col("__tc.n_punct")
    n_stop = F.col("__tc.n_stop")
    avg_word = (n_chars - (n_tok - 1)) / n_tok
    if with_fingerprint:
        df = df.withColumn("fingerprint", F.col("__tc.fingerprint"))
    return (
        df.withColumn("n_chars_m", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("punct_ratio", n_punct / F.greatest(n_chars, F.lit(1)))
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
        .drop("__tc")
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
    token set (robust to token shuffling — catches permuted near-dups).

    Arrow-vectorized for the same reason as _text_counts_udf: the
    tokenize -> distinct -> sort -> md5 chain is interpreted per element
    as built-in higher-order expressions and gets re-inlined wherever
    the fingerprint column is referenced. Parity: same ASCII-\\s
    tokenization; Python sorted() on str equals Spark's array_sort
    (UTF-8 byte order preserves codepoint order); md5 hex is lowercase
    on both; set() == array_distinct since order is re-sorted anyway.
    """
    import hashlib
    import re

    import pandas as pd

    ws_re = re.compile(r"\s+", re.ASCII)

    def fp(text):
        out = []
        for s in text:
            if s is None:
                out.append(None)
                continue
            toks = sorted(set(ws_re.split(s.lower().strip(" "))))
            out.append(hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest())
        return pd.Series(out)

    fp.__annotations__ = {"text": pd.Series, "return": pd.Series}
    return df.withColumn(
        "fingerprint",
        F.pandas_udf(fp, "string").asNondeterministic()(F.col(text_col)),
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

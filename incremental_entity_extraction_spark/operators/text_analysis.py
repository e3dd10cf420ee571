"""Text-analysis operators for large-scale training-data pipelines.

All pure JVM-side column expressions (whole-stage codegen; no Python in the
hot path): language ID (stopword-ratio heuristic), quality scoring,
token counting (whitespace + regex), and a position-weighted rolling
document fingerprint.

These extend the engine beyond the reference's operator set for the
100 TB training-data use case; they run over any table with a text column
(e.g. the ``documents`` testdata table or transcript turns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small fixed English stopword list (public, standard)
EN_STOPWORDS = (
    "the a an of to and in on for with from by at is was were be as it this "
    "that are has have had not no or but if then so what when where who how"
).split()

TOKEN_PATTERN = "[a-zA-Z0-9]+"
FINGERPRINT_MOD = 2147483647  # 2^31 - 1 (Mersenne prime)


def tokens_col(text: Column | str) -> Column:
    """Tokenize: lowercase alnum runs (matches the featurizer's tokenizer)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(c), "[^a-z0-9]+"), lambda t: F.length(t) > 0
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, "[a-zA-Z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens_col(text)
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    # exact ratio over occurrences: filter membership
    occ = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return occ / F.greatest(F.size(toks), F.lit(1))


def avg_word_len(text: Column | str) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def lang_id(text: Column | str, en_threshold: float = 0.08) -> Column:
    """n-gram-free heuristic language ID: 'en' when the English stopword
    occurrence ratio clears the threshold, else 'unknown'."""
    return F.when(stopword_ratio(text) >= F.lit(en_threshold), F.lit("en")).otherwise(
        F.lit("unknown")
    )


def quality_score(text: Column | str) -> Column:
    """[0, 1] heuristic: rewards reasonable length, low punctuation noise,
    and natural word lengths — the standard cheap pre-filter for training
    corpora."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c)
    length_term = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    wordlen = avg_word_len(c)
    wordlen_term = F.when((wordlen >= 2.5) & (wordlen <= 9.0), 1.0).otherwise(0.5)
    return (length_term * 0.4 + punct_term * 0.3 + wordlen_term * 0.3).cast("double")


def fingerprint(text: Column | str) -> Column:
    """Deterministic rolling document fingerprint: position-weighted sum of
    token hashes mod 2^31-1.  Portable across engines (defined over token
    lengths and first-character codes, not engine-specific hash functions)."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)))
    pairs = F.arrays_zip(toks.alias("t"), idx.alias("i"))
    return F.aggregate(
        pairs,
        F.lit(0).cast("long"),
        lambda acc, p: (
            acc
            + p["i"]
            * (F.length(p["t"]) * 131 + F.ascii(F.substring(p["t"], 1, 1)))
        )
        % F.lit(FINGERPRINT_MOD),
    )


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full analysis column set."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("punct_ratio", punct_ratio(text_col))
        .withColumn("stopword_ratio", stopword_ratio(text_col))
        .withColumn("avg_word_len", avg_word_len(text_col))
        .withColumn("lang_pred", lang_id(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )

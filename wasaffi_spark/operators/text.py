"""Text-analysis operators over a document corpus.

Beyond-reference extensions (SURVEY §7.6): token counting, quality
scoring, language guessing, and content fingerprinting, each a pure
DataFrame transformation built from JVM-side built-ins (no Python UDFs in
the hot path — everything stays inside whole-stage codegen and scales
linearly with no shuffle except where aggregation demands it).

All operators are deterministic and have exact DuckDB oracles (see
``wasaffi_spark.operators.catalog``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\s+"


def tokens(text_col: str = "text") -> Column:
    """Lower-cased whitespace tokens."""
    return F.split(F.lower(F.col(text_col)), TOKEN_PATTERN)


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_tokens`` — whitespace token count (codegen-only)."""
    return df.withColumn("n_tokens", F.size(tokens(text_col)).cast("int"))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds quality features + a composite ``quality_score`` in [0,1].

    Components (all exact integer/length arithmetic, so the score is
    reproducible across engines):
      - n_tokens, space_ratio, avg_token_len
      - quality_score = 0.5*min(1, n_tokens/50) + 0.5*min(1, avg_token_len/8)
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    no_space = F.length(F.regexp_replace(text, r"\s", ""))
    n_tokens = F.size(tokens(text_col))
    # try_divide: Spark 4 runs ANSI mode by default, where n/0 raises —
    # an empty document must yield NULL features (matching the SQL
    # oracle's NULL semantics), not kill the job.
    avg_tok = F.try_divide(no_space, n_tokens)
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(50.0)) * 0.5
        + F.least(F.lit(1.0), avg_tok / F.lit(8.0)) * 0.5
    )
    return (
        df.withColumn("n_tokens", n_tokens.cast("int"))
        .withColumn(
            "space_ratio", F.round(F.try_divide(n_chars - no_space, n_chars), 6)
        )
        .withColumn("avg_token_len", F.round(avg_tok, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


# language marker words → guessed language; a transparent n-gram-free
# heuristic (real corpora would use char n-gram profiles; the operator
# shape — pure column expressions, no shuffle — is the point).
LANG_MARKERS = (("the", "en"), ("le", "fr"), ("der", "de"), ("el", "es"), ("的", "zh"))


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    toks = tokens(text_col)
    expr: Column = F.lit("und")
    for marker, lang in reversed(LANG_MARKERS):
        expr = F.when(F.array_contains(toks, marker), lang).otherwise(expr)
    return df.withColumn("lang_guess", expr)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``fingerprint`` — md5 over the sorted distinct token set.

    Word-order-insensitive content fingerprint (the cheap cousin of a
    rolling-hash / winnowing fingerprint); identical texts and
    permutations collide, which is what near-dup blocking wants.
    """
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col))))
    return df.withColumn("fingerprint", F.md5(canon))

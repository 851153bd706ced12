"""Text analysis operators over document tables — all native expressions
except language-ID (which reuses the vectorized langid kernel).

These are the "bytefreq reports as features" applied to the `documents`
table: token counting, quality scoring, fingerprinting, language-ID.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORD_RE = r"\b(?:the|a|and|of|to|is|in|it|you|that)\b"


def token_count_col(text_col: str) -> F.Column:
    """Whitespace tokens + a BPE-ish subword estimate (≈ chars/4 bound)."""
    return F.size(F.split(F.trim(F.col(text_col)), "\\s+"))


# GPT-2-style pre-tokenizer: contraction suffixes, space-prefixed letter /
# digit / punctuation runs.  Lookahead-free so the SAME pattern runs under
# Java regex (Spark) and RE2 (DuckDB oracle) — verified identical on the
# full documents table + adversarial unicode.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count_col(text_col: str) -> F.Column:
    """Number of BPE pre-tokenizer pieces (the realistic LLM-token proxy:
    whitespace folds into the following word; contractions split)."""
    return F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), F.lit(0))
    )


def with_bpe_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document BPE-piece stats: count + mean piece length — native
    expressions, whole-stage codegen (no UDF)."""
    n = bpe_token_count_col(text_col)
    return df.withColumns({
        "n_bpe_tokens": n,
        "avg_bpe_len": F.round(
            F.length(text_col) / F.greatest(n, F.lit(1)), 4
        ),
    })


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_col(text_col)
    return df.withColumns({
        "n_tokens": n_tokens,
        "n_chars_calc": n_chars,
        # BPE-ish upper bound: word-pieces ≈ words + ceil(chars/8) overflow
        "n_subwords_est": n_tokens + F.ceil(n_chars / 8).cast("int"),
        "avg_token_len": F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4),
    })


def quality_score_col(text_col: str) -> F.Column:
    """Heuristic [0,1] quality score — length band + stopword density +
    punctuation sanity, integer-ish arithmetic rounded for stability."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(F.split(F.trim(t), "\\s+"))
    stop_hits = F.size(F.regexp_extract_all(F.lower(t), F.lit(STOPWORD_RE), F.lit(0)))
    digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    len_score = F.when(n_chars.between(20, 5000), F.lit(1.0)).otherwise(
        F.when(n_chars < 20, n_chars / 20.0).otherwise(F.lit(0.5))
    )
    stop_score = F.least(stop_hits * 8.0 / F.greatest(n_tokens, F.lit(1)), F.lit(1.0))
    digit_penalty = F.least(digits * 2.0 / F.greatest(n_chars, F.lit(1)), F.lit(1.0))
    return F.round(
        (len_score * 0.4 + stop_score * 0.4 + (1.0 - digit_penalty) * 0.2), 6
    )


def fingerprint_col(text_col: str, n: int = 4) -> F.Column:
    """Document fingerprint: min-of-ngram-hash (winnowing-style), native.

    md5 on token 4-grams (md5 exists identically in DuckDB → oracle-able);
    the min digest is a deterministic content fingerprint robust to token
    reordering at the margins."""
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, n))))
    return F.array_min(grams)


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID via the shared vectorized kernel (pandas UDF)."""
    from .langid import detect_language

    @F.pandas_udf("string")
    def lang_udf(s: pd.Series) -> pd.Series:
        return detect_language(s)

    return df.withColumn("lang_pred", lang_udf(F.col(text_col)))

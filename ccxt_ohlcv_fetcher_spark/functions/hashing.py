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

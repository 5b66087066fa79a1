"""Array/vector column expressions (ops E25, E35).

All pure JVM-side ``pyspark.sql.functions`` higher-order functions —
no Python UDFs. Accumulation is done in double precision with a fixed
left-to-right fold, so results are reproducible and oracle-comparable.

Measured dead end (do not retry): unrolling ``aggregate``/``zip_with``
into a flat 64-term ``a[1]*b[1] + ...`` chain for known dims was ~7x
SLOWER than the HOF form — the giant expression tree overwhelms codegen
(method-size limits -> interpreted fallback) and pays per-element
null-checking; the HOF loop is a tight specialized loop over the array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize a vector (pre-normalization turns cosine top-k into
    dot-product top-k — one pass instead of recomputing norms per pair)."""
    a = F.col(a) if isinstance(a, str) else a
    norm = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / norm)

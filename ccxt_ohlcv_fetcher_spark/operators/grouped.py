"""Grouped-map and table-function UDF tiers (SURVEY.md §2.10): the two
Arrow-crossing shapes not covered elsewhere in the package —
``groupBy().applyInPandas`` (whole-group pandas frame in, frame out)
and a Python UDTF (row in, rows out, usable from SQL).

Both are the *slow path* by design (PERFORMANCE.md: stay JVM-side when
a column expression exists); they exist for logic that is genuinely
frame-shaped — per-group model fitting, cross-row normalization — and
they move data per Arrow batch, never per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

MINMAX_SCHEMA = (
    "l_orderkey long, l_linenumber int, l_returnflag string, "
    "l_extendedprice double, price_scaled double"
)


def _minmax_one_group(pdf: pd.DataFrame) -> pd.DataFrame:
    lo = pdf["l_extendedprice"].min()
    hi = pdf["l_extendedprice"].max()
    span = hi - lo
    pdf = pdf[["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"]].copy()
    # plain IEEE ops on values picked by exact min/max -> bit-identical
    # to any engine computing (x - min) / (max - min) in float64
    pdf["price_scaled"] = (
        (pdf["l_extendedprice"] - lo) / span if span > 0 else 0.0
    )
    return pdf


def minmax_scale_prices(lineitem: DataFrame) -> DataFrame:
    """Per-group min-max normalization via ``applyInPandas`` — the
    grouped-map UDF tier. Each (returnflag) group arrives as ONE pandas
    frame (so the group must fit an executor — at 100 TB normalize per
    finer key or switch to the pure-window form, which this op's oracle
    is). Chosen because min/max are exact picks and the scale is one
    subtraction + division per value: bit-identical to the SQL
    window-function formulation, so the DuckDB hash gate can check a
    Python-UDF path exactly — rare for float kernels."""
    return lineitem.groupBy("l_returnflag").applyInPandas(
        lambda pdf: _minmax_one_group(pdf), schema=MINMAX_SCHEMA
    )


def register_token_udtf(spark) -> None:
    """Python UDTF (Spark 3.5+): ``token_stats(text)`` explodes a string
    into (pos, token, token_len) rows — the table-function tier of the
    UDF surface, callable from SQL (`SELECT t.* FROM docs, LATERAL
    token_stats(text) t`). Functionally the posexplode query
    (plans/breadth.py) — registered as a UDTF to cover the API tier;
    the built-in generator remains the fast path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, token_len int")
    class TokenStats:
        def eval(self, text: str):  # noqa: D102 — UDTF contract
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok, len(tok)

    spark.udtf.register("token_stats", TokenStats)


def mad_udaf():
    """Grouped-aggregate pandas UDF (§2.10's last tier): median absolute
    deviation — the robust dispersion measure. Chosen for the oracle's
    sake: MAD is exclusively order-statistic picks and midpoint
    averages, so the numpy kernel is order-insensitive and bit-identical
    to any engine's median-based mad() (unlike mean/std kernels, whose
    float sum order differs per partitioning). Usable in groupBy().agg
    and over windows; one Arrow batch per group crosses to Python."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def mad(values: pd.Series) -> float:
        x = values.to_numpy(dtype="float64")
        return float(np.median(np.abs(x - np.median(x))))

    return mad


def mad_arrays_udf():
    """Vectorized companion to :func:`mad_udaf` for PRE-MATERIALIZED
    frames: a scalar pandas UDF over an array<double> column (e.g. a
    JVM ``collect_list`` window frame) returning each array's median
    absolute deviation.

    Same kernel arithmetic as ``mad_udaf`` — numpy order-statistic
    picks and the exact midpoint average — so a frame produces the
    identical double either way; what changes is the boundary: ONE
    Arrow batch per task instead of one UDF evaluation per row
    (window grouped-agg UDFs slice and call the kernel per frame).
    Full-length frames are stacked and reduced along axis 1; ragged
    leading frames fall back to the per-row kernel."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def mad_arrays(frames: pd.Series) -> pd.Series:
        vals = [np.asarray(v, dtype="float64") for v in frames]
        out = np.empty(len(vals), dtype="float64")
        lens = np.fromiter(
            (len(v) for v in vals), dtype="int64", count=len(vals)
        )
        mode = int(lens.max()) if len(lens) else 0
        full = lens == mode
        if mode and full.any():
            m = np.stack([vals[i] for i in np.nonzero(full)[0]])
            med = np.median(m, axis=1)
            out[full] = np.median(np.abs(m - med[:, None]), axis=1)
        for i in np.nonzero(~full)[0]:
            x = vals[i]
            out[i] = np.median(np.abs(x - np.median(x)))
        return pd.Series(out)

    return mad_arrays

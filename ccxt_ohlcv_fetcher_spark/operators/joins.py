"""Join operators Spark lacks natively (SURVEY.md §2.3, E9-E11).

The reference implements no joins (verified, SURVEY.md §2.3) — its only
multi-table interaction is the PK-conflict dedup, a left-anti join
(`ccxt-ohlcv-fetch.py:71-75`, built in ``operators/ingest.py``). These
are the E-tier formulations, designed around shuffle economics:

- **as-of join** (E10): the natural query over candle data ("state as
  of time t"; the reference's ``since`` paging is as-of semantics at the
  source, `:98,:120`). No native Spark operator. We use the union+window
  trick: tag both sides, union, one window sorted by (key, ts) carrying
  the last right-side payload forward, keep left rows. Cost: ONE shuffle
  on the key — identical to a sort-merge join, no N×M blowup, no skew
  amplification; 100 TB-safe as long as keys aren't degenerate.
- **banded range join** (E9/E11): Spark turns a pure range predicate
  into BroadcastNestedLoopJoin (O(N×M) compares). Bucketing the range
  into fixed-width bands turns it into an equi-join on the band id +
  residual filter — Catalyst then plans a plain shuffled hash/SMJ.
- **salted join** (skew mitigation): a degenerate hot key (one symbol
  carrying 30% of a 100 TB table) stalls its single shuffle partition.
  Salting fans the hot side across N sub-keys and replicates the other
  side N ways — N× parallelism on the hot key for N× duplication of
  (only) the small side. AQE's skew-join split handles *sort-merge*
  skew automatically; explicit salting is for when the small side is
  broadcast-sized per salt or the skew is known up front.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = False,
    prefix: str = "asof_",
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (``<`` when strict) and equal keys.

    ``direction="forward"`` mirrors it (pandas ``merge_asof``'s other
    mode): the EARLIEST right row with ``right.ts >= left.ts`` (``>``
    when strict) — same single-shuffle union + window plan, with the
    running ``last`` over the preceding frame replaced by a running
    ``first`` over the following frame.

    Left columns are preserved; matched right payload columns arrive as
    ``{prefix}{col}`` (null when no prior right row exists).

    ``tolerance`` bounds the lookback: a prior right row older than
    ``left.ts - tolerance`` does NOT match (pandas
    ``merge_asof(tolerance=...)`` semantics — the stale-quote cutoff
    every market-data join wants). Units: SECONDS when the ts columns
    are timestamps (compared via ``unix_micros``), the column's native
    units when numeric (e.g. epoch-ms bigints). Implemented by
    carrying the matched row's own timestamp in the payload and
    nulling the match afterwards — same single-shuffle plan, no extra
    join.
    """
    payload = F.struct(
        *[F.col(c) for c in right_payload],
        F.col(right_ts).alias("_match_ts"),
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    # _side orders right rows so an equal-ts right row is inside the
    # frame for inclusive semantics and outside it for strict:
    # backward (frame = preceding): right BEFORE left unless strict;
    # forward (frame = following): right AFTER left unless strict.
    if direction == "backward":
        right_side, left_side = (0, 1) if not strict else (1, 0)
    else:
        right_side, left_side = (1, 0) if not strict else (0, 1)
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("_payload"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        payload.alias("_payload"),
    ).select(*l_tagged.columns)  # align column order for union
    u = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        w = (
            W.partitionBy(*keys)
            .orderBy("_ts", "_side")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        matched = u.withColumn(
            "_m", F.last("_payload", ignorenulls=True).over(w)
        )
    else:
        w = (
            W.partitionBy(*keys)
            .orderBy("_ts", "_side")
            .rowsBetween(0, W.unboundedFollowing)
        )
        matched = u.withColumn(
            "_m", F.first("_payload", ignorenulls=True).over(w)
        )
    valid = F.col("_m").isNotNull()
    if tolerance is not None:
        from pyspark.sql import types as T

        lt = left.schema[left_ts].dataType
        if isinstance(lt, (T.TimestampType, T.TimestampNTZType)):
            delta = F.unix_micros(F.col("_ts").cast("timestamp")) - F.unix_micros(
                F.col("_m")["_match_ts"].cast("timestamp")
            )
            bound = F.lit(int(tolerance * 1_000_000))
        else:
            delta = (
                F.col("_ts").cast("double")
                - F.col("_m")["_match_ts"].cast("double")
            )
            bound = F.lit(float(tolerance))
        if direction == "forward":
            delta = -delta  # match is ahead of the left row
        valid = valid & (delta <= bound)
    out = matched.filter(F.col("_side") == left_side).select(
        *left.columns,
        *[
            F.when(valid, F.col("_m")[c]).alias(f"{prefix}{c}")
            for c in right_payload
        ],
    )
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big (skewed) side, replicate the
    small side across all salts, join on (keys..., salt).

    The hot key's rows spread over ``n_salts`` shuffle partitions
    instead of one. Row-count preserving for inner/left joins (each big
    row matches exactly the one salt replica it carries).
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(
        replicated_small, on=[*keys, "_salt"], how=how
    ).drop("_salt")


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    band_width: int,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``left.point ∈ [right.lo, right.hi)`` via band bucketing.

    Right intervals are exploded into the fixed-width bands they cover
    (`sequence` — interval lengths should be bounded relative to
    ``band_width`` or the explode fans out); the join is then a plain
    equi-join on (keys..., band) plus the exact residual predicate. One
    shuffle each side, no nested-loop.
    """
    keys = keys or []
    band = F.floor(F.col(left_point) / band_width)
    l_b = left.withColumn("_band", band)
    r_b = right.withColumn(
        "_band",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / band_width),
                F.floor((F.col(right_hi) - 1) / band_width),
            )
        ),
    )
    cond = [l_b["_band"] == r_b["_band"]] + [l_b[k] == r_b[k] for k in keys]
    joined = l_b.join(r_b, cond, how).filter(
        (l_b[left_point] >= r_b[right_lo]) & (l_b[left_point] < r_b[right_hi])
    )
    return joined.drop("_band")

"""Z-order layout (operators/layout.py): Morton-code correctness and
the property that matters — a multi-dimensional box query touches fewer
files under Z-order than under single-column clustering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.layout import zorder_value, zorder_write


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_reference_morton(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    # identity quantization: min=0, max=2^bits-1 with bits=3
    out = df.select(
        "x", "y", zorder_value(["x", "y"], [0, 0], [7, 7], bits=3).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _morton2(r["x"], r["y"], 3), (r["x"], r["y"], r["z"])


def test_zorder_write_improves_box_query_locality(spark, tmp_path):
    """64x64 grid of (a, b); box query a,b in [16, 23]. Under linear
    sort by `a`, matching rows spread across many files (every `a`
    stripe holds all b values); under Z-order they concentrate in few
    files. Fewer touched files == row-group stats can skip more."""
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a int, b int")

    linear = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(df, zpath, ["a", "b"], n_files=16, bits=6)

    def files_touched(path: str) -> int:
        got = (
            spark.read.parquet(path)
            .filter((F.col("a").between(16, 23)) & (F.col("b").between(16, 23)))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        return got

    n_linear = files_touched(linear)
    n_z = files_touched(zpath)
    assert n_z < n_linear, f"z-order did not improve locality: {n_z} vs {n_linear}"
    # same rows either way
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(linear).count()
        == 64 * 64
    )

"""Measure snapshot-log checkpoint load cost: JSON vs parquet, at a
synthetic file count far beyond the fixtures (the regime wishlist r8 #5
targets — millions of files per checkpoint read at 100 TB).

Run: PYTHONPATH=/root/repo python tools/ckpt_format_bench.py [n_files]
Prints one JSON line per (format, op) with wall seconds and bytes.
No Spark session needed — the checkpoint codec is pure driver code.
"""

import json
import os
import sys
import tempfile
import time

from ccxt_ohlcv_fetcher_spark.operators.snapshots import (
    _ckpt_read_parquet,
    _ckpt_write_parquet,
)


def synth_state(n_files: int) -> dict:
    files, stats, dvs = [], {}, {}
    for i in range(n_files):
        f = f"data/commit-{i % 997:04x}/part-{i:08d}.parquet"
        files.append(f)
        stats[f] = {
            "timestamp": [i * 60_000, (i + 1) * 60_000],
            "symbol": [f"SYM{i % 500}", f"SYM{i % 500}"],
            "_bytes": 128 * 1024 + (i % 4096),
        }
        if i % 50 == 0:
            dvs[f] = [f"data/commit-dv/dv-{i:08d}.parquet"]
    return {
        "version": 1000,
        "parent": 999,
        "operation": "append",
        "files": files,
        "stats": stats,
        "dvs": dvs,
        "txn": {"ingest": 123, "mirror": 45},
        "schema": json.dumps({"fields": [{"name": c} for c in "abcdef"]}),
        "constraints": {"positive_close": "close > 0"},
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    state = synth_state(n)
    out = {"n_files": n}
    with tempfile.TemporaryDirectory() as d:
        jp = os.path.join(d, "ckpt.json")
        pp = os.path.join(d, "ckpt.parquet")
        t0 = time.perf_counter()
        with open(jp, "w") as fh:
            json.dump(state, fh)
        out["json_write_s"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        _ckpt_write_parquet(state, pp)
        out["parquet_write_s"] = round(time.perf_counter() - t0, 4)
        out["json_bytes"] = os.path.getsize(jp)
        out["parquet_bytes"] = os.path.getsize(pp)
        t0 = time.perf_counter()
        with open(jp) as fh:
            sj = json.load(fh)
        out["json_read_s"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        sp = _ckpt_read_parquet(pp)
        out["parquet_read_s"] = round(time.perf_counter() - t0, 4)
        assert sp == json.loads(json.dumps(sj)) == sp
    print(json.dumps(out))


if __name__ == "__main__":
    main()

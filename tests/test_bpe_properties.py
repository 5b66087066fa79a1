"""Property tests for the BPE batch-selection safety argument and the
greedy OOV encoder — pure Python (no SparkSession): the distributed
trainer's per-round selection logic (`_select_batch`) and the serve
segmentation (`encode_oov`) are driver-side functions, so hypothesis
can hammer them across hundreds of random corpora in seconds. The
Spark tests pin the END-TO-END equality on fixture data; these pin the
MATH on adversarial random inputs (count plateaus, truncated
collections, self-pairs like (a,a), tiny alphabets that maximize pair
interaction)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ccxt_ohlcv_fetcher_spark.operators.bpe import (
    END_OF_WORD,
    _select_batch,
    encode_oov,
)


# --- pure-Python BPE model (mirrors _ref_bpe in test_llm_ops) ----------


def _apply(syms: tuple, a: str, b: str) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _counts(vocab: dict, freqs: dict) -> dict:
    counts: dict = {}
    for w, syms in vocab.items():
        f = freqs[w]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + f
    return counts


def _sequential(freqs: dict, n_merges: int, min_count: int):
    vocab = {w: tuple(list(w) + [END_OF_WORD]) for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts = _counts(vocab, freqs)
        if not counts:
            break
        best_cnt = max(counts.values())
        if best_cnt < min_count:
            break
        a, b = min(p for p, c in counts.items() if c == best_cnt)
        merges.append((a, b))
        vocab = {w: _apply(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def _batched(freqs: dict, n_merges: int, min_count: int, batch: int, coll: int):
    """The distributed trainer's per-round loop with the REAL
    `_select_batch`, driven by a pure-Python count model — including
    the truncated-collection path (coll caps the 'collected' ranking,
    like limit(collect_n) does)."""
    vocab = {w: tuple(list(w) + [END_OF_WORD]) for w in freqs}
    merges: list = []
    made = {END_OF_WORD}  # mirror of train_bpe's collision-guard set
    while len(merges) < n_merges:
        counts = _counts(vocab, freqs)
        ranked = sorted(
            ({"a": a, "b": b, "cnt": c} for (a, b), c in counts.items()),
            key=lambda r: (-r["cnt"], r["a"], r["b"]),
        )[:coll]
        if not ranked or ranked[0]["cnt"] < min_count:
            break
        sel = _select_batch(
            ranked,
            batch,
            budget=n_merges - len(merges),
            min_pair_count=min_count,
            truncated=len(ranked) == coll,
            made_symbols=made,
        )
        assert sel, "selection must always take at least the argmax"
        made.update(a + b for a, b in sel)
        for a, b in sel:
            merges.append((a, b))
            vocab = {w: _apply(s, a, b) for w, s in vocab.items()}
    return merges, vocab


words_st = st.dictionaries(
    keys=st.text(alphabet="abc", min_size=1, max_size=8),
    values=st.integers(min_value=1, max_value=9),
    min_size=1,
    max_size=20,
)


@settings(max_examples=250, deadline=None)
@given(
    freqs=words_st,
    batch=st.integers(min_value=2, max_value=8),
    coll=st.integers(min_value=4, max_value=64),
)
def test_batched_selection_equals_sequential(freqs, batch, coll):
    """THE safety property (round-7 verdict item 3): for any corpus,
    any batch size, and any collection cutoff (truncation makes the
    created-pair bound looser, never unsound), the batched trainer's
    merge SEQUENCE and final segmentations equal classic sequential
    BPE exactly. Tiny alphabet = maximal pair interaction, the
    adversarial regime for batching."""
    seq_m, seq_v = _sequential(freqs, n_merges=12, min_count=2)
    bat_m, bat_v = _batched(freqs, n_merges=12, min_count=2, batch=batch, coll=coll)
    assert bat_m == seq_m
    assert bat_v == seq_v


@settings(max_examples=250, deadline=None)
@given(
    train=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1, max_size=15
    ),
    serve=st.text(alphabet="abcde", min_size=1, max_size=12),
)
def test_encode_oov_lossless_and_maximal_munch(train, serve):
    """Greedy OOV encoding is LOSSLESS (pieces concatenate back to
    word + end marker), never longer than the char split, and agrees
    with an independent maximal-munch over the atom sequence — for
    arbitrary piece inventories derived from real training runs
    (including 'e', a char never trained on)."""
    freqs = {w: 1 + (len(w) % 3) for w in train}
    _, vocab = _sequential(freqs, n_merges=8, min_count=2)
    keys, max_atoms = set(), 1
    for syms in vocab.values():
        for p in syms:
            if p.endswith(END_OF_WORD):
                body = p[: -len(END_OF_WORD)]
                keys.add((body, True))
                max_atoms = max(max_atoms, len(body) + 1)
            else:
                keys.add((p, False))
                max_atoms = max(max_atoms, len(p))

    got = encode_oov(serve, keys, max_atoms)
    assert "".join(got) == serve + END_OF_WORD
    assert len(got) <= len(serve) + 1

    # independent maximal munch over atoms
    piece_strings = {(b + END_OF_WORD) if e else b for b, e in keys}
    atoms = list(serve) + [END_OF_WORD]
    ref, i = [], 0
    while i < len(atoms):
        for k in range(len(atoms) - i, 0, -1):
            cand = "".join(atoms[i : i + k])
            if cand in piece_strings:
                ref.append(cand)
                i += k
                break
        else:
            ref.append(atoms[i])
            i += 1
    assert got == ref

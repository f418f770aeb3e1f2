"""BPE merge learning: exact parity with a pure-Python reference,
greedy-overlap semantics, determinism, and corpus-apply round trip."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from real_time_data_anomaly_detection_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
    word_counts,
    bpe_encode_fixed,
)


def bpe_reference(word_cnts: dict[str, int], n_merges: int):
    """Textbook BPE trainer (Sennrich et al. 2016 pseudocode), greedy
    leftmost fuse, ties broken count DESC then pair ASC."""
    syms = {w: list(w) for w in word_cnts}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, c in word_cnts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, n))
        for w in syms:
            s, out = syms[w], []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


def bpe_reference_batched(word_cnts: dict[str, int], n_merges: int, b: int):
    """Reference for the SAME batching rule bpe_train(batch_size=B)
    implements: per round, rank all pairs (count DESC, pair ASC), scan
    the top 4*want candidates, greedily keep up to ``want`` pairs with
    pairwise-disjoint symbol sets that also touch no earlier member's
    created (left+right) symbol, fuse them all, recount."""
    syms = {w: list(w) for w in word_cnts}
    merges = []
    while len(merges) < n_merges:
        want = min(b, n_merges - len(merges))
        pc: Counter = Counter()
        for w, c in word_cnts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        cap = want if want == 1 else want * 4
        used: set[str] = set()
        created: set[str] = set()
        batch = []
        for (left, right), n in ranked[:cap]:
            if len(batch) >= want:
                break
            if left in used or right in used:
                continue
            # creation rule (round-6 ADVICE): a candidate touching a
            # symbol an earlier batch member CREATES would count
            # tokens that did not exist pre-batch
            if left in created or right in created:
                continue
            used.update((left, right))
            created.add(left + right)
            batch.append((left, right, n))
        for left, right, n in batch:
            merges.append((len(merges), left, right, n))
            for w in syms:
                s, out = syms[w], []
                for x in s:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                syms[w] = out
    return merges, syms


def test_batched_matches_batched_reference_on_documents(spark):
    """B=8 batching: merge-for-merge parity with the pure-Python
    reference implementing the same disjoint-batch rule, and the
    recorded counts stay exact (disjoint symbol sets make each
    pair_count invariant under the rest of its batch)."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = {r.word: r.cnt for r in word_counts(d).collect()}
    got = bpe_train(word_counts(d), n_merges=16, batch_size=8)
    want, _ = bpe_reference_batched(wc, 16, 8)
    assert got == want


def test_batch_size_one_is_sequential_bpe(spark):
    """batch_size=1 must reproduce the classic sequential algorithm
    exactly (same code path the round-5 parity pin covered)."""
    rows = [("banana", 4), ("bandana", 2), ("ananas", 1), ("cabana", 3)]
    words = spark.createDataFrame(rows, "word string, cnt long")
    got = bpe_train(words, 5, batch_size=1)
    want, _ = bpe_reference(dict(rows), 5)
    assert got == want


def test_matches_python_reference_on_documents(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = {r.word: r.cnt for r in word_counts(d).collect()}
    got = bpe_train(word_counts(d), n_merges=8)
    want, _ = bpe_reference(wc, 8)
    assert got == want


def test_greedy_overlap_semantics(spark):
    # "aaaa"x3: round 1 pair (a,a) count 9 -> fused to ["aa","aa"];
    # round 2 must see (aa,aa) count 3, not an overlapping recount.
    words = spark.createDataFrame([("aaaa", 3)], "word string, cnt long")
    got = bpe_train(words, n_merges=2)
    assert got == [(0, "a", "a", 9), (1, "aa", "aa", 3)]


def test_unmergeable_words_dropped_from_carried_state(spark):
    """Round-13: bpe_train's checkpointed dict drops words once they
    have a single symbol (no adjacent pair can ever form again). The
    learned merges must be unchanged vs the reference, which KEEPS
    those words — here 'a' (huge count, never pairable) and 'to'
    (fully fused by merge 1, then unmergeable) exercise both the
    init-time and per-round drop paths; exhaustion after every word
    fuses to one symbol must still terminate early, not raise."""
    rows = [("a", 100), ("to", 30), ("tot", 5)]
    words = spark.createDataFrame(rows, "word string, cnt long")
    got = bpe_train(words, 10)
    want, _ = bpe_reference(dict(rows), 10)
    assert got == want
    assert len(got) < 10  # exhausted: every word reached one symbol


def test_partition_invariance(spark):
    rows = [(w, c) for c, w in enumerate(
        ["spark", "sparse", "sparrow", "part", "park", "parka", "artful"], start=1
    )]
    a = bpe_train(spark.createDataFrame(rows, "word string, cnt long").repartition(1), 6)
    b = bpe_train(spark.createDataFrame(rows, "word string, cnt long").repartition(7), 6)
    assert a == b and len(a) == 6


def test_apply_round_trip(spark):
    # applying the learned merges reproduces the trainer's final
    # symbolization (reference-checked), and concatenating tokens
    # recovers the word
    rows = [("banana", 4), ("bandana", 2), ("ananas", 1)]
    words = spark.createDataFrame(rows, "word string, cnt long")
    merges = bpe_train(words, 4)
    wc = dict(rows)
    _, want_syms = bpe_reference(wc, 4)
    got = {r.word: r.tokens for r in bpe_apply(words, merges).collect()}
    assert got == want_syms
    assert all("".join(toks) == w for w, toks in got.items())


def test_encode_fixed_matches_fold_tokenizer(spark):
    # The replace-chain encoder (bpe_encode_fixed) and the array-fold
    # tokenizer (bpe_apply) are independent implementations of greedy
    # leftmost-first fusion — they must agree symbol-for-symbol,
    # including on overlap words ("aaa" + (a,a) -> ["aa","a"]) and on
    # prefix traps ((l,r) must not fire on symbol "rx").
    merges = [("a", "a"), ("r", "x"), ("l", "r"), ("t", "a"), ("ta", "b"), ("tab", "b")]
    words = ["aaa", "aaaa", "lrx", "lr", "tabb", "tatabb", "banana", "a"]
    df = spark.createDataFrame([(w, 1) for w in words], "word string, cnt long")
    got = {
        r.word: r.tokens
        for r in bpe_encode_fixed(df, merges).collect()
    }
    ranked = [(i, l, r, 0) for i, (l, r) in enumerate(merges)]
    want = {r.word: r.tokens for r in bpe_apply(df, ranked).collect()}
    assert got == want
    assert got["aaa"] == ["aa", "a"]
    assert got["lrx"] == ["l", "rx"]  # (l,r) must not fire inside symbol "rx"
    assert got["tabb"] == ["tabb"]

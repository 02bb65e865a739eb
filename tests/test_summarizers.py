"""Policy-layer parity: CountFilterSet label sets, eq-class summarizer,
and censored-ext repair vs the oracle (filter.rs:68-101, 238-306)."""

import numpy as np
import pytest

from tpu_debruijn import filter as F
from tpu_debruijn.oracle import ref as O


def _make_labeled_reads(rng, n_labels=4, n_reads=24, read_len=50):
    contigs = O.simple_random_contigs(rng)
    pool = [np.asarray(c, np.uint8) for c in contigs if len(c) >= read_len]
    reads = []
    for i in range(n_reads):
        c = pool[int(rng.integers(0, len(pool)))]
        s = int(rng.integers(0, len(c) - read_len + 1))
        r = c[s : s + read_len].copy()
        if rng.random() < 0.5:
            r = (3 - r[::-1]).astype(np.uint8)
        reads.append((r, 0, int(rng.integers(0, n_labels))))
    return reads


@pytest.mark.parametrize("stranded,min_obs", [(False, 1), (False, 2), (True, 1)])
def test_count_filter_set_parity(rng, stranded, min_obs):
    k = 16
    reads = _make_labeled_reads(rng)
    table, sets = F.filter_kmers_set(reads, k, stranded=stranded, min_obs=min_obs)
    otab, _ = O.filter_kmers(
        [(list(r[0]), 0, r[2]) for r in reads],
        k,
        O.CountFilterSet(min_obs),
        stranded,
    )
    got = [
        (F.KM.to_int(table.spec, table.kmers[i]), int(table.exts[i]), list(sets[i]))
        for i in range(len(table))
    ]
    want = [(kv, e, d) for kv, e, d in otab]
    assert got == want


def test_eq_classes(rng):
    k = 16
    reads = _make_labeled_reads(rng, n_labels=3)
    table, eq_classes = F.filter_kmers_eq_classes(reads, k, stranded=False, min_obs=1)
    _, sets = F.filter_kmers_set(reads, k, stranded=False, min_obs=1)
    # id -> set mapping is consistent and covers every kmer
    assert len(eq_classes) >= 1
    for i in range(len(table)):
        assert eq_classes[int(table.data[i])] == sets[i]
    # first-occurrence numbering: ids appear in increasing order of first use
    seen = []
    for i in range(len(table)):
        d = int(table.data[i])
        if d not in seen:
            assert d == len(seen)
            seen.append(d)


@pytest.mark.parametrize("stranded", [False, True])
def test_remove_censored_exts_parity(rng, stranded):
    k = 16
    reads = _make_labeled_reads(rng, n_reads=16)
    table = F.filter_kmers(reads, k, stranded=stranded, min_obs=2, report_all=True)
    otab, _ = O.filter_kmers(
        [(list(r[0]), 0, r[2]) for r in reads], k, O.CountFilter(2), stranded
    )
    okmers = [kv for kv, _, _ in otab]

    # global
    t_glob = F.KmerTable(
        table.spec, stranded, table.kmers.copy(), table.exts.copy(),
        table.counts.copy(), table.data.copy(),
    )
    F.remove_censored_exts(t_glob)
    owant = O.remove_censored_exts(stranded, k, otab)
    got = [(F.KM.to_int(table.spec, t_glob.kmers[i]), int(t_glob.exts[i]))
           for i in range(len(t_glob))]
    assert got == [(kv, e) for kv, e, _ in owant]

    # sharded (census = all kmers incl. censored)
    _, oall = O.filter_kmers(
        [(list(r[0]), 0, r[2]) for r in reads], k, O.CountFilter(2), stranded,
        report_all_kmers=True,
    )
    t_sh = F.KmerTable(
        table.spec, stranded, table.kmers.copy(), table.exts.copy(),
        table.counts.copy(), table.data.copy(), all_kmers=table.all_kmers,
    )
    F.remove_censored_exts_sharded(t_sh)
    owant2 = O.remove_censored_exts_sharded(stranded, k, otab, oall)
    got2 = [(F.KM.to_int(table.spec, t_sh.kmers[i]), int(t_sh.exts[i]))
            for i in range(len(t_sh))]
    assert got2 == [(kv, e) for kv, e, _ in owant2]


def test_pluggable_summarizer_matches_fast_path(rng):
    """filter_kmers_with_summarizer(CountFilter) == the on-device fast path."""
    k = 16
    reads = _make_labeled_reads(rng)
    for stranded, min_obs in [(False, 1), (False, 2), (True, 2)]:
        fast = F.filter_kmers(reads, k, stranded=stranded, min_obs=min_obs)
        slow, data = F.filter_kmers_with_summarizer(
            reads, k, F.CountFilter(min_obs), stranded=stranded
        )
        assert np.array_equal(fast.kmers, slow.kmers)
        assert np.array_equal(fast.exts, slow.exts)
        assert np.array_equal(fast.counts, slow.counts)
        assert data == [int(c) for c in fast.counts]


def test_pluggable_summarizer_set_and_eqclass(rng):
    k = 16
    reads = _make_labeled_reads(rng, n_labels=3)
    fast_table, fast_sets = F.filter_kmers_set(reads, k, stranded=False, min_obs=1)
    _, sets = F.filter_kmers_with_summarizer(
        reads, k, F.CountFilterSet(1), stranded=False
    )
    assert sets == fast_sets

    eq = F.CountFilterEqClass(1)
    table, ids = F.filter_kmers_with_summarizer(reads, k, eq, stranded=False)
    inv = {v: kset for kset, v in eq.eq_classes.items()}
    for i, d in enumerate(ids):
        assert inv[d] == sets[i]


def test_custom_summarizer(rng):
    """An arbitrary user policy: valid iff seen with >= 2 distinct labels;
    data = max label (impossible with the built-in fast paths)."""

    class TwoColor(F.KmerSummarizer):
        def summarize(self, kmer, exts, payloads):
            u = set(int(x) for x in payloads)
            return len(u) >= 2, int(np.bitwise_or.reduce(exts)), max(u)

    k = 16
    reads = _make_labeled_reads(rng, n_labels=3)
    table, data = F.filter_kmers_with_summarizer(reads, k, TwoColor())
    _, all_sets = F.filter_kmers_set(reads, k, stranded=False, min_obs=1)
    full, _ = F.filter_kmers_set(reads, k, stranded=False, min_obs=1)
    want = [
        (tuple(full.kmers[i]), max(all_sets[i]))
        for i in range(len(full))
        if len(all_sets[i]) >= 2
    ]
    got = [(tuple(table.kmers[i]), data[i]) for i in range(len(table))]
    assert got == want


def test_summarizer_receives_kmer_and_arbitrary_payloads(rng):
    """Trait fidelity (filter.rs:27-38): summarize gets the canonical kmer
    limbs and the raw per-observation payloads — here strings, a D that no
    int-label fast path can carry."""
    from tpu_debruijn import kmer as KM

    k = 16
    contigs = O.simple_random_contigs(rng)
    pool = [np.asarray(c, np.uint8) for c in contigs if len(c) >= 40]
    barcodes = ["ACGT-1", "TTAG-2", "GGCA-7"]
    reads = []
    for i in range(18):
        c = pool[int(rng.integers(0, len(pool)))]
        s = int(rng.integers(0, len(c) - 40 + 1))
        reads.append((c[s : s + 40].copy(), 0, barcodes[i % 3]))

    seen = {}

    class BarcodeSet(F.KmerSummarizer):
        def summarize(self, kmer, exts, payloads):
            assert kmer.shape == (KmerSpec_w,) and kmer.dtype == np.uint32
            assert all(isinstance(p, str) for p in payloads)
            key = tuple(int(x) for x in kmer)
            seen[key] = tuple(sorted(set(payloads)))
            return True, int(np.bitwise_or.reduce(exts)), len(set(payloads))

    from tpu_debruijn.kmer import KmerSpec

    KmerSpec_w = KmerSpec(k).w
    table, data = F.filter_kmers_with_summarizer(reads, k, BarcodeSet())
    assert len(table) == len(seen) > 0
    # cross-check against the int-label set fast path (indices -> barcodes)
    int_reads = [(r, e, barcodes.index(b)) for r, e, b in reads]
    fast, sets = F.filter_kmers_set(int_reads, k, stranded=False, min_obs=1)
    assert np.array_equal(fast.kmers, table.kmers)
    for i in range(len(fast)):
        key = tuple(int(x) for x in fast.kmers[i])
        assert seen[key] == tuple(sorted(barcodes[j] for j in sets[i]))
        assert data[i] == len(sets[i])


def test_filter_kmers_set_arrays_matches_tuples(rng):
    """Array-native CountFilterSet == the tuple API, row for row."""
    from tpu_debruijn.filter import filter_kmers_set, filter_kmers_set_arrays

    g = rng.integers(0, 4, 600).astype(np.uint8)
    seqs = []
    for lab in range(6):
        s = int(rng.integers(0, 500))
        seqs.append((g[s : s + 80].copy(), 0, lab))
    t1, sets = filter_kmers_set(seqs, 25, stranded=False, min_obs=1)
    t2, plb, split = filter_kmers_set_arrays(seqs, 25, stranded=False, min_obs=1)
    assert np.array_equal(t1.kmers, t2.kmers)
    assert len(sets) == len(t2)
    for i, s in enumerate(sets):
        assert tuple(plb[split[i] : split[i + 1]]) == s


def test_eq_classes_hashed_fallback_parity(rng):
    """The scale-safe hashed eq-class path (ADVICE r3: chunked row-hash
    fallback when the dense (n, maxlen) matrix would be enormous) must
    produce IDENTICAL ids and class lists to the dense path."""
    k = 16
    reads = _make_labeled_reads(rng, n_labels=5, n_reads=60)
    table, _, split = F.filter_kmers_set_arrays(reads, k, stranded=False)
    # rebuild the raw (pair_kmer, pair_label) stream from the arrays API
    n = len(table)
    lens = np.diff(split)
    pair_kmer = np.repeat(np.arange(n), lens).astype(np.int32)
    # need actual labels: re-run the set API for ground truth
    table2, pair_label, split2 = F.filter_kmers_set_arrays(
        reads, k, stranded=False
    )
    assert np.array_equal(split, split2)

    dense_ids, dense_classes = F.assign_eq_classes(
        pair_kmer, pair_label, n, dense_limit=1 << 40
    )
    hashed_ids, hashed_classes = F.assign_eq_classes(
        pair_kmer, pair_label, n, dense_limit=0
    )
    assert np.array_equal(dense_ids, hashed_ids)
    assert dense_classes == hashed_classes


def test_eq_classes_hashed_empty_runs():
    """Slots with EMPTY label runs (possible when pairs were filtered)
    group together under the hashed path, same as dense."""
    # slots: 0 -> (1,2), 1 -> (), 2 -> (1,2), 3 -> (), 4 -> (3,)
    pair_kmer = np.array([0, 0, 2, 2, 4], np.int32)
    pair_label = np.array([1, 2, 1, 2, 3], np.int32)
    dense_ids, dense_classes = F.assign_eq_classes(
        pair_kmer, pair_label, 5, dense_limit=1 << 40
    )
    hashed_ids, hashed_classes = F.assign_eq_classes(
        pair_kmer, pair_label, 5, dense_limit=0
    )
    assert np.array_equal(dense_ids, hashed_ids)
    assert dense_classes == hashed_classes
    assert dense_ids[1] == dense_ids[3]
    assert dense_ids[0] == dense_ids[2]

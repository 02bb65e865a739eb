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

"""Parity tests: kmer extraction + filter_kmers vs the oracle.

Mirrors the reference's filter tests and the kmer-set invariants of
test.rs:299-414 (reassemble_contigs stages 1-2).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_debruijn import filter as F
from tpu_debruijn import kmer as KM
from tpu_debruijn.kmer import KmerSpec
from tpu_debruijn.oracle import ref as O


@pytest.mark.parametrize("k", [4, 16, 31, 33, 64])
def test_extract_kmers_vs_oracle(k, rng):
    spec = KmerSpec(k)
    for _ in range(3):
        lens = [int(rng.integers(k, k + 40)) for _ in range(3)]
        seqs = [rng.integers(0, 4, L) for L in lens]
        ses = [int(rng.integers(0, 256)) for _ in lens]
        bases, lengths = F.pad_reads(seqs, min_len=k, pad_to=16)
        km, ex, vd = F.extract_kmers(
            spec, jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(ses)
        )
        km, ex, vd = np.asarray(km), np.asarray(ex), np.asarray(vd)
        for r, (seq, se) in enumerate(zip(seqs, ses)):
            expect = list(O.iter_kmer_exts(list(seq), k, se))
            assert vd[r].sum() == len(expect)
            for s, (ev, ee) in enumerate(expect):
                assert KM.to_int(spec, km[r, s]) == ev
                assert ex[r, s] == ee


@pytest.mark.parametrize(
    "k,stranded,minobs", [(16, False, 1), (16, True, 2), (31, False, 2)]
)
def test_filter_kmers_vs_oracle(k, stranded, minobs, rng):
    for trial in range(2):
        contigs = (
            O.simple_random_contigs(rng) if trial == 0 else O.random_contigs(rng)
        )
        seqs = [(np.array(c, dtype=np.uint8), 0, i) for i, c in enumerate(contigs)]
        seqs = seqs + seqs
        tab = F.filter_kmers(seqs, k, stranded=stranded, min_obs=minobs, report_all=True)
        otab, oall = O.filter_kmers(
            [(list(s[0]), s[1], s[2]) for s in seqs if len(s[0]) >= k],
            k,
            O.CountFilter(minobs),
            stranded,
            report_all_kmers=True,
        )
        assert tab.to_tuples() == [(kv, e, c) for kv, e, c in otab]
        allk = [KM.to_int(tab.spec, tab.all_kmers[i]) for i in range(len(tab.all_kmers))]
        assert allk == oall


def test_filter_kmers_exts_reach_only_valid(rng):
    # reassemble_contigs stage: every extension of a valid kmer is a valid kmer
    k = 16
    contigs = O.random_contigs(rng)
    seqs = [(np.array(c, dtype=np.uint8), 0, 0) for c in contigs]
    tab = F.filter_kmers(seqs, k, stranded=False, min_obs=1)
    kmer_set = set(tab.kmer_ints())
    for kv, e, _ in tab.to_tuples():
        for d in (0, 1):
            for b in range(4):
                if O.e_dir_bits(e, d) & (1 << b):
                    ek = O.OKmer.min_rc(k, O.OKmer.extend(k, kv, b, d))
                    assert ek in kmer_set


def test_remove_censored_exts(rng):
    k = 16
    contigs = O.random_contigs(rng)
    seqs = [(np.array(c, dtype=np.uint8), 0, 0) for c in contigs]
    # min_obs=2 with single coverage censors everything that appears once
    seqs2 = seqs + [(seqs[0][0], 0, 0)]
    tab = F.filter_kmers(seqs2, k, stranded=False, min_obs=2, report_all=True)
    otab, oall = O.filter_kmers(
        [(list(s[0]), 0, 0) for s in seqs2 if len(s[0]) >= k],
        k, O.CountFilter(2), False, report_all_kmers=True,
    )
    n = len(tab)
    if n == 0:
        pytest.skip("degenerate corpus")
    # global repair
    new_e = np.asarray(
        F.remove_censored_exts_device(
            tab.spec, False, jnp.asarray(tab.kmers), jnp.asarray(tab.exts), jnp.int32(n)
        )
    )
    want = O.remove_censored_exts(False, k, otab)
    assert [int(x) for x in new_e] == [e for _, e, _ in want]
    # sharded repair (census-aware)
    allk = jnp.asarray(tab.all_kmers)
    new_e2 = np.asarray(
        F.remove_censored_exts_device(
            tab.spec, False, jnp.asarray(tab.kmers), jnp.asarray(tab.exts),
            jnp.int32(n), all_kmers=allk, all_n=jnp.int32(len(tab.all_kmers)),
        )
    )
    want2 = O.remove_censored_exts_sharded(False, k, otab, oall)
    assert [int(x) for x in new_e2] == [e for _, e, _ in want2]


def test_count_filter_set_labels(rng):
    # CountFilterSet analog: label min/max reductions survive the pipeline
    k = 16
    c = rng.integers(0, 4, 60)
    seqs = [(c, 0, 5), (c, 0, 2)]
    tab = F.filter_kmers(seqs, k, stranded=False, min_obs=2, data_reduce="min")
    assert (tab.data == 2).all()
    assert (tab.counts == 2).all()
    tab2 = F.filter_kmers(seqs, k, stranded=False, min_obs=2, data_reduce="max")
    assert (tab2.data == 5).all()


def test_streaming_matches_single_pass(rng):
    # filter.rs:151-183 memory-bounded multi-pass: chunked streaming must
    # equal the one-shot pipeline, including count saturation + exts OR
    from tpu_debruijn.oracle import ref as O

    k = 16
    contigs = O.random_contigs(rng)
    reads = []
    for c in contigs:
        c = np.asarray(c, np.uint8)
        for s in range(0, max(1, len(c) - 40), 13):
            reads.append((c[s : s + 40], 0, int(rng.integers(0, 3))))
    for min_obs in (1, 2):
        one = F.filter_kmers(reads, k, stranded=False, min_obs=min_obs)
        stream = F.filter_kmers_streaming(
            reads, k, stranded=False, min_obs=min_obs, chunk_reads=7
        )
        assert one.to_tuples() == stream.to_tuples()
        assert np.array_equal(one.exts, stream.exts)


def test_streaming_batched_blocks_match_per_read(rng):
    # 2-D pre-batched blocks (the high-volume fast path) must equal the
    # per-read staging path and the one-shot pipeline
    k = 21
    blocks = [rng.integers(0, 4, (37, 60)).astype(np.uint8) for _ in range(3)]
    labels = [np.arange(i * 37, (i + 1) * 37, dtype=np.int32) for i in range(3)]
    per_read = [
        (b[j], 0, int(lab[j]))
        for b, lab in zip(blocks, labels)
        for j in range(b.shape[0])
    ]
    one = F.filter_kmers(per_read, k, stranded=False, min_obs=2)
    s_rows = F.filter_kmers_streaming(
        per_read, k, stranded=False, min_obs=2, chunk_reads=16
    )
    s_blocks = F.filter_kmers_streaming(
        [(b, 0, lab) for b, lab in zip(blocks, labels)],
        k, stranded=False, min_obs=2, chunk_reads=16,
    )
    assert one.to_tuples() == s_rows.to_tuples() == s_blocks.to_tuples()
    assert np.array_equal(one.exts, s_blocks.exts)
    # ragged lengths via the optional 4th element
    lens = rng.integers(k, 61, 37).astype(np.int32)
    ragged = [(blocks[0][j, : lens[j]], 0, 0) for j in range(37)]
    a = F.filter_kmers_streaming(ragged, k, stranded=False, min_obs=1)
    b = F.filter_kmers_streaming(
        [(blocks[0], 0, 0, lens)], k, stranded=False, min_obs=1
    )
    assert a.to_tuples() == b.to_tuples()


def test_kmer_table_checkpoint(tmp_path, rng):
    reads = [(rng.integers(0, 4, 50).astype(np.uint8), 0, i) for i in range(8)]
    t = F.filter_kmers(reads, 16, stranded=False, min_obs=1, report_all=True)
    p = tmp_path / "table.npz"
    t.save(p)
    t2 = F.KmerTable.load(p)
    assert t2.spec.k == 16 and t2.stranded == t.stranded
    assert np.array_equal(t2.kmers, t.kmers)
    assert np.array_equal(t2.exts, t.exts)
    assert np.array_equal(t2.counts, t.counts)
    assert np.array_equal(t2.all_kmers, t.all_kmers)


def test_streaming_memory_gb_knob(rng):
    # memory_size-style bound (filter.rs:139-145): a tiny budget forces
    # multiple chunks; result still equals the one-shot pipeline
    from tpu_debruijn.oracle import ref as O

    k = 16
    contigs = O.random_contigs(rng)
    reads = []
    for c in contigs:
        c = np.asarray(c, np.uint8)
        for s in range(0, max(1, len(c) - 40), 17):
            reads.append((c[s : s + 40], 0, 0))
    one = F.filter_kmers(reads, k, stranded=False, min_obs=2)
    stream = F.filter_kmers_streaming(
        reads, k, stranded=False, min_obs=2,
        read_len_cap=64, memory_gb=2e-4,   # ~200 KB -> a few hundred reads/chunk
    )
    assert one.to_tuples() == stream.to_tuples()


def test_kmer_table_lookup(rng):
    # BoomHashMap2 query surface (filter.rs:9,228): get / get_key_id / get_key
    from tpu_debruijn import kmer as KM

    k = 16
    genome = rng.integers(0, 4, 300)
    tab = F.filter_kmers([(genome, 0, 7)], k, stranded=False, min_obs=1)
    assert len(tab) > 0
    for i in [0, len(tab) // 2, len(tab) - 1]:
        limbs = tab.get_key(i)
        assert tab.get_key_id(limbs) == i
        assert tab.get(limbs) == (int(tab.exts[i]), int(tab.data[i]))
    absent = KM.from_bases(tab.spec, np.zeros(k, np.uint8))
    if tab.get_key_id(absent) is None:
        assert tab.get(absent) is None


def test_streaming_device_merge_equals_host(rng):
    """merge='device' (table accumulated on device, one sort per chunk)
    must equal the single-pass result bit-for-bit, including capacity
    growth and the u16 count saturation contract."""
    from tpu_debruijn import filter as F

    g = rng.integers(0, 4, 2000).astype(np.uint8)
    reads = []
    for _ in range(200):
        s = int(rng.integers(0, 1900))
        r = g[s : s + 90].copy()
        if rng.random() < 0.5:
            r = (3 - r)[::-1]
        reads.append((r, 0, 0))
    ref = F.filter_kmers(reads, 31, stranded=False, min_obs=2)
    dev = F.filter_kmers_streaming(
        iter(reads), 31, stranded=False, min_obs=2, chunk_reads=32,
        data_reduce="none", merge="device", init_capacity=256,
    )
    assert np.array_equal(dev.kmers, ref.kmers)
    assert np.array_equal(dev.counts, ref.counts)
    assert np.array_equal(dev.exts, ref.exts)


def test_streaming_device_merge_rejects_labels():
    from tpu_debruijn import filter as F

    with pytest.raises(ValueError):
        F.filter_kmers_streaming(
            iter([]), 31, merge="device", data_reduce="label_first"
        )


def test_streaming_device_merge_u_overflow_replay(rng):
    """Chunk-unique capacity (U) overflow: the guarded merge drops the
    chunk, the lagged confirmation detects it, grows U, and replays —
    the final table must still equal the single-pass result exactly."""
    from tpu_debruijn import filter as F

    g = rng.integers(0, 4, 3000).astype(np.uint8)
    reads = []
    for _ in range(120):
        s = int(rng.integers(0, 2900))
        r = g[s : s + 90].copy()
        if rng.random() < 0.5:
            r = (3 - r)[::-1]
        reads.append((r, 0, 0))
    ref = F.filter_kmers(reads, 31, stranded=False, min_obs=1)
    # unique_capacity=64 << per-chunk uniques (32 reads x 60 kmers):
    # EVERY chunk overflows U at least once and goes through replay
    dev = F.filter_kmers_streaming(
        iter(reads), 31, stranded=False, min_obs=1, chunk_reads=32,
        data_reduce="none", merge="device", init_capacity=256,
        unique_capacity=64,
    )
    assert np.array_equal(dev.kmers, ref.kmers)
    assert np.array_equal(dev.counts, ref.counts)
    assert np.array_equal(dev.exts, ref.exts)


def test_colored_streaming_device_merge_equals_set_arrays(rng):
    """colored=True streaming (device (kmer,label) pair merge) must match
    the in-memory CountFilterSet path exactly: same table, same sorted
    deduplicated color sets per kmer (filter.rs:68-101 at scale)."""
    k = 25
    genomes = [O.random_dna(rng, 400) for _ in range(3)]
    reads = []
    for s, g in enumerate(genomes):
        for _ in range(40):
            p = int(rng.integers(0, len(g) - 60))
            r = np.asarray(g[p : p + 60], np.uint8)
            if rng.random() < 0.5:
                r = (3 - r[::-1]).astype(np.uint8)
            reads.append((r, 0, s))
    for min_obs in (1, 2):
        t_ref, pl_ref, sp_ref = F.filter_kmers_set_arrays(
            reads, k, stranded=False, min_obs=min_obs
        )
        t_str, pl_str, sp_str = F.filter_kmers_streaming(
            iter(reads), k, stranded=False, min_obs=min_obs,
            merge="device", colored=True, data_reduce="none",
            chunk_reads=32, init_capacity=8192,
        )
        assert np.array_equal(t_str.kmers, t_ref.kmers)
        assert np.array_equal(t_str.exts, t_ref.exts)
        assert np.array_equal(t_str.counts, t_ref.counts)
        assert np.array_equal(pl_str, pl_ref)
        assert np.array_equal(sp_str, sp_ref)

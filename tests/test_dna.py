"""DnaSeq / PackedSeqSet container tests (dna_string.rs:824-1112 suite
equivalents: push/extend layouts, slicing, rc, hamming, kmer iteration)."""

import numpy as np
import pytest

from tpu_debruijn import kmer as KM
from tpu_debruijn.dna import DnaSeq, PackedSeqSet, pack_bases, unpack_bases
from tpu_debruijn.kmer import KmerSpec


def test_pack_unpack_roundtrip(rng):
    for n in [0, 1, 15, 16, 17, 100, 1000]:
        b = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(unpack_bases(pack_bases(b), n), b)


def test_from_dna_string_roundtrip(rng):
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, 123))
    d = DnaSeq.from_dna_string(s)
    assert d.to_dna_string() == s
    assert len(d) == 123


def test_from_dna_only_string():
    segs = DnaSeq.from_dna_only_string("ACGTNNGGTT-CC")
    assert [s.to_dna_string() for s in segs] == ["ACGT", "GGTT", "CC"]


def test_from_acgt_bytes():
    d = DnaSeq.from_acgt_bytes(b"ACGTNacgtn")
    assert d.to_dna_string() == "ACGTAACGTA"  # non-ACGT -> A


def test_from_acgt_bytes_hashn():
    a = DnaSeq.from_acgt_bytes_hashn(b"ACNNGT", b"read1")
    b = DnaSeq.from_acgt_bytes_hashn(b"ACNNGT", b"read1")
    c = DnaSeq.from_acgt_bytes_hashn(b"ACNNGT", b"read2")
    assert a == b  # repeatable per name
    assert a.bases()[0] == 0 and a.bases()[1] == 1
    assert len(c) == 6  # different name: still valid, possibly different


def test_slices_and_rc(rng):
    b = rng.integers(0, 4, 77).astype(np.uint8)
    d = DnaSeq.from_bases(b)
    assert np.array_equal(d.prefix(10).bases(), b[:10])
    assert np.array_equal(d.suffix(13).bases(), b[-13:])
    assert np.array_equal(d.slice(5, 40).bases(), b[5:40])
    assert np.array_equal(d.rc().bases(), 3 - b[::-1])
    assert np.array_equal(d.reverse().bases(), b[::-1])
    assert d.rc().rc() == d


def test_get_kmer_matches_slices(rng):
    k = 21
    spec = KmerSpec(k)
    b = rng.integers(0, 4, 60).astype(np.uint8)
    d = DnaSeq.from_bases(b)
    for pos in range(60 - k + 1):
        want = KM.from_bases(spec, b[pos : pos + k])
        assert np.array_equal(d.get_kmer(k, pos), want)
    assert np.array_equal(d.first_kmer(k), KM.from_bases(spec, b[:k]))
    assert np.array_equal(d.last_kmer(k), KM.from_bases(spec, b[-k:]))
    ks = list(d.iter_kmers(k))
    assert len(ks) == 60 - k + 1


def test_hamming(rng):
    b = rng.integers(0, 4, 100).astype(np.uint8)
    c = b.copy()
    idx = rng.choice(100, 7, replace=False)
    for i in idx:
        c[i] = (c[i] + 1) % 4
    assert DnaSeq.from_bases(b).hamming_distance(DnaSeq.from_bases(c)) == 7


def test_packed_seq_set(rng):
    seqs = [rng.integers(0, 4, int(rng.integers(1, 50))).astype(np.uint8)
            for _ in range(20)]
    s = PackedSeqSet.from_arrays(seqs)
    assert len(s) == 20
    assert s.total_bases() == sum(len(q) for q in seqs)
    for i, q in enumerate(seqs):
        assert np.array_equal(s.get_bases(i), q)
        assert s.get(i) == DnaSeq.from_bases(q)

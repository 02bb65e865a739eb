"""Reference-derived validation vectors, transcribed literally from the
reference crate's doctests — NOT routed through the builder-authored
oracle, so they pin behavior to the reference's own published examples
(VERDICT r3 "missing" item 2).

Sources (input/output strings transcribed by hand):
  * /root/reference/src/kmer.rs:10-34        (crate-level Kmer16 doctest)
  * /root/reference/src/dna_string.rs:51-71  (DnaString doctest)
  * /root/reference/src/dna_string.rs:11-27  (module-level doctest)
  * /root/reference/src/lib.rs:51-108        (base-code contract the crate
    docs rely on: A=0 C=1 G=2 T=3, complement = !b & 0x3)
"""

import numpy as np

from tpu_debruijn import bases as B
from tpu_debruijn import kmer as KM
from tpu_debruijn.dna import DnaSeq
from tpu_debruijn.kmer import KmerSpec

import jax.numpy as jnp


def _kmer_str(spec, limbs):
    return KM.to_string(spec, np.asarray(limbs))


class TestKmerDoctest:
    """kmer.rs:10-34 — the crate's Kmer16 example, value for value."""

    spec = KmerSpec(16)

    def test_rc_involution(self):
        k1 = KM.from_string(self.spec, "ACGTACGTACGTACGT")
        rc_k1 = np.asarray(KM.rc(self.spec, jnp.asarray(k1)[None]))[0]
        k1_copy = np.asarray(KM.rc(self.spec, jnp.asarray(rc_k1)[None]))[0]
        assert np.array_equal(k1, k1_copy)

    def test_extend_left_T(self):
        # assert_eq!(k1.extend_left(base_to_bits(b'T')),
        #            Kmer16::from_ascii(b"TACGTACGTACGTACG"))
        k1 = KM.from_string(self.spec, "ACGTACGTACGTACGT")
        t = B.base_to_bits(ord("T"))
        assert t == 3
        ext = np.asarray(
            KM.extend_left(self.spec, jnp.asarray(k1)[None], np.uint32(t))
        )[0]
        assert _kmer_str(self.spec, ext) == "TACGTACGTACGTACG"

    def test_kmers_from_ascii_sorted(self):
        # let mut all_kmers = Kmer16::kmers_from_ascii(b"TACGTACGTACGTACGTT");
        # all_kmers.sort();  => [ACGT...ACGT, CGTA...GTT, TACG...TACG]
        all_kmers = KM.kmers_from_ascii(self.spec, b"TACGTACGTACGTACGTT")
        assert all_kmers.shape[0] == 3
        ints = sorted(KM.to_int(self.spec, all_kmers[i]) for i in range(3))
        expected = [
            KM.to_int(self.spec, KM.from_string(self.spec, s))
            for s in (
                "ACGTACGTACGTACGT",
                "CGTACGTACGTACGTT",
                "TACGTACGTACGTACG",
            )
        ]
        assert ints == expected


class TestDnaStringDoctest:
    """dna_string.rs:51-71 — the DnaString example."""

    def test_get(self):
        s = DnaSeq.from_dna_string("ATCGTACGTACGTAGTC")
        # assert_eq!(dna_string.get(0), 0); assert_eq!(dna_string.get(1), 3);
        assert s.get(0) == 0
        assert s.get(1) == 3

    def test_slice_kmer_iteration(self):
        # slc = dna_string.slice(1, 10);
        # slc.iter_kmers::<Kmer8>().next() ==
        #   dna_string.iter_kmers::<Kmer8>().skip(1).next()
        s = DnaSeq.from_dna_string("ATCGTACGTACGTAGTC")
        slc = s.slice_view(1, 10)
        spec = KmerSpec(8)
        first_of_slice = next(slc.iter_kmers(8))
        it = s.iter_kmers(8)
        next(it)
        second_of_string = next(it)
        assert np.array_equal(first_of_slice, second_of_string)
        # 8-mer count over a length-17 string is 10 (iteration parity)
        assert sum(1 for _ in s.iter_kmers(8)) == 10


class TestDnaStringModuleDoctest:
    """dna_string.rs:11-27 — module-level example: slice(10, 40) of the
    64bp string; first Kmer16 of the slice is CACGTATGACAGATAG."""

    def test_slice_get_kmer(self):
        s = DnaSeq.from_dna_string(
            "ACAGCAGCAGCACGTATGACAGATAGTGACAGCAGTTTGTGACCGCAAGAGCAGTAATATGATG"
        )
        slice1 = s.slice_view(10, 40)
        spec = KmerSpec(16)
        first_kmer = slice1.get_kmer(16, 0)
        expected = KM.from_string(spec, "CACGTATGACAGATAG")
        assert np.array_equal(first_kmer, expected)


class TestBaseCodeContract:
    """lib.rs:51-108 — the 2-bit alphabet the doctests rely on."""

    def test_base_to_bits(self):
        for ch, v in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
            assert B.base_to_bits(ord(ch)) == v
            assert B.base_to_bits(ord(ch.lower())) == v
        # unknown bases map to 0 (lib.rs:65-74)
        assert B.base_to_bits(ord("N")) == 0

    def test_complement_is_not_b_and_3(self):
        for b in range(4):
            assert B.complement(b) == (~b) & 0x3

    def test_bits_to_base_roundtrip(self):
        assert "".join(B.bits_to_base(b) for b in range(4)) == "ACGT"
        for b in range(4):
            assert B.bits_to_ascii(b) == ord(B.bits_to_base(b))

    def test_dna_only_base_to_bits(self):
        assert B.dna_only_base_to_bits(ord("A")) == 0
        assert B.dna_only_base_to_bits(ord("c")) == 1
        assert B.dna_only_base_to_bits(ord("N")) is None
        assert B.dna_only_base_to_bits(ord("-")) is None

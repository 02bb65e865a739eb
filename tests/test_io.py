"""Native codec + FASTA/FASTQ reader tests (bitops_avx2.rs test parity:
pattern + random round-trips, invalid-base detection vs the scalar path,
bitops_avx2.rs:134-278)."""

import numpy as np
import pytest

from tpu_debruijn import bases as B
from tpu_debruijn import io as IO
from tpu_debruijn.io import native as N


def test_native_loaded():
    assert IO.native_available(), "native codec .so missing (run make -C native)"


def test_ascii_roundtrip(rng):
    for _ in range(50):
        n = int(rng.integers(1, 300))
        codes = rng.integers(0, 4, n).astype(np.uint8)
        ascii_ = IO.codes_to_ascii(codes)
        back = IO.ascii_to_codes(ascii_)
        assert np.array_equal(back, codes)


def test_ascii_matches_scalar_reference(rng):
    alphabet = b"ACGTacgtNnXx$Q\n"
    for _ in range(50):
        n = int(rng.integers(1, 200))
        s = bytes(alphabet[i] for i in rng.integers(0, len(alphabet), n))
        codes, mask, bad = IO.ascii_to_codes(s, with_mask=True)
        # scalar oracle: lib.rs:65-92 semantics
        want_codes = np.array([B.base_to_bits(c) for c in s], np.uint8)
        want_mask = np.array([B.is_valid_base(c) for c in s], bool)
        assert np.array_equal(mask, want_mask)
        assert bad == int((~want_mask).sum())
        assert np.array_equal(codes[want_mask], want_codes[want_mask])


def test_pack_unpack_roundtrip(rng):
    for _ in range(30):
        n = int(rng.integers(1, 500))
        codes = rng.integers(0, 4, n).astype(np.uint8)
        words = IO.pack_codes(codes)
        assert np.array_equal(IO.unpack_codes(words, n), codes)
        # matches the engine's packing (dna.pack_bases)
        from tpu_debruijn.dna import pack_bases

        assert np.array_equal(words, pack_bases(codes))


def test_rc_codes(rng):
    codes = rng.integers(0, 4, 97).astype(np.uint8)
    assert np.array_equal(IO.rc_codes(IO.rc_codes(codes)), codes)
    assert np.array_equal(IO.rc_codes(codes), (3 - codes[::-1]))


def _codes_to_str(codes):
    return "".join("ACGT"[c] for c in codes)


def test_fasta_reader(tmp_path, rng):
    seqs = [rng.integers(0, 4, int(rng.integers(10, 200))) for _ in range(5)]
    path = tmp_path / "test.fa"
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">seq{i} desc\n")
            text = _codes_to_str(s)
            for j in range(0, len(text), 60):  # multi-line records
                f.write(text[j : j + 60] + "\n")
    got = IO.read_fasta(str(path))
    assert len(got) == len(seqs)
    for g, s in zip(got, seqs):
        assert np.array_equal(g, s.astype(np.uint8))


def test_fastq_reader(tmp_path, rng):
    seqs = [rng.integers(0, 4, 50) for _ in range(4)]
    path = tmp_path / "test.fq"
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@read{i}\n{_codes_to_str(s)}\n+\n{'I' * len(s)}\n")
    got = IO.read_fastq(str(path))
    assert len(got) == len(seqs)
    for g, s in zip(got, seqs):
        assert np.array_equal(g, s.astype(np.uint8))


def test_fastq_gz_reader(tmp_path, rng):
    import gzip

    seqs = [rng.integers(0, 4, 40) for _ in range(3)]
    path = tmp_path / "test.fq.gz"
    with gzip.open(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f"@read{i}\n{_codes_to_str(s)}\n+\n{'I' * len(s)}\n")
    got = IO.read_fastq(str(path))
    assert len(got) == len(seqs)
    for g, s in zip(got, seqs):
        assert np.array_equal(g, s.astype(np.uint8))


def test_python_fallback_parity(tmp_path, rng, monkeypatch):
    seqs = [rng.integers(0, 4, 64) for _ in range(3)]
    path = tmp_path / "t.fa"
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{_codes_to_str(s)}\n")
    native = IO.read_fasta(str(path))
    monkeypatch.setattr(N, "_LIB", None)
    monkeypatch.setattr(N, "_TRIED", True)
    fallback = IO.read_fasta(str(path))
    assert len(native) == len(fallback)
    for a, b in zip(native, fallback):
        assert np.array_equal(a, b)


def test_stream_fastx_blocks_feeds_streaming(rng, tmp_path):
    """Native batched FASTX -> PackedReadBlock -> filter_kmers_streaming
    (device merge) equals filter_kmers on the same reads (the production
    file-fed streaming path, end to end)."""
    from tpu_debruijn import filter as F
    from tpu_debruijn.io import native as N
    from tpu_debruijn.io import stream_fastx_blocks
    from tpu_debruijn.bases import bases_to_str

    if not N.native_available():
        pytest.skip("native library not built")
    k = 21
    reads = [rng.integers(0, 4, int(rng.integers(40, 90))).astype(np.uint8)
             for _ in range(300)]
    p = tmp_path / "reads.fa"
    with open(p, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{bases_to_str(r)}\n")

    t_ref = F.filter_kmers([(r, 0, 0) for r in reads], k, stranded=False,
                           min_obs=1)
    t_str = F.filter_kmers_streaming(
        stream_fastx_blocks(str(p), block_reads=64), k, stranded=False,
        min_obs=1, merge="device", data_reduce="none", chunk_reads=256,
        init_capacity=8192,
    )
    assert np.array_equal(t_str.kmers, t_ref.kmers)
    assert np.array_equal(t_str.exts, t_ref.exts)
    assert np.array_equal(t_str.counts, t_ref.counts)

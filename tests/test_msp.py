"""MSP scanner parity vs oracle + msp.rs:404-486 invariants."""

import numpy as np
import pytest

from tpu_debruijn import msp as M
from tpu_debruijn.oracle import ref as O


def _cmp(seqs, k, p, perm, rc):
    got = M.msp_sequences(seqs, k, p, perm, rc=rc)
    for s, g in zip(seqs, got):
        want = O.msp_sequence(
            list(s), k, p, None if perm is None else list(perm), rc=rc
        )
        gg = [(b, e, tuple(int(x) for x in sub)) for b, e, sub in g]
        ww = [(b, e, tuple(sub)) for b, e, sub in want]
        assert gg == ww


@pytest.mark.parametrize("k,p", [(16, 6), (35, 5), (50, 8), (32, 16)])
@pytest.mark.parametrize("rc", [True, False])
def test_msp_parity(k, p, rc, rng):
    lens = [int(x) for x in rng.integers(k, 4 * k, 5)]
    seqs = [rng.integers(0, 4, L).astype(np.uint8) for L in lens]
    _cmp(seqs, k, p, None, rc)


def test_msp_permutation(rng):
    k, p = 31, 6
    perm = rng.permutation(4**p).astype(np.int32)
    seqs = [rng.integers(0, 4, int(L)).astype(np.uint8) for L in rng.integers(k, 5 * k, 4)]
    _cmp(seqs, k, p, perm, True)


def test_msp_blank():
    # degenerate all-A sequences (msp.rs:517-528)
    for L in [31, 40, 64]:
        _cmp([np.zeros(L, np.uint8)], 31, 6, None, True)


@pytest.mark.parametrize("k,p", [(24, 6), (16, 5), (31, 8), (48, 12), (64, 15)])
def test_msp_invariants(rng, k, p):
    # check_msp_slices invariants (msp.rs:404-486) over the reference's
    # k x p sweep range (msp.rs:488-542): every kmer covered exactly once,
    # p <= len <= 2k-p, reported minimizer is the canonical minimal pmer
    for _ in range(3):
        L = int(rng.integers(2 * k, 6 * k))
        s = rng.integers(0, 4, L).astype(np.uint8)
        parts = M.msp_sequence(s, k, p, None, rc=True)
        sc = lambda pv: min(pv, O.OKmer.rc(p, pv))
        covered = np.zeros(L - k + 1, int)
        cursor = 0
        for bucket, exts, sub in parts:
            assert p <= len(sub) <= 2 * k - p
            # locate this interval (contiguous partition by construction)
            start = cursor
            nk = len(sub) - k + 1
            covered[start : start + nk] += 1
            cursor = start + nk
            # reported bucket is canonical minimal pmer of the slice
            best = min(
                sc(O.OKmer.from_bases(sub[i : i + p])) for i in range(len(sub) - p + 1)
            )
            assert bucket == best
        assert (covered == 1).all()


def test_msp_short_seq_empty():
    assert M.msp_sequence(np.zeros(10, np.uint8), 31, 6) == []


def _pmer_ranks(s: np.ndarray, p: int) -> np.ndarray:
    """Vectorized lexicographic ranks of every p-mer of s (p <= 16)."""
    n = len(s) - p + 1
    pw = 4 ** np.arange(p - 1, -1, -1, dtype=np.int64)
    idx = np.arange(n)[:, None] + np.arange(p)[None, :]
    return s.astype(np.int64)[idx].dot(pw)


def _pmer_rc_ranks(s: np.ndarray, p: int) -> np.ndarray:
    return _pmer_ranks((3 - s[::-1]).astype(np.uint8), p)[::-1]


# the reference's sweep range (msp.rs:488-542): k=16..64 x
# p in {5,8,10,12,14,15,16} x {lexicographic, at_count} scores.  The
# identity score runs the FULL k x p cross product; the permutation and
# at_count-analog scores are table-driven in this engine (score[rank]),
# so their p range is capped by table size (4^p entries: p <= 12 for
# perm, p <= 10 for at_count).  Each cell runs >= 10 reps with one XLA
# compile per cell.
_KSWEEP = (16, 24, 32, 48, 64)
_PSWEEP = (5, 8, 10, 12, 14, 15, 16)
SWEEP = (
    [("identity", k, p) for k in _KSWEEP for p in _PSWEEP]
    + [("perm", k, p) for k in _KSWEEP for p in _PSWEEP if p <= 12]
    + [("at_count", k, p) for k in _KSWEEP for p in (5, 8, 10)]
)


@pytest.mark.parametrize("score,k,p", SWEEP)
def test_msp_invariants_sweep(rng, k, p, score):
    """check_msp_slices invariants (msp.rs:404-486) over the reference's
    sweep breadth, >= 20 reps per cell, vectorized checking:
      * every kmer covered exactly once (contiguous partition),
      * p <= slice_len <= 2k - p,
      * the reported bucket is the canonical rank of a slice pmer that
        achieves the slice's minimal score under the active score fn.
    Exact tie-breaking is pinned separately by oracle parity
    (test_msp_parity / test_msp_permutation / golden snapshots)."""
    if p >= k:
        pytest.skip("p must be < k")
    reps = 20
    perm = None
    if score == "perm":
        perm = rng.permutation(4 ** p).astype(np.int64)
    elif score == "at_count":
        # at_count-analog score fn (msp.rs:488-542's second score): heavy
        # ties exercise the rightmost tie-break + the mid-window
        # strictly-smaller adoption rule
        r = np.arange(4 ** p, dtype=np.int64)
        t = np.zeros(4 ** p, np.int64)
        for j in range(p):
            b = (r >> (2 * j)) & 3
            t += ((b == 0) | (b == 3)).astype(np.int64)
        perm = t
    L = 3 * k  # one padded shape per cell -> one compile
    seqs = [rng.integers(0, 4, L).astype(np.uint8) for _ in range(reps)]
    outs = M.msp_sequences(
        seqs, k, p, None if perm is None else perm.astype(np.int32), rc=True
    )
    for s, parts in zip(seqs, outs):
        ranks = _pmer_ranks(s, p)
        rc_ranks = _pmer_rc_ranks(s, p)
        canon = np.minimum(ranks, rc_ranks)
        if perm is None:
            scores = np.minimum(ranks, rc_ranks)
        else:
            scores = np.minimum(perm[ranks], perm[rc_ranks])
        cursor = 0
        covered = 0
        for bucket, exts, sub in parts:
            assert p <= len(sub) <= 2 * k - p
            nk = len(sub) - k + 1
            start = cursor  # slices partition the kmer positions in order
            # slice pmers = positions [start, start + len(sub) - p]
            sl = slice(start, start + len(sub) - p + 1)
            best = scores[sl].min()
            achievers = canon[sl][scores[sl] == best]
            assert bucket in achievers
            covered += nk
            cursor += nk
        assert covered == L - k + 1


def test_score_table_from_fn(rng):
    """Arbitrary score functions via score_table_from_fn (msp.rs:166's
    Fn(K)->D power): an at_count score built from a callable matches the
    hand-built table, vectorized and scalar forms agree."""
    import numpy as np
    from tpu_debruijn import msp as M

    p = 5

    def at_count_vec(ranks):
        c = np.zeros_like(ranks, dtype=np.int32)
        r = ranks.copy()
        for _ in range(p):
            b = r & 3
            c += ((b == 0) | (b == 3)).astype(np.int32)
            r >>= 2
        return c

    tbl = M.score_table_from_fn(p, at_count_vec)

    def at_count_scalar(rank):
        c = 0
        for _ in range(p):
            b = rank & 3
            c += 1 if b in (0, 3) else 0
            rank >>= 2
        return c

    tbl2 = M.score_table_from_fn(p, at_count_scalar)
    assert np.array_equal(tbl, tbl2)

    # drives the scanner like any score table
    seq = rng.integers(0, 4, 80).astype(np.uint8)
    iv = M.msp_sequence(seq, 16, p, permutation=tbl, rc=False)
    assert len(iv) >= 1
    assert sum(len(s[2]) - 16 + 1 for s in iv) == len(seq) - 16 + 1


@pytest.mark.parametrize("rc", [True, False])
def test_simple_scan_matches_msp_sequence(rng, rc):
    # msp.rs:61-93: simple_scan is Scanner with a permutation score; its
    # intervals must name the same substrings/buckets msp_sequence emits
    k, p = 20, 6
    perm = rng.permutation(4**p).astype(np.int32)
    for L in [k, 37, 95]:
        s = rng.integers(0, 4, L).astype(np.uint8)
        ivs = M.simple_scan(k, s, perm, rc=rc)
        parts = M.msp_sequence(s, k, p, perm, rc=rc)
        assert len(ivs) == len(parts)
        cursor = 0
        for iv, (bucket, exts, sub) in zip(ivs, parts):
            assert iv.bucket == bucket
            assert iv.len == len(sub)
            assert iv.start == cursor
            assert iv.end == cursor + iv.len
            np.testing.assert_array_equal(s[iv.start : iv.end], sub)
            cursor += len(sub) - k + 1  # next interval starts at next kmer
        # the partition tiles every kmer of the read exactly once
        assert cursor == L - k + 1


def test_simple_scan_validation():
    with pytest.raises(ValueError):
        M.simple_scan(31, np.zeros(10, np.uint8))  # shorter than k
    with pytest.raises(ValueError):
        M.simple_scan(16, np.zeros(20, np.uint8), p=9)  # p > 8
    with pytest.raises(ValueError):
        M.simple_scan(16, np.zeros(20, np.uint8), np.zeros(100, np.int32))

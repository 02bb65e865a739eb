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


@pytest.mark.parametrize("k,p", [(16, 6), (35, 5), (50, 8)])
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

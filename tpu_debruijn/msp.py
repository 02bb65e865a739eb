"""Minimum-substring-partition (MSP) sharding: vectorized minimizer scan.

Reference: /root/reference/src/msp.rs (Scanner :159-277, msp_sequence
:279-324; algorithm from MSPKmerCounter, Li 2015).  Semantics reproduced
exactly, including the MinPos tie-break (equal scores prefer the
*rightmost* position, msp.rs:127-141) and the incremental re-scan rule
(a new minimum is only adopted mid-window when strictly smaller,
msp.rs:237-248) — but computed as:

* one packed-window pass for all p-mer ranks (reusing the kmer extractor),
* a log-step sparse-table windowed minimum for the re-scan values,
* a single lax.scan over positions carrying the (value, position) state,
  vectorized across the read batch.

Every kmer of a read lands in exactly one interval; intervals are
p <= len <= 2k-p bases; the bucket id is the canonicalized minimizer rank
(msp.rs:115-117) — the shard key for multi-chip distribution.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_debruijn import filter as F
from tpu_debruijn import kmer as KM
from tpu_debruijn import sorting as S
from tpu_debruijn.kmer import KmerSpec

INF = jnp.int32(np.iinfo(np.int32).max)


def pmer_ranks(p: int, bases, lengths):
    """Ranks of all p-mers: (R, L-p+1) int32 bit patterns (p <= 16).

    For p = 16 the rank occupies all 32 bits, so the int32 VIEW may be
    negative; compare via :func:`_order_key`, which restores unsigned
    order (the reference compares u64 ranks, msp.rs:115-117).
    """
    spec = KmerSpec(p)
    assert spec.w == 1
    kmers, _, valid = F.extract_kmers(
        spec, bases, lengths, jnp.zeros(bases.shape[0], jnp.int32)
    )
    return kmers[..., 0].astype(jnp.int32), valid


def _order_key(ranks):
    """Order-preserving int32 key for uint32 rank bit patterns: XOR the
    sign bit maps unsigned order onto signed order (needed only for p=16,
    where ranks fill 32 bits; a no-op shift for smaller p)."""
    return ranks ^ jnp.int32(-(2**31))


def _rc_rank(p: int, ranks):
    spec = KmerSpec(p)
    return KM.rc(spec, ranks.astype(jnp.uint32)[..., None])[..., 0].astype(jnp.int32)


def _best(av, ap, bv, bp):
    """MinPos combine: value ascending, ties prefer larger position."""
    take_b = (bv < av) | ((bv == av) & (bp > ap))
    return jnp.where(take_b, bv, av), jnp.where(take_b, bp, ap)


def _window_min(scores, w: int):
    """Sparse-table windowed min over [i, i+w) with rightmost tie-break.

    scores: (R, N).  Returns (vals, poss) of shape (R, N) where entry i
    reduces positions i..i+w-1 (positions beyond N treated as +inf).
    """
    r, n = scores.shape
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (r, n))
    fv, fp = scores, pos
    level = 1
    tables = [(fv, fp)]
    while level * 2 <= w:
        sv = jnp.concatenate([fv[:, level:], jnp.full((r, level), INF)], axis=1)
        sp = jnp.concatenate([fp[:, level:], jnp.zeros((r, level), jnp.int32)], axis=1)
        fv, fp = _best(fv, fp, sv, sp)
        level *= 2
        tables.append((fv, fp))
    # combine [i, i+level) and [i+w-level, i+w)
    gv, gp = tables[-1]
    off = w - level
    sv = jnp.concatenate([gv[:, off:], jnp.full((r, off), INF)], axis=1)
    sp = jnp.concatenate([gp[:, off:], jnp.zeros((r, off), jnp.int32)], axis=1)
    return _best(gv, gp, sv, sp)


def msp_scan_batch(
    k: int,
    p: int,
    bases,
    lengths,
    permutation=None,
    rc: bool = True,
):
    """Vectorized Scanner::scan over a read batch.

    Returns per-position arrays of shape (R, Lk) (Lk = L-k+1):
      new_interval: bool, True where a new interval starts at kmer index i
      min_rank:     minimizer p-mer rank for the interval active at i
      min_pos:      minimizer position
      valid:        i is a real kmer start (i <= len-k)
    """
    rr, l = bases.shape
    lk = l - k + 1
    ranks, _ = pmer_ranks(p, bases, lengths)
    if permutation is not None:
        if p > 15:
            raise ValueError("permutation scoring requires p <= 15 "
                             "(int32 table indexing)")
        perm = jnp.asarray(permutation, jnp.int32)
        scores = perm[ranks]
        if rc:
            scores = jnp.minimum(scores, perm[_rc_rank(p, ranks)])
    else:
        scores = _order_key(ranks)
        if rc:
            scores = jnp.minimum(scores, _order_key(_rc_rank(p, ranks)))

    w = k - p + 1
    wv, wp = _window_min(scores, w)

    lengths = jnp.asarray(lengths, jnp.int32)

    def step(carry, i):
        mval, mpos = carry
        end_pos = i + (k - p)
        end_val = scores[:, end_pos]
        rescan = i > mpos
        nv = jnp.where(rescan, wv[:, i], jnp.where(end_val < mval, end_val, mval))
        npos = jnp.where(rescan, wp[:, i], jnp.where(end_val < mval, end_pos, mpos))
        flag = rescan | (end_val < mval)
        return (nv, npos), (flag, nv, npos)

    init = (wv[:, 0], wp[:, 0])
    if lk > 1:
        (_, _), (flags, mvals, mposs) = jax.lax.scan(
            step, init, jnp.arange(1, lk, dtype=jnp.int32)
        )
        flags = jnp.concatenate([jnp.ones((1, rr), bool), flags], axis=0).T
        mvals = jnp.concatenate([init[0][None], mvals], axis=0).T
        mposs = jnp.concatenate([init[1][None], mposs], axis=0).T
    else:
        flags = jnp.ones((rr, 1), bool)
        mvals = init[0][:, None]
        mposs = init[1][:, None]

    pos = jnp.arange(lk, dtype=jnp.int32)[None, :]
    valid = pos <= (lengths[:, None] - k)
    min_rank = jnp.take_along_axis(ranks, jnp.clip(mposs, 0, ranks.shape[1] - 1), 1)
    return flags & valid, min_rank, mposs, valid


def msp_intervals_device(
    k: int,
    p: int,
    bases,
    lengths,
    permutation=None,
    rc: bool = True,
):
    """Flattened interval table for a read batch (jit-friendly).

    Returns dict of (n,) arrays (n = R*(L-k+1) capacity, first n_intervals
    slots real): read, start, length, minimizer_rank, minimizer_pos,
    bucket (canonical minimizer rank), exts; plus n_intervals.
    """
    rr, l = bases.shape
    lk = l - k + 1
    flags, min_rank, min_pos, valid = msp_scan_batch(
        k, p, bases, lengths, permutation, rc
    )
    lengths = jnp.asarray(lengths, jnp.int32)

    # interval start positions: flagged kmer indices; interval end =
    # next flagged start within the same read (or len-k), so
    # len = next_start + k - 1 - start (msp.rs:253-273)
    n = rr * lk
    read_id = jnp.broadcast_to(jnp.arange(rr, dtype=jnp.int32)[:, None], (rr, lk))
    pos = jnp.broadcast_to(jnp.arange(lk, dtype=jnp.int32)[None, :], (rr, lk))

    fflat = flags.reshape(n)
    # next interval start at each position (within read): scan from right
    nxt = jnp.where(flags, pos, lk + jnp.zeros_like(pos))
    nxt = jax.lax.associative_scan(jnp.minimum, nxt[:, ::-1], axis=1)[:, ::-1]
    # nxt[i] = first flagged position >= i; we need the next one AFTER i
    nxt_after = jnp.concatenate(
        [nxt[:, 1:], jnp.full((rr, 1), lk, jnp.int32)], axis=1
    )
    last_start = lengths[:, None] - k  # final kmer index per read
    next_start = jnp.minimum(nxt_after, last_start + 1)
    ilen = jnp.where(
        next_start <= last_start,
        next_start + (k - 1) - pos,
        lengths[:, None] - pos,
    )

    # exts of the substring within the read (lib.rs:645-660)
    bi = jnp.asarray(bases, jnp.int32)
    left_base = jnp.take_along_axis(bi, jnp.clip(pos - 1, 0, l - 1), 1)
    left_nib = jnp.where(pos > 0, jnp.left_shift(1, left_base), 0)
    right_idx = pos + ilen
    right_base = jnp.take_along_axis(bi, jnp.clip(right_idx, 0, l - 1), 1)
    right_nib = jnp.where(right_idx < lengths[:, None], jnp.left_shift(1, right_base), 0)
    iexts = (left_nib & 0xF) | ((right_nib & 0xF) << 4)

    spec_p = KmerSpec(p)
    bucket = KM.min_rc(spec_p, min_rank.astype(jnp.uint32)[..., None])[..., 0]

    sel = fflat
    cnt, (o_read, o_start, o_len, o_rank, o_mpos, o_bucket, o_exts) = S.partition(
        sel,
        [
            read_id.reshape(n),
            pos.reshape(n),
            ilen.reshape(n),
            min_rank.reshape(n),
            min_pos.reshape(n),
            bucket.reshape(n).astype(jnp.int32),
            iexts.reshape(n),
        ],
    )
    return {
        "n_intervals": cnt,
        "read": o_read,
        "start": o_start,
        "length": o_len,
        "minimizer_rank": o_rank,
        "minimizer_pos": o_mpos,
        "bucket": o_bucket,
        "exts": o_exts,
    }


def gather_interval_bases(k: int, p: int, bases, intervals):
    """Extract interval substrings into a (n, 2k-p) padded matrix."""
    maxlen = 2 * k - p
    bi = jnp.asarray(bases, jnp.int32)
    l = bi.shape[1]
    t = jnp.arange(maxlen, dtype=jnp.int32)[None, :]
    idx = intervals["start"][:, None] + t
    sub = bi[intervals["read"][:, None], jnp.clip(idx, 0, l - 1)]
    mask = t < intervals["length"][:, None]
    return jnp.where(mask, sub, 0)


# ---------------------------------------------------------------------------
# host API mirroring msp.rs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MspInterval:
    """msp.rs:13-51 equivalent: one MSP substring of a sequence.

    ``bucket`` is the rc-canonicalized minimizer p-mer value (the shard
    key, msp.rs:115-117); ``start``/``len`` delimit the substring.
    """

    bucket: int
    start: int
    len: int

    @property
    def end(self) -> int:
        return self.start + self.len

    @property
    def range(self) -> range:
        return range(self.start, self.start + self.len)


def simple_scan(
    k: int,
    seq,
    permutation: Optional[np.ndarray] = None,
    rc: bool = True,
    p: Optional[int] = None,
) -> List[MspInterval]:
    """msp.rs:61-93 equivalent (deprecated there in favor of ``Scanner``;
    kept for API parity).  MSP intervals of one sequence, scored through
    ``permutation`` (identity order when None).  ``p`` is inferred from
    ``len(permutation)`` when a table is given (the reference infers it
    from the P type parameter), else defaults to the reference's cap 8.
    """
    seq = np.asarray(seq, np.uint8)
    if permutation is not None:
        permutation = np.asarray(permutation)
        if p is None:
            p = max(1, (len(permutation).bit_length() - 1) // 2)
        if 4**p != len(permutation):
            raise ValueError(
                f"permutation has {len(permutation)} entries, not 4^p"
            )
    elif p is None:
        p = 8
    if p > 8:
        raise ValueError("simple_scan requires p <= 8 (msp.rs:68)")
    if len(seq) < k:
        raise ValueError("can't partition strings shorter than k (msp.rs:66)")
    bases, lengths = F.pad_reads([seq], min_len=k, pad_to=16)
    perm = None if permutation is None else jnp.asarray(permutation, jnp.int32)
    iv = msp_intervals_device(
        k, p, jnp.asarray(bases), jnp.asarray(lengths), perm, rc
    )
    n = int(iv["n_intervals"])
    starts = np.asarray(iv["start"])[:n]
    lens = np.asarray(iv["length"])[:n]
    buckets = np.asarray(iv["bucket"])[:n]
    return [
        MspInterval(int(np.uint32(buckets[j])), int(starts[j]), int(lens[j]))
        for j in range(n)
    ]


def score_table_from_fn(p: int, fn) -> np.ndarray:
    """Materialize an arbitrary p-mer score function as a 4^p table.

    The reference Scanner takes any ``Fn(K) -> D`` score (msp.rs:166);
    this engine scores via a rank-indexed table (``permutation`` in the
    scan APIs is really the GENERAL score table — any total order, not
    just permutations).  ``fn`` receives the (4^p,) uint32 array of all
    p-mer lexicographic ranks and returns int scores (vectorized), or a
    scalar Python callable applied per rank.  Requires p <= 13 (int32
    table of 64M entries); the reference's own tests cap at p = 16 with
    table-expressible scores (lexicographic, at_count — msp.rs:488-542).
    """
    if p > 13:
        raise ValueError("score_table_from_fn requires p <= 13")
    ranks = np.arange(4 ** p, dtype=np.uint32)
    try:
        out = np.asarray(fn(ranks), np.int32)
        if out.shape != ranks.shape:
            raise TypeError
    except (TypeError, ValueError):
        out = np.fromiter((fn(int(r)) for r in ranks), np.int32, len(ranks))
    return out


def inverse_frequency_score_table(p: int, bases, lengths=None) -> np.ndarray:
    """Load-balancing p-mer score table from a corpus sample
    (msp.rs:57-59, :298-311 role: the reference threads a permutation
    through msp_sequence so frequent minimizers stop dominating buckets).

    Scores p-mers by ascending corpus frequency: rare p-mers get LOW
    scores and win window minima, so no single frequent p-mer (poly-A
    runs are the classic offender) collects a giant bucket.  Counting is
    canonical (a p-mer and its RC share a frequency) to match the
    ``rc=True`` scan.  Ties break lexicographically (stable argsort), so
    the table is deterministic.

    ``bases``: (R, L) sample read matrix (a few thousand reads suffice).
    Returns a (4^p,) int32 score table for the ``permutation`` scan arg.
    """
    if p > 13:
        raise ValueError("inverse_frequency_score_table requires p <= 13")
    b = np.asarray(bases, np.int64)
    r, l = b.shape
    if l < p:
        raise ValueError(f"sample reads shorter than p={p}")
    ranks = np.zeros((r, l - p + 1), np.int64)
    for j in range(p):
        ranks = (ranks << 2) | b[:, j : j + l - p + 1]
    if lengths is not None:
        ll = np.asarray(lengths)[:, None]
        mask = np.arange(l - p + 1)[None, :] <= (ll - p)
        ranks = ranks[mask]
    hist = np.bincount(ranks.reshape(-1), minlength=4 ** p)
    # canonical: fold rc counts together
    rcr = np.arange(4 ** p, dtype=np.int64)
    rc = np.zeros_like(rcr)
    for _ in range(p):
        rc = (rc << 2) | (3 - (rcr & 3))
        rcr >>= 2
    hist = hist + hist[rc]
    order = np.argsort(hist, kind="stable")
    score = np.empty(4 ** p, np.int32)
    score[order] = np.arange(4 ** p, dtype=np.int32)
    return score


@partial(jax.jit, static_argnums=(0, 1, 4))
def _msp_jit(k, p, bases, lengths, rc, permutation):
    iv = msp_intervals_device(k, p, bases, lengths, permutation, rc)
    sub = gather_interval_bases(k, p, bases, iv)
    return iv, sub


def msp_sequence(
    seq,
    k: int,
    p: int,
    permutation: Optional[np.ndarray] = None,
    rc: bool = True,
) -> List[Tuple[int, int, np.ndarray]]:
    """msp.rs:279-324 equivalent: one read -> [(bucket, exts, sub_bases)]."""
    out = msp_sequences([np.asarray(seq, np.uint8)], k, p, permutation, rc)
    return out[0]


def msp_sequences(seqs, k: int, p: int, permutation=None, rc: bool = True):
    """Batch host API: list of base arrays -> per-read interval lists."""
    keep = [i for i, s in enumerate(seqs) if len(s) >= k]
    results: List[List[Tuple[int, int, np.ndarray]]] = [[] for _ in seqs]
    if not keep:
        return results
    bases, lengths = F.pad_reads([seqs[i] for i in keep], min_len=k, pad_to=16)
    perm = None if permutation is None else jnp.asarray(permutation, jnp.int32)
    iv, sub = _msp_jit(k, p, jnp.asarray(bases), jnp.asarray(lengths), rc, perm)
    n = int(iv["n_intervals"])
    read = np.asarray(iv["read"])[:n]
    length = np.asarray(iv["length"])[:n]
    bucket = np.asarray(iv["bucket"])[:n]
    exts = np.asarray(iv["exts"])[:n]
    sub = np.asarray(sub)[:n]
    for j in range(n):
        results[keep[read[j]]].append(
            # bucket is the uint32 canonical rank stored in int32 lanes
            (int(np.uint32(bucket[j])), int(exts[j]),
             sub[j, : length[j]].astype(np.uint8))
        )
    return results

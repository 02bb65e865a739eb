"""Fused pack + extract + canonicalize + exts kernel (SURVEY §7 step 7).

The counting pipeline's front half — 2-bit packing, kmer window
extraction, canonical min(kmer, rc) with the Exts flip — in ONE Pallas
VMEM pass over the raw base matrix: bases are read from HBM exactly once
and only the canonical limbs/exts/valid planes are written back.  This is
the TPU counterpart of the reference's AVX2 pack kernels
(bitops_avx2.rs:9-42) fused with the per-kmer canonicalization loop
(filter.rs:190-196).

Key trick: with the raw bases resident in VMEM, the reverse complement
needs no reverse_by_twos bit ladder — the rc kmer at position s is just
the same shift-accumulate pack applied to the complemented window read
backwards (base[s+k-1-t] for term t), so forward and rc limbs cost the
same k fused multiply-shift-accumulate sweeps.

Layout: grid over read-row blocks; lanes = kmer positions.  The wrapper
pads L so the position axis is a lane multiple.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_debruijn.kmer import KmerSpec

LANES = 128
BLOCK_ROWS = 256


def _pack_window(b, c0, nb, lk):
    """Pack ``nb`` bases starting at column offset ``c0`` of every
    position: out[:, s] = sum_t b[:, s + c0 + t] << 2*(nb-1-t)."""
    acc = jnp.zeros(b.shape[:1] + (lk,), jnp.uint32)
    for t in range(nb):
        col = c0 + t
        acc = (acc << np.uint32(2)) | b[:, col : col + lk].astype(jnp.uint32)
    return acc


def _pack_window_rc(b, k, nb_low, j, w, lk):
    """rc limb j: pack complemented bases read backwards.

    rc kmer base t (0-based, MSB-first across the whole kmer) =
    3 - base[s + k - 1 - t]; limb j covers kmer bases
    [t0, t0 + nb) where t0 = 0 for limb 0 (nb = nb_low) and
    t0 = nb_low + 16*(j-1) otherwise (nb = 16).
    """
    nb = nb_low if j == 0 else 16
    t0 = 0 if j == 0 else nb_low + 16 * (j - 1)
    acc = jnp.zeros(b.shape[:1] + (lk,), jnp.uint32)
    for t in range(t0, t0 + nb):
        col = k - 1 - t
        base = b[:, col : col + lk].astype(jnp.uint32)
        acc = (acc << np.uint32(2)) | (base ^ np.uint32(3))
    return acc


def _kernel(spec: KmerSpec, stranded: bool, lk: int, *refs):
    """refs: bases(bm, Lp), lengths(bm, 1), seq_exts(bm, 1),
    then outputs: W limb planes (bm, lk), exts, valid."""
    k, w = spec.k, spec.w
    b = refs[0][:]
    lengths = refs[1][:]  # (bm, 1)
    seq_exts = refs[2][:]
    out_limbs = refs[3 : 3 + w]
    exts_out = refs[3 + w]
    valid_out = refs[4 + w]

    nb_low = k - 16 * (w - 1)  # bases in the (partial) top limb

    # forward limbs: limb 0 covers kmer bases [0, nb_low), limb j>0
    # covers [nb_low + 16(j-1), ...)
    fwd = []
    rcl = []
    for j in range(w):
        c0 = 0 if j == 0 else nb_low + 16 * (j - 1)
        nb = nb_low if j == 0 else 16
        fwd.append(_pack_window(b, c0, nb, lk))
        if not stranded:
            rcl.append(_pack_window_rc(b, k, nb_low, j, w, lk))

    if stranded:
        canon = fwd
        flip = jnp.zeros(fwd[0].shape, jnp.bool_)
    else:
        lt = jnp.zeros(fwd[0].shape, jnp.bool_)
        eq = jnp.ones(fwd[0].shape, jnp.bool_)
        for j in range(w):
            lt = lt | (eq & (fwd[j] < rcl[j]))
            eq = eq & (fwd[j] == rcl[j])
        flip = ~lt  # lib.rs:224-231
        canon = [jnp.where(flip, rcl[j], fwd[j]) for j in range(w)]

    # extension nibbles (KmerExtsIter, lib.rs:809-842)
    bm = b.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (bm, lk), 1)
    se = seq_exts.astype(jnp.int32)
    left_prev = b[:, 0 : lk - 1] if lk > 1 else b[:, :0]
    left_shift = jnp.concatenate(
        [jnp.zeros((bm, 1), jnp.int32),
         jnp.left_shift(1, left_prev.astype(jnp.int32))], axis=1,
    )
    left_nib = jnp.where(pos == 0, se & 0x0F, left_shift)
    rb = b[:, k : k + lk]  # caller pads so k + lk <= Lp
    at_right_end = pos == (lengths.astype(jnp.int32) - k)
    right_nib = jnp.where(
        at_right_end, (se >> 4) & 0x0F, jnp.left_shift(1, rb.astype(jnp.int32))
    )
    exts = (left_nib & 0x0F) | ((right_nib & 0x0F) << 4)
    if not stranded:
        # Exts::rc on flip (lib.rs:746): swap nibbles + reverse nibble bits
        e = ((exts & 0x0F) << 4) | ((exts >> 4) & 0x0F)
        e = ((e & 0x55) << 1) | ((e >> 1) & 0x55)
        e = ((e & 0x33) << 2) | ((e >> 2) & 0x33)
        exts = jnp.where(flip, e, exts)

    for j in range(w):
        out_limbs[j][:] = canon[j]
    exts_out[:] = exts
    valid_out[:] = (pos <= (lengths.astype(jnp.int32) - k)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _call(spec: KmerSpec, stranded: bool, interpret: bool, bases, lengths, seq_exts):
    r, lp = bases.shape
    k, w = spec.k, spec.w
    lk = lp - k  # caller guarantees lp = lkp + k (one halo col for rb)
    bm = min(BLOCK_ROWS, r)
    grid = (pl.cdiv(r, bm),)
    in_specs = [
        pl.BlockSpec((bm, lp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    plane = pl.BlockSpec((bm, lk), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = (
        [jax.ShapeDtypeStruct((r, lk), jnp.uint32) for _ in range(w)]
        + [jax.ShapeDtypeStruct((r, lk), jnp.int32),
           jax.ShapeDtypeStruct((r, lk), jnp.int32)]
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, spec, stranded, lk),
        grid=grid,
        in_specs=in_specs,
        out_specs=[plane] * (w + 2),
        out_shape=out_shape,
        interpret=interpret,
    )(bases, lengths, seq_exts)
    limbs = jnp.stack(outs[:w], axis=-1)  # (R, lk, W)
    return limbs, outs[w], outs[w + 1].astype(bool)


def extract_canonical_fused(
    spec: KmerSpec, bases, lengths, seq_exts, stranded: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused front half of counting: (R, L) codes -> (canonical kmers
    (R, Lk, W), exts (R, Lk), valid (R, Lk)); Lk = L - K + 1.

    Drop-in for filter.extract_kmers + filter.canonicalize.
    """
    from tpu_debruijn.kernels.canonical import pallas_enabled

    r, l = bases.shape
    k = spec.k
    if l < k:
        raise ValueError(f"padded read length {l} < K={k}")
    lk = l - k + 1
    lkp = -(-lk // LANES) * LANES
    lp = lkp + k  # halo so the right-ext column b[:, s+k] always exists
    b = jnp.asarray(bases, jnp.int32)
    if lp > l:
        b = jnp.pad(b, ((0, 0), (0, lp - l)))
    else:
        b = b[:, :lp]
    lengths2 = jnp.asarray(lengths, jnp.int32).reshape(r, 1)
    seq_exts2 = jnp.asarray(seq_exts, jnp.int32).reshape(r, 1)
    limbs, exts, valid = _call(
        spec, stranded, not pallas_enabled(), b, lengths2, seq_exts2
    )
    return limbs[:, :lk], exts[:, :lk], valid[:, :lk]

"""Fused canonicalization kernel: rc + lexicographic min + Exts flip.

The hottest per-kmer op in counting (filter.rs:190-196: min_rc_flip +
Exts::rc on every kmer occurrence).  The reference runs a per-int-width
``reverse_by_twos`` mask ladder (kmer.rs:97-228); here the ladder runs on
uint32 VPU lanes for all limbs of a kmer batch in one pass over VMEM, and
the compare/select/exts-flip are fused in so the batch is read from HBM
exactly once.

Layout: each limb plane is a (M, 128) uint32 array (rows of 128 kmers);
W planes per batch, most-significant limb first.  The wrapper pads/reshapes
from the engine's (..., W) layout.
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
BLOCK_ROWS = 512


def pallas_enabled() -> bool:
    """Real TPU kernels only on TPU backends; elsewhere use interpret mode."""
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _rev2(x):
    """Reverse the 16 2-bit groups of each uint32 lane (kmer.rs:169-183)."""
    c = lambda v: np.uint32(v)
    x = ((x & c(0x33333333)) << c(2)) | ((x >> c(2)) & c(0x33333333))
    x = ((x & c(0x0F0F0F0F)) << c(4)) | ((x >> c(4)) & c(0x0F0F0F0F))
    x = ((x & c(0x00FF00FF)) << c(8)) | ((x >> c(8)) & c(0x00FF00FF))
    x = ((x & c(0x0000FFFF)) << c(16)) | ((x >> c(16)) & c(0x0000FFFF))
    return x


def _exts_rc(e):
    """Exts byte rc: swap nibbles + reverse bits in each nibble (lib.rs:746)."""
    e = ((e & 0x0F) << 4) | ((e >> 4) & 0x0F)
    e = ((e & 0x55) << 1) | ((e >> 1) & 0x55)
    return ((e & 0x33) << 2) | ((e >> 2) & 0x33)


def _canon_kernel(spec: KmerSpec, *refs):
    """refs: W in-limbs, exts_in, W out-limbs, exts_out, flip_out."""
    w = spec.w
    in_limbs = [refs[i][:] for i in range(w)]
    exts = refs[w][:]
    out_limbs = refs[w + 1 : 2 * w + 1]
    exts_out = refs[2 * w + 1]
    flip_out = refs[2 * w + 2]

    # complement within the value bits
    masks = [np.uint32(spec.limb_mask(i)) for i in range(w)]
    comp = [in_limbs[i] ^ masks[i] for i in range(w)]
    # reverse 2-bit groups across the register: per-limb reverse + limb swap
    rev = [_rev2(comp[w - 1 - i]) for i in range(w)]
    # realign: value sits in top 2K bits; shift right by pad
    if spec.pad:
        p, q = np.uint32(spec.pad), np.uint32(32 - spec.pad)
        rc = [
            (rev[i] >> p) | ((rev[i - 1] << q) if i > 0 else np.uint32(0))
            for i in range(w)
        ]
        rc = [rc[i] & masks[i] for i in range(w)]
    else:
        rc = rev

    # lexicographic a < rc over limb vectors
    lt = jnp.zeros_like(in_limbs[0], dtype=jnp.bool_)
    eq = jnp.ones_like(lt)
    for i in range(w):
        lt = lt | (eq & (in_limbs[i] < rc[i]))
        eq = eq & (in_limbs[i] == rc[i])
    flip = ~lt  # lib.rs:224-231: flipped when not (kmer < rc)

    for i in range(w):
        out_limbs[i][:] = jnp.where(flip, rc[i], in_limbs[i])
    exts_out[:] = jnp.where(flip, _exts_rc(exts), exts)
    flip_out[:] = flip.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _canon_call(spec: KmerSpec, interpret: bool, limbs_2d, exts_2d):
    """limbs_2d: (W, M, 128) uint32; exts_2d: (M, 128) int32."""
    w = spec.w
    m = limbs_2d.shape[1]
    bm = min(BLOCK_ROWS, m)
    grid = (pl.cdiv(m, bm),)
    plane = pl.BlockSpec((bm, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = (
        [jax.ShapeDtypeStruct((m, LANES), jnp.uint32) for _ in range(w)]
        + [
            jax.ShapeDtypeStruct((m, LANES), jnp.int32),
            jax.ShapeDtypeStruct((m, LANES), jnp.int32),
        ]
    )
    outs = pl.pallas_call(
        functools.partial(_canon_kernel, spec),
        grid=grid,
        in_specs=[plane] * (w + 1),
        out_specs=[plane] * (w + 2),
        out_shape=out_shape,
        interpret=interpret,
    )(*[limbs_2d[i] for i in range(w)], exts_2d)
    out_limbs = jnp.stack(outs[:w], axis=0)
    return out_limbs, outs[w], outs[w + 1]


def canonicalize_fused(spec: KmerSpec, kmers, exts) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(..., W) kmers + (...) exts -> (canonical kmers, exts', flipped).

    Drop-in for filter.canonicalize's unstranded body (min_rc_flip +
    Exts::rc, lib.rs:224-231 + lib.rs:746), as one fused VMEM pass.
    """
    w = spec.w
    batch_shape = kmers.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    m = pl.cdiv(n, LANES)
    pad = m * LANES - n

    flat_limbs = jnp.moveaxis(kmers.reshape(n, w), -1, 0)  # (W, N)
    flat_exts = exts.reshape(n).astype(jnp.int32)
    if pad:
        flat_limbs = jnp.pad(flat_limbs, ((0, 0), (0, pad)))
        flat_exts = jnp.pad(flat_exts, (0, pad))
    limbs_2d = flat_limbs.reshape(w, m, LANES)
    exts_2d = flat_exts.reshape(m, LANES)

    out_limbs, out_exts, out_flip = _canon_call(
        spec, not pallas_enabled(), limbs_2d, exts_2d
    )
    ck = jnp.moveaxis(out_limbs.reshape(w, m * LANES)[:, :n], 0, -1).reshape(
        *batch_shape, w
    )
    ce = out_exts.reshape(m * LANES)[:n].reshape(batch_shape)
    fl = out_flip.reshape(m * LANES)[:n].reshape(batch_shape).astype(bool)
    return ck, ce, fl



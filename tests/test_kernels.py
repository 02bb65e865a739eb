"""Pallas kernel parity: fused canonicalize == elementwise ladder, for
every limb width (K spanning 1..4 uint32 limbs), interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_debruijn import exts as E
from tpu_debruijn import kmer as KM
from tpu_debruijn.kernels import canonicalize_fused
from tpu_debruijn.kmer import KmerSpec


@pytest.mark.parametrize("k", [4, 15, 16, 31, 32, 47, 48, 63, 64])
def test_canonicalize_fused_parity(rng, k):
    spec = KmerSpec(k)
    n = 1000
    bases = rng.integers(0, 4, (n, k))
    kmers = jnp.asarray(KM.from_bases_batch_np(spec, bases))
    exts = jnp.asarray(rng.integers(0, 256, n), jnp.int32)

    ck, ce, fl = canonicalize_fused(spec, kmers, exts)

    want_k, want_f = KM.min_rc_flip(spec, kmers)
    want_e = jnp.where(want_f, E.rc(exts), exts)
    assert np.array_equal(np.asarray(ck), np.asarray(want_k))
    assert np.array_equal(np.asarray(ce), np.asarray(want_e))
    assert np.array_equal(np.asarray(fl), np.asarray(want_f))


def test_canonicalize_fused_batch_shapes(rng):
    spec = KmerSpec(31)
    bases = rng.integers(0, 4, (6, 7, 31))
    kmers = jnp.asarray(
        KM.from_bases_batch_np(spec, bases.reshape(-1, 31)).reshape(6, 7, spec.w)
    )
    exts = jnp.asarray(rng.integers(0, 256, (6, 7)), jnp.int32)
    ck, ce, fl = canonicalize_fused(spec, kmers, exts)
    assert ck.shape == (6, 7, spec.w)
    assert ce.shape == (6, 7)
    want_k, want_f = KM.min_rc_flip(spec, kmers)
    assert np.array_equal(np.asarray(ck), np.asarray(want_k))


def test_extract_canonical_fused_parity(rng):
    """Fused pack+extract+canonicalize kernel (SURVEY §7 step 7) ==
    filter.extract_kmers + filter.canonicalize, both modes, several K."""
    import jax.numpy as jnp

    from tpu_debruijn import filter as F
    from tpu_debruijn.kernels.extract_canonical import extract_canonical_fused
    from tpu_debruijn.kmer import KmerSpec

    for k in (16, 31, 47, 63):
        spec = KmerSpec(k)
        r, l = 9, 96
        bases = rng.integers(0, 4, (r, l)).astype(np.uint8)
        lengths = rng.integers(k, l + 1, r).astype(np.int32)
        seq_exts = rng.integers(0, 256, r).astype(np.int32)

        want_k, want_e, want_v = F.extract_kmers(
            spec, jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(seq_exts)
        )
        for stranded in (False, True):
            ck, ce, _ = F.canonicalize(
                spec, want_k, want_e, stranded
            )
            gk, ge, gv = extract_canonical_fused(
                spec, bases, lengths, seq_exts, stranded=stranded
            )
            wv = np.asarray(want_v)
            assert np.array_equal(np.asarray(gv), wv)
            # compare only valid slots (padding windows differ)
            assert np.array_equal(np.asarray(gk)[wv], np.asarray(ck)[wv]), (k, stranded)
            assert np.array_equal(np.asarray(ge)[wv], np.asarray(ce)[wv]), (k, stranded)


def test_count_kmers_fused_frontend_same_table(rng):
    """count_kmers(fused_frontend=True) must produce the identical table."""
    import jax
    import jax.numpy as jnp

    from tpu_debruijn import filter as F
    from tpu_debruijn.kmer import KmerSpec

    spec = KmerSpec(31)
    r, l = 32, 96
    bases = rng.integers(0, 4, (r, l)).astype(np.uint8)
    lengths = np.full(r, l, np.int32)
    seq_exts = np.zeros(r, np.int32)
    labels = np.arange(r, dtype=np.int32)

    outs = {}
    for fused in (False, True):
        t = jax.jit(
            lambda b, le, se, la, fused=fused: F.count_kmers(
                spec, b, le, se, la, stranded=False, min_obs=2,
                fused_frontend=fused,
            )
        )(jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(seq_exts),
          jnp.asarray(labels))
        n = int(t.n_valid)
        outs[fused] = (
            np.asarray(t.kmers)[:n], np.asarray(t.exts)[:n],
            np.asarray(t.counts)[:n], np.asarray(t.data)[:n],
        )
    for a, b in zip(outs[False], outs[True]):
        assert np.array_equal(a, b)

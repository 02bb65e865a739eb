"""Exhaustive tests of the Exts bitmask algebra (lib.rs:569-749)."""

import numpy as np
import jax.numpy as jnp

from tpu_debruijn import exts as E
from tpu_debruijn.exts import Exts, Dir
from tpu_debruijn.oracle import ref as O


def test_exts_algebra_exhaustive():
    vals = jnp.arange(256, dtype=jnp.int32)
    comp = np.asarray(E.complement_bits(vals))
    rev = np.asarray(E.reverse(vals))
    rcv = np.asarray(E.rc(vals))
    nl = np.asarray(E.num_ext_dir(vals, E.LEFT))
    nr = np.asarray(E.num_ext_dir(vals, E.RIGHT))
    for v in range(256):
        assert comp[v] == O.e_complement(v)
        assert rev[v] == O.e_reverse(v)
        assert rcv[v] == O.e_rc(v)
        assert nl[v] == O.e_num(v, 0)
        assert nr[v] == O.e_num(v, 1)
        # rc is an involution
        assert O.e_rc(O.e_rc(v)) == v


def test_unique_extension_exhaustive():
    vals = jnp.arange(256, dtype=jnp.int32)
    for d in (E.LEFT, E.RIGHT):
        uq, base = E.unique_extension(vals, d)
        uq, base = np.asarray(uq), np.asarray(base)
        for v in range(256):
            want = O.e_unique(v, d)
            assert bool(uq[v]) == (want is not None)
            if want is not None:
                assert base[v] == want


def test_scalar_exts_surface():
    e = Exts.mk(1, 3)  # left C, right T
    assert e.get(Dir.Left) == [1] and e.get(Dir.Right) == [3]
    assert e.has_ext(Dir.Left, 1) and not e.has_ext(Dir.Left, 2)
    assert e.num_exts_l() == 1 and e.num_exts_r() == 1
    assert e.get_unique_extension(Dir.Right) == 3
    e2 = e.set(Dir.Right, 0)
    assert e2.num_exts_r() == 2 and e2.get_unique_extension(Dir.Right) is None
    assert e.rc().get(Dir.Left) == [0]  # T on the right -> A on the left
    assert e.rc().get(Dir.Right) == [2]  # C on the left -> G on the right
    assert Exts.merge(Exts.mk_left(2), Exts.mk_right(1)).val == O.e_merge(
        O.e_mk_left(2), O.e_mk_right(1)
    )


def test_from_slice_bounds():
    src = [0, 1, 2, 3, 0, 1]
    for start in range(6):
        for length in range(1, 6 - start + 1):
            assert (
                Exts.from_slice_bounds(src, start, length).val
                == O.e_from_slice_bounds(src, start, length)
            )


def test_dir():
    assert Dir.flip(Dir.Left) == Dir.Right
    assert Dir.cond_flip(Dir.Left, True) == Dir.Right
    assert Dir.cond_flip(Dir.Left, False) == Dir.Left
    assert Dir.pick(Dir.Left, "l", "r") == "l"
    assert Dir.pick(Dir.Right, "l", "r") == "r"

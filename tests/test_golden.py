"""Golden snapshot tests: engine outputs must be byte-identical to the
checked-in files under tests/golden/.

Unlike the oracle-parity suites (engine vs tpu_debruijn.oracle — both
living in this repo), these snapshots pin ABSOLUTE outputs on fixed
corpora, so a co-edit of engine + oracle cannot silently change behavior.
Inputs include the reference's literal regression fixtures:

* msp.rs:546-576 "test_sample" v1/v2 error-case sequences (k=35, p=5,
  identity permutation, rc scoring),
* test.rs:170-193 "degen_seq_asm" near-palindromic K31 repeat contig.

Regenerate intentionally with ``python scripts/make_golden.py``.
"""

import os

import numpy as np
import pytest

from tpu_debruijn import compress as C
from tpu_debruijn import filter as F
from tpu_debruijn import msp as M
from tpu_debruijn.bases import ascii_to_bases
from tpu_debruijn.oracle import ref as O

from ref_fixtures import DEGEN_K31, MSP_V1, MSP_V2

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _table_arrays(prefix, table):
    return {
        f"{prefix}kmers": np.asarray(table.kmers, np.uint32),
        f"{prefix}exts": np.asarray(table.exts, np.int32),
        f"{prefix}counts": np.asarray(table.counts, np.int32),
    }


def _unitig_arrays(prefix, nodes):
    lens = np.array([len(s) for s, _, _ in nodes], np.int64)
    flat = (
        np.concatenate([np.asarray(s, np.uint8) for s, _, _ in nodes])
        if nodes
        else np.zeros(0, np.uint8)
    )
    return {
        f"{prefix}seq_flat": flat,
        f"{prefix}seq_lens": lens,
        f"{prefix}u_exts": np.array([e for _, e, _ in nodes], np.int32),
        f"{prefix}u_data": np.array([d for _, _, d in nodes], np.int32),
    }


def _intervals_arrays(prefix, intervals):
    return {
        f"{prefix}bucket": np.array([b for b, _, _ in intervals], np.int64),
        f"{prefix}exts": np.array([e for _, e, _ in intervals], np.int32),
        f"{prefix}sub_lens": np.array([len(s) for _, _, s in intervals], np.int64),
        f"{prefix}sub_flat": (
            np.concatenate([np.asarray(s, np.uint8) for _, _, s in intervals])
            if intervals
            else np.zeros(0, np.uint8)
        ),
    }


def _filter_compress(reads, k, stranded, min_obs, censor=False):
    table = F.filter_kmers(
        reads, k, stranded=stranded, min_obs=min_obs, report_all=censor
    )
    if censor:
        F.remove_censored_exts_sharded(table)
    nodes = C.compress_kmers(table)
    out = _table_arrays("t_", table)
    out.update(_unitig_arrays("u_", nodes))
    return out


def compute(name):
    """Engine outputs for one golden case, as a dict of arrays."""
    if name == "degen_k31":
        seq = ascii_to_bases(DEGEN_K31)
        return _filter_compress([(seq, 0, 0), (seq, 0, 0)], 31, False, 1)

    if name == "msp_v1v2_k35_p5":
        out = {}
        perm = np.arange(4**5, dtype=np.int32)
        for nm, v in (("v1_", MSP_V1), ("v2_", MSP_V2)):
            iv = M.msp_sequence(np.asarray(v, np.uint8), 35, 5, perm, rc=True)
            out.update(_intervals_arrays(nm, iv))
        return out

    if name == "msp_rand_k31_p8_perm":
        rng = np.random.default_rng(505)
        seq = rng.integers(0, 4, 400).astype(np.uint8)
        perm = rng.permutation(4**8).astype(np.int32)
        return _intervals_arrays("", M.msp_sequence(seq, 31, 8, perm, rc=True))

    if name == "simple_k16_stranded":
        rng = np.random.default_rng(4242)
        contigs = O.simple_random_contigs(rng)
        reads = [(np.asarray(c, np.uint8), 0, i) for i, c in enumerate(contigs)]
        return _filter_compress(reads, 16, True, 1)

    if name == "simple_k16_unstranded":
        rng = np.random.default_rng(4242)
        contigs = O.simple_random_contigs(rng)
        reads = [(np.asarray(c, np.uint8), 0, i) for i, c in enumerate(contigs)]
        return _filter_compress(reads, 16, False, 1)

    if name == "random_k31_censored":
        rng = np.random.default_rng(77)
        contigs = O.random_contigs(rng)
        reads = []
        for i, c in enumerate(contigs):
            reads.append((np.asarray(c, np.uint8), 0, i))
            reads.append((np.asarray(c, np.uint8), 0, i))
            e = list(c)
            O.edit_dna(rng, e, 0.01)
            reads.append((np.asarray(e, np.uint8), 0, i))
        return _filter_compress(reads, 31, False, 2, censor=True)

    raise KeyError(name)


CASES = [
    "degen_k31",
    "msp_v1v2_k35_p5",
    "msp_rand_k31_p8_perm",
    "simple_k16_stranded",
    "simple_k16_unstranded",
    "random_k31_censored",
]


@pytest.mark.parametrize("name", CASES)
def test_golden(name):
    path = os.path.join(GOLDEN, f"{name}.npz")
    assert os.path.exists(path), (
        f"missing golden file {path}; run scripts/make_golden.py and commit"
    )
    want = np.load(path)
    got = compute(name)
    assert set(got) == set(want.files)
    for key in want.files:
        assert got[key].dtype == want[key].dtype, f"{name}/{key} dtype drift"
        assert np.array_equal(got[key], want[key]), (
            f"{name}/{key} drifted from golden snapshot "
            f"(intentional? regenerate via scripts/make_golden.py)"
        )

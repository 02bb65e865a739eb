"""Regenerate the golden snapshot files under tests/golden/.

Run ONLY when an intentional engine-behavior change invalidates the
snapshots (then review the diff!):

    python scripts/make_golden.py

The snapshots freeze filter+compress+MSP outputs on fixed corpora —
including the reference's literal regression fixtures (msp.rs:546-576
v1/v2 sequences, test.rs:170-193 degenerate K31 repeat) — so engine
regressions are caught independently of the Python oracle
(tests/test_golden.py asserts byte-identity).
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

GOLDEN = os.path.join(_REPO, "tests", "golden")


def main():
    from test_golden import CASES, compute

    os.makedirs(GOLDEN, exist_ok=True)
    for name in CASES:
        arrays = compute(name)
        path = os.path.join(GOLDEN, f"{name}.npz")
        np.savez_compressed(path, **arrays)
        sizes = {k: v.shape for k, v in arrays.items()}
        print(f"wrote {path}: {sizes}")


if __name__ == "__main__":
    main()

"""Hamming-distance-1 neighbor enumeration (error-correction primitive).

Reference: /root/reference/src/neighbors.rs (KmerOneHammingIter).  Host
generator mirrors the reference iterator order (position-major, base
ascending, skipping the original base); the batched device version is
``kmer.hamming_neighbors`` (all 3K variants of a whole kmer array at
once).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from tpu_debruijn import kmer as KM
from tpu_debruijn.kmer import KmerSpec


def one_hamming_iter(spec: KmerSpec, limbs: np.ndarray) -> Iterator[np.ndarray]:
    """Yield the 3K HD-1 neighbors of one kmer (neighbors.rs:4-52 order)."""
    bases = KM.to_bases(spec, limbs)
    for pos in range(spec.k):
        orig = int(bases[pos])
        for b in range(4):
            if b == orig:
                continue
            mutated = bases.copy()
            mutated[pos] = b
            yield KM.from_bases(spec, mutated)

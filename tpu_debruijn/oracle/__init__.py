"""Plain-Python oracle: a direct reimplementation of the reference
algorithms (rust-debruijn) used ONLY as ground truth in tests.

This is deliberately scalar/sequential Python — never the engine.  The
engine (filter.py / compress.py / msp.py) must reproduce these results
exactly (with node order/orientation canonicalized where the reference's
MPHF slot order is not reproducible; see compress.py docstring).
"""

from tpu_debruijn.oracle.ref import (
    CountFilter,
    CountFilterSet,
    OKmer,
    SimpleCompress,
    ScmapCompress,
    compress_kmers,
    filter_kmers,
    iter_kmer_exts,
    msp_scan,
    msp_sequence,
)

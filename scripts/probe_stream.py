"""Phase-timing probe for the device-merge streaming loop.

Streams a mid-size synthetic corpus through filter_kmers_streaming
(merge='device') with INFO logging on, so the loop's phase accumulators
(upload / dispatch / confirm wall time) print at the end — localizing
per-chunk overhead on the live TPU tunnel.

Run: python scripts/probe_stream.py [--reads 262144] [--cpu]
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=262144)
    ap.add_argument("--genome", type=int, default=1_000_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(repo, ".jax_cache_cpu" if args.cpu else ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_debruijn import filter as F

    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, args.genome).astype(np.uint8)
    L, k, block = 160, 31, 8192

    def stream(n):
        done = 0
        r = np.random.default_rng(0)
        while done < n:
            m = min(block, n - done)
            starts = r.integers(0, len(genome) - L, m)
            blk = genome[starts[:, None] + np.arange(L)[None, :]]
            flip = r.random(m) < 0.5
            blk[flip] = (3 - blk[flip, ::-1]).astype(np.uint8)
            yield (blk, 0, 0)
            done += m

    common = dict(
        stranded=False, min_obs=2, read_len_cap=L, memory_gb=2.0,
        data_reduce="none", merge="device", init_capacity=1 << 21,
        unique_capacity=1 << 20,
    )
    # warm
    t0 = time.time()
    F.filter_kmers_streaming(stream(2 * block), k, **common)
    print(f"warm {time.time()-t0:.1f}s")
    t0 = time.time()
    t = F.filter_kmers_streaming(stream(args.reads), k, **common)
    dt = time.time() - t0
    nk = args.reads * (L - k + 1)
    print(f"{args.reads} reads / {nk} kmers in {dt:.2f}s "
          f"({nk/dt/1e6:.1f}M kmers/s), {len(t)} uniques")


if __name__ == "__main__":
    main()

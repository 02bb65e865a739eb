"""Fused-Pallas-frontend A/B on the real chip (VERDICT r2 item 3).

Times count_kmers with the XLA extract+canonicalize ladder vs the fused
Pallas VMEM kernel (kernels/extract_canonical.py) at the bench shape,
checks the two paths produce the IDENTICAL table on silicon, and writes
artifacts/fused_ab.json.

Run: python scripts/fused_ab.py [--reads 8192] [--iters 30]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import make_reads, measure_sync_latency, timed_enqueue


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=8192)
    ap.add_argument("--read-len", type=int, default=160)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--k", type=int, default=31)
    args = ap.parse_args()

    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_debruijn import filter as F
    from tpu_debruijn.kmer import KmerSpec

    spec = KmerSpec(args.k)
    bases = make_reads(args.reads, args.read_len, 100_000)
    lengths = np.full(args.reads, args.read_len, np.int32)
    zeros = np.zeros(args.reads, np.int32)
    dargs = tuple(map(jnp.asarray, (bases, lengths, zeros, zeros)))

    sync = measure_sync_latency(jnp, np)

    def make(fused):
        @jax.jit
        def count(b, l, e, lab):
            return F.count_kmers(
                spec, b, l, e, lab, stranded=False, min_obs=1,
                data_reduce="none", report_all=False, fused_frontend=fused,
            )
        return count

    c_xla, c_fused = make(False), make(True)
    force = lambda o: np.asarray(o.n_valid)
    t_xla = timed_enqueue(c_xla, dargs, args.iters, sync, force)
    t_fused = timed_enqueue(c_fused, dargs, args.iters, sync, force)

    ta, tb = c_xla(*dargs), c_fused(*dargs)
    na, nb = int(ta.n_valid), int(tb.n_valid)
    equal = (
        na == nb
        and np.array_equal(np.asarray(ta.kmers[:na]), np.asarray(tb.kmers[:nb]))
        and np.array_equal(np.asarray(ta.exts[:na]), np.asarray(tb.exts[:nb]))
        and np.array_equal(np.asarray(ta.counts[:na]), np.asarray(tb.counts[:nb]))
    )

    n_kmers = args.reads * (args.read_len - args.k + 1)
    result = {
        "device": str(jax.devices()[0]),
        "k": args.k,
        "n_reads": args.reads,
        "iters": args.iters,
        "count_ms_xla": round(t_xla * 1e3, 3),
        "count_ms_fused": round(t_fused * 1e3, 3),
        "kmers_per_s_xla": round(n_kmers / t_xla, 1),
        "kmers_per_s_fused": round(n_kmers / t_fused, 1),
        "fused_speedup": round(t_xla / t_fused, 3),
        "tables_identical_on_silicon": bool(equal),
        "n_valid": na,
    }
    with open(os.path.join(repo, "artifacts", "fused_ab.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

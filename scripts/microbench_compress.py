"""Component-level timing of the compression stage on the real chip.

Round-4 attack plan needs measured numbers for each candidate bottleneck
(VERDICT r3 next-step 1: compress is 37ms/1M kmers, target <= 8ms):

  * resolve_edges total, and inside it:
      - the 3n-row sort-join (sort_join_limbs)
      - the searchsorted alternative (2n queries, log2(n) gathers each)
      - candidate construction (extends + min_rc_flip + palindromes)
  * link_chains total, and inside it:
      - _rank_all doubling loop at m = 2n
      - the emission sort + scatters
  * raw primitives at the same shapes: lax.sort 3n x 3 arrays, one
    (m, 4) row gather, one 2n row gather

Run: python scripts/microbench_compress.py [--n 1048576] [--k 31]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import measure_sync_latency, timed_enqueue
    from tpu_debruijn import compress as C
    from tpu_debruijn import filter as F
    from tpu_debruijn import kmer as KM
    from tpu_debruijn import sorting as S
    from tpu_debruijn.kmer import KmerSpec

    sync = measure_sync_latency(jnp, np)
    res = {"device": str(jax.devices()[0]), "sync_latency_s": round(sync, 4),
           "n": args.n, "k": args.k}
    print(f"sync {sync*1e3:.1f}ms", file=sys.stderr, flush=True)

    def t(fn, *a, force=None):
        if force is None:
            force = lambda o: np.asarray(jax.tree.leaves(o)[0].ravel()[:1])
        return timed_enqueue(fn, a, args.iters, sync, force)

    spec = KmerSpec(args.k)
    w = spec.w
    rng = np.random.default_rng(0)

    # build the table at the PADDED device shapes (r * lk rows, same as
    # profile_stages.py — trimmed odd-size tables hit pathological
    # compile times through the remote-compile helper)
    L, r = 160, 8192
    lk = L - args.k + 1
    n = r * lk
    glen = 1_200_000
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    step = L - args.k  # consecutive reads overlap by k-1: full coverage
    cover = np.arange(0, glen - L, step)
    if len(cover) >= r:
        starts = cover[:r]
    else:
        starts = np.concatenate(
            [cover, rng.integers(0, glen - L, r - len(cover))]
        )
    bases = genome[starts[:, None] + np.arange(L)[None, :]]
    dev = F._count_kmers_jit(
        spec, False, 1, "none", False,
        jnp.asarray(bases), jnp.full(r, L, jnp.int32),
        jnp.zeros(r, jnp.int32), jnp.zeros(r, jnp.int32),
    )
    kmers = dev.kmers
    exts = dev.exts
    nv = dev.n_valid
    res["n_rows"] = n
    res["n_valid"] = int(nv)
    print(f"table: {n} rows, {int(nv)} valid", file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", "microbench_compress.json")

    def flush_res():
        with open(path, "w") as f:
            json.dump(res, f, indent=1)
            f.write("\n")

    # --- resolve_edges total
    f_re = jax.jit(lambda km, ex, v: C.resolve_edges(spec, False, km, ex, v))
    res["resolve_edges_ms"] = round(t(f_re, kmers, exts, nv) * 1e3, 2)
    print("resolve_edges", res["resolve_edges_ms"], file=sys.stderr, flush=True)
    flush_res()

    # --- candidate construction only (extends + canon + palindromes)
    def cand_only(km, ex):
        outs = []
        for d in (0, 1):
            uniq, base = F.E.unique_extension(ex, d)
            cand = (
                KM.extend_left(spec, km, base.astype(jnp.uint32))
                if d == 0
                else KM.extend_right(spec, km, base.astype(jnp.uint32))
            )
            cand, flip = KM.min_rc_flip(spec, cand)
            pal = KM.is_palindrome(spec, cand)
            outs.append((cand, uniq, flip, pal))
        return outs

    res["candidates_ms"] = round(t(jax.jit(cand_only), kmers, exts) * 1e3, 2)
    print("candidates", res["candidates_ms"], file=sys.stderr, flush=True)
    flush_res()

    # --- the join alone: 2n queries against the table
    qrs = jnp.concatenate([kmers, kmers], axis=0)  # shape stand-in

    f_join = jax.jit(
        lambda tk, q, v, ex: S.sort_join_limbs(tk, v, q, ex)
    )
    res["sort_join_2n_ms"] = round(t(f_join, kmers, qrs, nv, exts) * 1e3, 2)
    print("sort_join", res["sort_join_2n_ms"], file=sys.stderr, flush=True)
    flush_res()

    f_ss = jax.jit(lambda tk, q, v: S.searchsorted_limbs(tk, q, v))
    res["searchsorted_2n_ms"] = round(t(f_ss, kmers, qrs, nv) * 1e3, 2)
    print("searchsorted", res["searchsorted_2n_ms"], file=sys.stderr, flush=True)
    flush_res()

    # --- full compress + link_chains
    f_cc = jax.jit(
        lambda km, ex, v: C.compress_kmer_table_device(spec, False, km, ex, v)
    )
    res["compress_total_ms"] = round(t(f_cc, kmers, exts, nv) * 1e3, 2)
    print("compress_total", res["compress_total_ms"], file=sys.stderr, flush=True)
    flush_res()

    edges = f_re(kmers, exts, nv)
    valid = jnp.arange(kmers.shape[0], dtype=jnp.int32) < nv
    f_lc = jax.jit(
        lambda pl, pr, il, ir, v: C.link_chains(pl, pr, il, ir, v)
    )
    res["link_chains_ms"] = round(
        t(f_lc, edges["partner_l"], edges["partner_r"], edges["in_l"],
          edges["in_r"], valid) * 1e3, 2,
    )
    print("link_chains", res["link_chains_ms"], file=sys.stderr, flush=True)
    flush_res()

    # --- _rank_all alone at m = 2n
    m = 2 * kmers.shape[0]
    succ0 = C._succ_states(
        edges["partner_l"], edges["partner_r"], edges["in_l"], edges["in_r"], valid
    )
    node = jnp.repeat(jnp.arange(kmers.shape[0], dtype=jnp.int32), 2)
    orient = jnp.tile(jnp.arange(2, dtype=jnp.int32), kmers.shape[0])
    mnmo0 = (node << 1) | orient
    f_rank = jax.jit(lambda s, mn: C._rank_all(s, mn))
    res["rank_all_ms"] = round(t(f_rank, succ0, mnmo0) * 1e3, 2)
    print("rank_all", res["rank_all_ms"], file=sys.stderr, flush=True)
    flush_res()

    # --- primitives
    a0 = jnp.asarray(rng.integers(0, 2**31, 3 * n, np.int64).astype(np.int32))
    a1 = jnp.asarray(rng.integers(0, 2**31, 3 * n, np.int64).astype(np.int32))
    a2 = jnp.asarray(rng.integers(0, 2**31, 3 * n, np.int64).astype(np.int32))
    f_sort3 = jax.jit(lambda x, y, z: jax.lax.sort([x, y, z], num_keys=2))
    res["sort_3n_x3_ms"] = round(t(f_sort3, a0, a1, a2) * 1e3, 2)
    print("sort3n", res["sort_3n_x3_ms"], file=sys.stderr, flush=True)
    flush_res()

    idx = jnp.asarray(rng.integers(0, m, m, np.int64).astype(np.int32))
    x4 = jnp.asarray(rng.integers(0, 2**31, (m, 4), np.int64).astype(np.int32))
    f_g4 = jax.jit(lambda x, i: x[i])
    res["gather_m_x4_ms"] = round(t(f_g4, x4, idx) * 1e3, 2)
    print("gather(m,4)", res["gather_m_x4_ms"], file=sys.stderr, flush=True)
    flush_res()

    idx2 = jnp.asarray(rng.integers(0, n, 2 * n, np.int64).astype(np.int32))
    x2 = jnp.asarray(rng.integers(0, 2**31, (n, 2), np.int64).astype(np.int32))
    f_g2 = jax.jit(lambda x, i: x[i])
    res["gather_2n_rows_ms"] = round(t(f_g2, x2, idx2) * 1e3, 2)
    print("gather2n", res["gather_2n_rows_ms"], file=sys.stderr, flush=True)
    flush_res()

    # rank_all round count estimate
    import math
    res["rank_rounds"] = max(1, math.ceil(math.log2(m + 1)))

    print(json.dumps(res, indent=1))
    flush_res()


if __name__ == "__main__":
    main()

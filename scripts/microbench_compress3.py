"""Round-5 compress microbench: plain vs read-adjacency-ordered linking
at the TRUE 1M-valid regime (VERDICT r4 next-step 2).

Builds a ~1M-unique-kmer table from a 10x-coverage read corpus with
first-occurrence positions (data_reduce='obs_min'), then times on the
real TPU:

  * _compress_jit          (r4 path: full 2n-state pointer doubling)
  * _compress_ordered_jit  (r5 path: interval contraction + small ranking)

Writes artifacts/microbench_compress3.json.

The input table is built in a CPU-backend SUBPROCESS (--make-table): the
one-shot 8.5M-obs count program exceeds the remote TPU compile helper's
size ceiling (ROUND4_NOTES: >~3.5M-row sorts hang/SIGKILL it), so only
the compress programs (2^20-cap, the r4-proven size) compile on the chip.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_TABLE_NPZ = "/tmp/microbench_compress3_table.npz"


def make_table():
    """CPU backend: build the ~1M-valid table with obs_min data."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    # private cache dir: never share a cache with a concurrently-running
    # pytest process (a truncated write corrupts entries for everyone)
    jax.config.update("jax_compilation_cache_dir", "/tmp/mbc3_cpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import make_reads
    from tpu_debruijn import filter as F
    from tpu_debruijn.kmer import KmerSpec

    spec = KmerSpec(31)
    # 1_030_000: distinct genome kmers stay under the 2^20 table cap
    # (1_050_000 produced n_valid=1_049_705 > 2^20)
    n_reads, L, genome = 65536, 160, 1_030_000
    bases = make_reads(n_reads, L, genome, seed=7)
    lengths = np.full(n_reads, L, np.int32)
    zeros = np.zeros(n_reads, np.int32)
    dev = F._count_kmers_jit(
        spec, False, 1, "obs_min", False,
        jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(zeros),
        jnp.asarray(zeros),
    )
    nv = int(np.asarray(dev.n_valid))
    cap = 1 << 20
    assert nv <= cap, nv
    np.savez(
        _TABLE_NPZ,
        kmers=np.asarray(dev.kmers[:cap]),
        exts=np.asarray(dev.exts[:cap]),
        fpos=np.asarray(dev.data[:cap]),
        n_valid=nv,
    )
    print(f"table ready: n_valid={nv}", file=sys.stderr)


def main():
    if not os.path.exists(_TABLE_NPZ):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--make-table"],
            check=True,
        )
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import measure_sync_latency, timed_enqueue
    from tpu_debruijn import compress as C
    from tpu_debruijn.kmer import KmerSpec

    sync = measure_sync_latency(jnp, np)
    res = {"device": str(jax.devices()[0]), "sync_latency_s": round(sync, 4)}
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "microbench_compress3.json",
    )

    def rec(name, v):
        res[name] = v
        print(name, v, file=sys.stderr, flush=True)
        with open(path, "w") as f:
            json.dump(res, f, indent=1)
            f.write("\n")

    k = 31
    spec = KmerSpec(k)
    tbl = np.load(_TABLE_NPZ)
    nv = int(tbl["n_valid"])
    rec("n_valid", nv)
    cap = 1 << 20
    kmers = jnp.asarray(tbl["kmers"])
    exts = jnp.asarray(tbl["exts"])
    fpos = jnp.asarray(tbl["fpos"])
    nvj = jnp.int32(nv)

    def t(fn, *a, iters=4):
        return timed_enqueue(
            fn, a, iters, sync,
            lambda o: np.asarray(jax.tree.leaves(o)[0].ravel()[:1]),
        )

    plain = lambda km, ex, v: C._compress_jit(spec, False, False, km, ex, v,
                                              jnp.zeros(cap, jnp.int32))
    ch, _, _ = plain(kmers, exts, nvj)
    rec("n_unitigs_plain", int(np.asarray(ch.n_unitigs)))
    rec("compress_plain_ms", round(t(plain, kmers, exts, nvj) * 1e3, 1))

    ocap = 1 << 17
    ordered = lambda km, ex, v, fp: C._compress_ordered_jit(
        spec, False, ocap, km, ex, v, fp
    )
    cho, _, _, ovf = ordered(kmers, exts, nvj, fpos)
    rec("ordered_overflow", bool(np.asarray(ovf)))
    rec("n_unitigs_ordered", int(np.asarray(cho.n_unitigs)))
    assert int(np.asarray(cho.n_unitigs)) == int(np.asarray(ch.n_unitigs))
    rec("compress_ordered_ms", round(t(ordered, kmers, exts, nvj, fpos) * 1e3, 1))

    # breakdown: resolve_edges alone (shared by both paths)
    ed = jax.jit(
        lambda km, ex, v: C.resolve_edges(spec, False, km, ex, v)
    )
    rec("resolve_edges_ms", round(t(ed, kmers, exts, nvj) * 1e3, 1))

    # how much did the corpus actually contract?
    # (count intervals on host for the record)
    r = ed(kmers, exts, nvj)
    pl = np.asarray(r["partner_l"])[:nv]
    pr = np.asarray(r["partner_r"])[:nv]
    fp = np.asarray(fpos)[:nv]
    order = np.argsort(fp, kind="stable")
    rank = np.empty(nv, np.int64)
    rank[order] = np.arange(nv)
    rlp = np.where(pl >= 0, rank[np.clip(pl, 0, nv - 1)], -1)[order]
    rrp = np.where(pr >= 0, rank[np.clip(pr, 0, nv - 1)], -1)[order]
    posr = np.arange(nv)
    join = (rlp == posr + 1) | (rrp == posr + 1)
    n_iv = nv - join[:-1].sum()
    rec("n_intervals", int(n_iv))
    rec("contraction_ratio", round(nv / max(int(n_iv), 1), 1))

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    if "--make-table" in sys.argv:
        make_table()
    else:
        main()

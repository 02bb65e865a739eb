"""Measure jax.lax.sort cost structure on the real TPU.

The counting pipeline is sort-bound (VERDICT r4 weak #1): count batch =
obs sort (W[+flag] keys + payload) + partition sort.  Before building an
alternative we need the toolchain facts:

  * cost vs n           -> is it n*log^2(n) (bitonic) or n*log(n)?
  * cost vs #arrays     -> does each extra operand add a full per-stage
                           read+write (traffic-bound) or is it amortized?
  * stable vs unstable  -> measured factor
  * batched (B, n/B) axis=-1 sorts -> the bucketed-sort upside IF
                           bucketing were free
  * 1-lane scatter / gather at 1M  -> the cost of any radix/bucket pass

Writes artifacts/probe_sort.json.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure_sync_latency():
    x = jnp.arange(256, dtype=jnp.uint32)
    f = jax.jit(lambda a: a + np.uint32(1))
    _ = np.asarray(f(x)[:1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(f(x)[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


SYNC = measure_sync_latency()


def timed(step_fn, args, iters=10):
    out = step_fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step_fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        dt = time.perf_counter() - t0 - SYNC
        best = min(best, max(dt, 1e-9) / iters)
    return best


results = {"sync_latency_s": SYNC, "device": str(jax.devices()[0])}
rng = np.random.default_rng(0)

# --- 1. flat sort: n x arrays x stability -----------------------------
flat = {}
for logn in (18, 20, 21, 22):
    n = 1 << logn
    data = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
            for _ in range(4)]
    for na in (1, 2, 3, 4):
        for stable in (False, True):
            if stable and na != 3:
                continue
            arrs = data[:na]

            @jax.jit
            def f(*a, stable=stable):
                return jax.lax.sort(list(a), num_keys=1, is_stable=stable)

            t = timed(f, arrs, iters=8 if n <= (1 << 21) else 4)
            key = f"n{logn}_a{na}" + ("_stable" if stable else "")
            flat[key] = round(t * 1e3, 3)
            print(key, flat[key], "ms", flush=True)
results["flat_sort_ms"] = flat

# --- 1b. multi-key: does num_keys matter vs payload count? ------------
n = 1 << 20
data3 = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)) for _ in range(3)]
for nk in (1, 2, 3):
    @jax.jit
    def f(*a, nk=nk):
        return jax.lax.sort(list(a), num_keys=nk, is_stable=False)
    t = timed(f, data3, iters=8)
    results[f"numkeys{nk}_a3_ms"] = round(t * 1e3, 3)
    print("numkeys", nk, round(t * 1e3, 3), flush=True)

# --- 2. batched small sorts (the bucketed upside) ---------------------
batched = {}
n = 1 << 20
for logb in (0, 4, 8, 10):
    b = 1 << logb
    m = n // b
    a0 = jnp.asarray(rng.integers(0, 2**32, (b, m), dtype=np.uint32))
    a1 = jnp.asarray(rng.integers(0, 2**32, (b, m), dtype=np.uint32))
    a2 = jnp.asarray(rng.integers(0, 2**32, (b, m), dtype=np.uint32))

    @jax.jit
    def f(x, y, z):
        return jax.lax.sort([x, y, z], dimension=1, num_keys=1, is_stable=False)

    t = timed(f, (a0, a1, a2), iters=8)
    batched[f"b{b}_m{m}_a3"] = round(t * 1e3, 3)
    print("batched", b, m, round(t * 1e3, 3), flush=True)
results["batched_sort_ms"] = batched

# --- 3. scatter / gather unit costs at 1M -----------------------------
n = 1 << 20
idx = jnp.asarray(rng.permutation(n).astype(np.int32))
val = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))

@jax.jit
def scat1(i, v):
    return jnp.zeros(n, jnp.int32).at[i].set(v, mode="drop")

@jax.jit
def scat_add1(i, v):
    return jnp.zeros(n, jnp.int32).at[i].add(v, mode="drop")

@jax.jit
def gath1(i, v):
    return v[i]

# small-range scatter-add (histogram into 4096 buckets)
bidx = jnp.asarray(rng.integers(0, 4096, n, dtype=np.int32))

@jax.jit
def hist(i):
    return jnp.zeros(4096, jnp.int32).at[i].add(1, mode="drop")

results["scatter_set_1M_ms"] = round(timed(scat1, (idx, val), 5) * 1e3, 3)
results["scatter_add_1M_ms"] = round(timed(scat_add1, (idx, val), 5) * 1e3, 3)
results["gather_1M_ms"] = round(timed(gath1, (idx, val), 5) * 1e3, 3)
results["hist4096_1M_ms"] = round(timed(hist, (bidx,), 5) * 1e3, 3)
print("scatter/gather/hist", results["scatter_set_1M_ms"],
      results["scatter_add_1M_ms"], results["gather_1M_ms"],
      results["hist4096_1M_ms"], flush=True)

# --- 4. associative scan at 1M ---------------------------------------
@jax.jit
def scan1(v):
    return jax.lax.associative_scan(jnp.add, v)

results["assoc_scan_1M_ms"] = round(timed(scan1, (val,), 8) * 1e3, 3)

# --- 5. cumsum at 1M (often cheaper than generic scan) ----------------
@jax.jit
def csum(v):
    return jnp.cumsum(v)

results["cumsum_1M_ms"] = round(timed(csum, (val,), 8) * 1e3, 3)
print("scan/cumsum", results["assoc_scan_1M_ms"], results["cumsum_1M_ms"],
      flush=True)

# --- 6. sort u16 keys: does dtype width change cost? ------------------
v16 = jnp.asarray(rng.integers(0, 2**16, n, dtype=np.uint16))
v16b = jnp.asarray(rng.integers(0, 2**16, n, dtype=np.uint16))

@jax.jit
def s16(a, b):
    return jax.lax.sort([a, b], num_keys=1, is_stable=False)

results["sort_u16_a2_1M_ms"] = round(timed(s16, (v16, v16b), 8) * 1e3, 3)
print("u16 sort", results["sort_u16_a2_1M_ms"], flush=True)

# --- 7. top-1-bit-partition-shaped sort (the partition op) ------------
key = jnp.asarray((rng.integers(0, 2, n, dtype=np.uint32) << 31)
                  | np.arange(n, dtype=np.uint32))

@jax.jit
def part3(kk, a, b):
    return jax.lax.sort([kk, a, b], num_keys=1, is_stable=False)

results["partition_shaped_a3_1M_ms"] = round(
    timed(part3, (key, data3[1], data3[2]), 8) * 1e3, 3)
print("partition-shaped", results["partition_shaped_a3_1M_ms"], flush=True)

with open("artifacts/probe_sort.json", "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results))

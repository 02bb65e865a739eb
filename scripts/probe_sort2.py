"""Chase the obs-sort discrepancy: in-pipeline 2.82ms vs isolated 1.72ms.

Variables: exact n (1064960 vs 2^20), payload dtype (int32 vs uint32),
stability, num_keys, and input provenance (fused frontend vs fresh).
Writes artifacts/probe_sort2.json.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
from bench import measure_sync_latency, timed_enqueue

SYNC = measure_sync_latency(jnp, np)
rng = np.random.default_rng(0)
res = {}

for n, tag in ((1 << 20, "pow2"), (1064960, "n1064960"), (1081344, "n33x32768"),
               (1146880, "n35x32768")):
    l0 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    l1 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    pay_u = jnp.asarray(rng.integers(0, 2**8, n, dtype=np.uint32))
    pay_i = pay_u.astype(jnp.int32)

    @jax.jit
    def s_u(a, b, c):
        return jax.lax.sort([a, b, c], num_keys=2, is_stable=False)

    t = timed_enqueue(s_u, (l0, l1, pay_u), 8, SYNC,
                      lambda o: np.asarray(o[0][:1]))
    res[f"{tag}_k2_u32pay"] = round(t * 1e3, 3)

    t = timed_enqueue(s_u, (l0, l1, pay_i), 8, SYNC,
                      lambda o: np.asarray(o[0][:1]))
    res[f"{tag}_k2_i32pay"] = round(t * 1e3, 3)
    print(tag, res[f"{tag}_k2_u32pay"], res[f"{tag}_k2_i32pay"], flush=True)

# padding a non-pow2 input up to pow2 inside the program: pad cost + sort
n0 = 1064960
npad = 1 << 21
l0 = jnp.asarray(rng.integers(0, 2**32, n0, dtype=np.uint32))
l1 = jnp.asarray(rng.integers(0, 2**32, n0, dtype=np.uint32))
pay = jnp.asarray(rng.integers(0, 2**8, n0, dtype=np.uint32))


@jax.jit
def s_pad(a, b, c):
    ext = npad - n0
    a = jnp.concatenate([a, jnp.full(ext, 0xFFFFFFFF, jnp.uint32)])
    b = jnp.concatenate([b, jnp.full(ext, 0xFFFFFFFF, jnp.uint32)])
    c = jnp.concatenate([c, jnp.zeros(ext, jnp.uint32)])
    return jax.lax.sort([a, b, c], num_keys=2, is_stable=False)


res["pad_to_2p21_k2"] = round(
    timed_enqueue(s_pad, (l0, l1, pay), 8, SYNC,
                  lambda o: np.asarray(o[0][:1])) * 1e3, 3)
print("pad_to_2p21", res["pad_to_2p21_k2"], flush=True)

with open("artifacts/probe_sort2.json", "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res))

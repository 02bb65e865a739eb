"""Microbench round 2: scatters + the sort-unpermute join A/B.

Round 1 (microbench_compress.json) left ~115ms of link_chains emission
unexplained — prime suspect is the XLA TPU scatter (the codebase already
avoids scatters in the count path because they lower poorly).  Measures:

  * 1-lane scatter .at[idx].set at m rows
  * (m, 2) row scatter
  * scatter-via-sort replacement (sort + seg scan)
  * sort_join_limbs with scatter vs sort un-permute (A/B)
  * stable vs unstable 5-lane sort at m rows (the emission sort)

Writes artifacts/microbench_compress2.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import measure_sync_latency, timed_enqueue
    from tpu_debruijn import sorting as S

    sync = measure_sync_latency(jnp, np)
    res = {"device": str(jax.devices()[0]), "sync_latency_s": round(sync, 4)}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", "microbench_compress2.json")

    def t(fn, *a):
        return timed_enqueue(
            fn, a, 10, sync,
            lambda o: np.asarray(jax.tree.leaves(o)[0].ravel()[:1]),
        )

    def rec(name, ms):
        res[name] = round(ms, 2)
        print(name, res[name], file=sys.stderr, flush=True)
        with open(path, "w") as f:
            json.dump(res, f, indent=1)
            f.write("\n")

    m = 2 * 1064960
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.permutation(m).astype(np.int32))
    val = jnp.asarray(rng.integers(0, 2**31, m, np.int64).astype(np.int32))
    val2 = jnp.asarray(rng.integers(0, 2**31, (m, 2), np.int64).astype(np.int32))

    rec("scatter_1lane_m_ms", t(
        jax.jit(lambda i, v: jnp.zeros(m, jnp.int32).at[i].set(v, mode="drop")),
        idx, val) * 1e3)

    rec("scatter_rows_m_x2_ms", t(
        jax.jit(lambda i, v: jnp.full((m, 2), -1, jnp.int32).at[i].set(v, mode="drop")),
        idx, val2) * 1e3)

    # scatter via sort: unique keys -> one unstable sort materializes the
    # permutation (idx is a permutation here, the link_chains tbl shape)
    rec("scatter_via_sort_ms", t(
        jax.jit(lambda i, v: jax.lax.sort([i, v], num_keys=1, is_stable=False)[1]),
        idx, val) * 1e3)

    # emission sort shapes: 1 key + 4 payloads, stable vs unstable
    ks = jnp.asarray(rng.integers(0, m, m, np.int64).astype(np.int32))
    ps = [jnp.asarray(rng.integers(0, 2**31, m, np.int64).astype(np.int32))
          for _ in range(4)]
    rec("sort_m_5lane_stable_ms", t(
        jax.jit(lambda k, a, b, c, d: jax.lax.sort([k, a, b, c, d], num_keys=1,
                                                   is_stable=True)),
        ks, *ps) * 1e3)
    rec("sort_m_5lane_unstable_ms", t(
        jax.jit(lambda k, a, b, c, d: jax.lax.sort([k, a, b, c, d], num_keys=1,
                                                   is_stable=False)),
        ks, *ps) * 1e3)
    # packed alternative: 1 key + 2 payloads
    rec("sort_m_3lane_stable_ms", t(
        jax.jit(lambda k, a, b: jax.lax.sort([k, a, b], num_keys=1,
                                             is_stable=True)),
        ks, ps[0], ps[1]) * 1e3)

    # sort_join A/B at the resolve_edges shape (n table + 2n queries)
    n = 1064960
    tabk = np.sort(
        rng.integers(0, 2**62, n, np.uint64).astype(np.uint64)
    )
    tlimbs = jnp.asarray(
        np.stack([(tabk >> 32).astype(np.uint32), tabk.astype(np.uint32)], 1)
    )
    q = jnp.concatenate([tlimbs, tlimbs], axis=0)
    ex = jnp.asarray(rng.integers(0, 256, n, np.int64).astype(np.int32))

    S._JOIN_UNPERMUTE[0] = "scatter"
    rec("join_scatter_ms", t(
        jax.jit(lambda tk, qq, v, e: S.sort_join_limbs(tk, v, qq, e)),
        tlimbs, q, jnp.int32(n), ex) * 1e3)
    S._JOIN_UNPERMUTE[0] = "sort"
    rec("join_sortunperm_ms", t(
        jax.jit(lambda tk, qq, v, e: S.sort_join_limbs(tk, v, qq, e)),
        tlimbs, q, jnp.int32(n), ex) * 1e3)
    S._JOIN_UNPERMUTE[0] = "scatter"

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

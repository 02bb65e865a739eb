"""Probe: does Mosaic support per-lane VMEM gathers, and how fast?

The rank-doubling loop's cost is one random (m, 4) row gather per round
at ~4ns/row through XLA's gather emitter (~12GB/s effective).  For
m <= ~1M the whole state table fits in VMEM (16MB); if a Pallas kernel
can gather per-lane from a VMEM-resident table, the doubling loop could
run entirely on-chip at VPU speed.

Probes (each may fail to lower — that's the data we're after):
  P1: out = table[idx]            (1-D int32 gather, table 256k)
  P2: jnp.take(table, idx)        (same via take)
  P3: table_2d[idx, :]            (row gather of (m, 4))
  P4: full doubling loop in-kernel (fori_loop over rounds)

Writes artifacts/pallas_gather_probe.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import measure_sync_latency, timed_enqueue

    res = {"device": str(jax.devices()[0])}
    sync = measure_sync_latency(jnp, np)

    M = 1 << 18  # 256k rows: 1MB per int32 plane
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, M, M, np.int64).astype(np.int32))
    tab = jnp.asarray(rng.integers(0, 2**31, M, np.int64).astype(np.int32))
    tab4 = jnp.asarray(rng.integers(0, 2**31, (M, 4), np.int64).astype(np.int32))

    def probe(name, fn, args):
        try:
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
            t = timed_enqueue(
                fn, args, 10, sync,
                lambda o: np.asarray(jax.tree.leaves(o)[0].ravel()[:1]),
            )
            res[name] = {"ok": True, "ms": round(t * 1e3, 3)}
        except Exception as e:  # noqa: BLE001 - we want the lowering error
            res[name] = {"ok": False, "err": str(e)[:300]}
        print(name, res[name], file=sys.stderr, flush=True)

    # P1: direct bracket gather
    def k1(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:]]

    f1 = pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((M,), jnp.int32),
    )
    probe("p1_bracket_gather", jax.jit(f1), (idx, tab))

    # P2: jnp.take
    def k2(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    f2 = pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((M,), jnp.int32),
    )
    probe("p2_take_gather", jax.jit(f2), (idx, tab))

    # P3: row gather from (M, 4)
    def k3(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:], :]

    f3 = pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((M, 4), jnp.int32),
    )
    probe("p3_row_gather", jax.jit(f3), (idx, tab4))

    # P4: 18 doubling rounds fully in-kernel (succ-only pointer jump)
    def k4(succ_ref, out_ref):
        def body(_, s):
            sc = jnp.clip(s, 0, M - 1)
            nxt = jnp.take(succ_ref[:], sc, axis=0)
            return jnp.where(s >= 0, nxt, s)

        out_ref[:] = jax.lax.fori_loop(0, 18, body, succ_ref[:])

    f4 = pl.pallas_call(
        k4,
        out_shape=jax.ShapeDtypeStruct((M,), jnp.int32),
    )
    succ = jnp.asarray(
        np.where(rng.random(M) < 0.99, rng.integers(0, M, M), -1).astype(np.int32)
    )
    probe("p4_doubling_18_rounds", jax.jit(f4), (succ,))

    # reference: the same gather through XLA
    probe("x1_xla_gather", jax.jit(lambda t, i: t[i]), (tab, idx))
    probe("x3_xla_row_gather", jax.jit(lambda t, i: t[i]), (tab4, idx))

    out = json.dumps(res, indent=1)
    print(out)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "artifacts", "pallas_gather_probe.json"), "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()

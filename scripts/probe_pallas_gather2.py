"""Probe round 2: which 2D gather forms does Mosaic lower, and how fast?

Round 1 (artifacts/pallas_gather_probe.json): 1-D gathers rejected with
"Only 2D gather is supported".  These probes map the supported surface:

  V1: take_along_axis(tab (R,128), idx (R,128), axis=0)  per-column row gather
  V2: take_along_axis(tab (R,128), idx (R,128), axis=1)  per-row lane gather
  V3: jnp.take(tab (R,128), idx (N,), axis=0)            global row gather
  V4: global flat gather = V3(row part) then V2(lane part) — the composite
      that would let the doubling loop run from a VMEM-resident table

Writes artifacts/pallas_gather_probe2.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from bench import measure_sync_latency, timed_enqueue

    res = {"device": str(jax.devices()[0])}
    sync = measure_sync_latency(jnp, np)

    R, L = 2048, 128  # table 2048 x 128 = 262144 elements (1MB)
    M = R * L
    rng = np.random.default_rng(0)
    tab2 = jnp.asarray(rng.integers(0, 2**31, (R, L), np.int64).astype(np.int32))
    idx_rows = jnp.asarray(rng.integers(0, R, (R, L), np.int64).astype(np.int32))
    idx_lanes = jnp.asarray(rng.integers(0, L, (R, L), np.int64).astype(np.int32))
    idx_flat = jnp.asarray(rng.integers(0, M, (R, L), np.int64).astype(np.int32))

    def probe(name, fn, args):
        try:
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
            t = timed_enqueue(
                fn, args, 10, sync,
                lambda o: np.asarray(jax.tree.leaves(o)[0].ravel()[:1]),
            )
            res[name] = {"ok": True, "ms": round(t * 1e3, 3)}
        except Exception as e:  # noqa: BLE001
            res[name] = {"ok": False, "err": str(e)[:300]}
        print(name, res[name], file=sys.stderr, flush=True)
        with open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "artifacts", "pallas_gather_probe2.json"), "w") as f:
            json.dump(res, f, indent=1)
            f.write("\n")

    def k_v1(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    probe("v1_taa_axis0", jax.jit(pl.pallas_call(
        k_v1, out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32))),
        (tab2, idx_rows))

    def k_v2(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    probe("v2_taa_axis1", jax.jit(pl.pallas_call(
        k_v2, out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32))),
        (tab2, idx_lanes))

    def k_v3(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:].reshape(-1), axis=0).reshape(
            R, L
        )

    probe("v3_take_rows", jax.jit(pl.pallas_call(
        k_v3, out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32))),
        (tab2, idx_rows))

    # V4: global flat gather out[i] = flat_tab[idx_flat[i]] via
    # row-part take_along_axis + lane-part take_along_axis.
    def k_v4(t_ref, i_ref, o_ref):
        idx = i_ref[:]
        row = idx // L
        lane = idx % L
        rows = jnp.take_along_axis(t_ref[:], row, axis=0)  # wrong lanes yet
        # rows[r, c] = tab[row[r, c], c]; we need tab[row, lane] — second
        # pass moves within the 128 lanes
        o_ref[:] = jnp.take_along_axis(rows, lane, axis=1)

    # NOTE: this composite is WRONG in general (rows selected per own
    # lane, then lane-moved — element (r,c) ends up tab[row[r,?],
    # lane[r,c]] only if row is constant per row-block).  It still
    # answers "do the two gathers lower and how fast" — correctness of a
    # real composite needs row broadcast; measured separately.
    probe("v4_two_phase_cost_model", jax.jit(pl.pallas_call(
        k_v4, out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32))),
        (tab2, idx_flat))

    # V5: dynamic row via scalar loop over sublanes? — skip (known slow).

    # XLA reference at same shape
    probe("x_taa_axis0", jax.jit(
        lambda t, i: jnp.take_along_axis(t, i, axis=0)), (tab2, idx_rows))
    probe("x_flat_gather", jax.jit(
        lambda t, i: t.reshape(-1)[i.reshape(-1)].reshape(R, L)),
        (tab2, idx_flat))

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""Probe round 3: jnp.take with 1-D indices over a 2-D VMEM table.

Round 2: take_along_axis(axis=1) lowers (lane gather ok); axis=0 crashed
the compile helper.  Round 1: 1-D bracket/take rejected.  The remaining
form that would enable VMEM-resident doubling: take(tab (R,128), idx
(N,), axis=0) -> (N, 128) row gather, composed with the axis=1 lane
gather for a full global gather.  Writes artifacts/pallas_gather_probe3.json.
"""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from bench import measure_sync_latency, timed_enqueue

    res = {"device": str(jax.devices()[0])}
    sync = measure_sync_latency(jnp, np)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", "pallas_gather_probe3.json")

    R, L = 2048, 128
    rng = np.random.default_rng(0)
    tab2 = jnp.asarray(rng.integers(0, 2**31, (R, L), np.int64).astype(np.int32))
    idx_r = jnp.asarray(rng.integers(0, R, (R,), np.int64).astype(np.int32))
    idx2 = jnp.asarray(rng.integers(0, R, (R, L), np.int64).astype(np.int32))
    lane2 = jnp.asarray(rng.integers(0, L, (R, L), np.int64).astype(np.int32))

    def probe(name, fn, args):
        try:
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
            t = timed_enqueue(fn, args, 10, sync,
                lambda o: np.asarray(jax.tree.leaves(o)[0].ravel()[:1]))
            res[name] = {"ok": True, "ms": round(t * 1e3, 3)}
        except Exception as e:  # noqa: BLE001
            res[name] = {"ok": False, "err": str(e)[:200]}
        print(name, res[name], file=sys.stderr, flush=True)
        with open(path, "w") as f:
            json.dump(res, f, indent=1); f.write("\n")

    # W1: row take with 1-D indices
    def k1(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)
    probe("w1_take_axis0_1d", jax.jit(pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32))), (tab2, idx_r))

    # W2: full composite global gather (row take via broadcasted idx rows
    # then lane gather) -- needs W1-like row selection with PER-ROW index
    def k2(t_ref, i_ref, l_ref, o_ref):
        rows = jnp.take(t_ref[:], i_ref[:, 0], axis=0)   # (R, L): row j = tab[idx[j,0]]
        o_ref[:] = jnp.take_along_axis(rows, l_ref[:], axis=1)
    probe("w2_composite", jax.jit(pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32))), (tab2, idx2, lane2))

    print(json.dumps(res, indent=1))

if __name__ == "__main__":
    main()

"""SPMD MSP-bucket sharding over a device mesh (the "distributed" layer).

Equivalent of the reference's caller-side sharded workflow
(/root/reference/src/test.rs:418-504): msp_sequence per read -> bucket ->
per-bucket filter_kmers + compress -> BaseGraph::combine -> global
compress_graph.  Here the scatter is a real ``all_to_all`` collective over
the mesh and every per-shard phase is the jitted vector pipeline.

Because MSP guarantees that *all* occurrences of a kmer land in the same
bucket, per-shard counting gives exact global counts; only unitigs that
cross bucket boundaries need the final global stitch (dangling-extension
tolerance per filter.rs:241-243, graph.rs:235-236).
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial

log = logging.getLogger("tpu_debruijn.parallel")
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tpu_debruijn import compress as C
from tpu_debruijn import filter as F
from tpu_debruijn import msp as M
from tpu_debruijn.filter import KmerTable
from tpu_debruijn.kmer import KmerSpec
from tpu_debruijn.parallel.mesh import SHARDS, make_mesh


@dataclasses.dataclass(frozen=True)
class ShardPlan:
    """Static shapes/policies of one sharded run (closed over by jit)."""

    k: int
    p: int
    stranded: bool
    min_obs: int
    n_shards: int
    cap_per_dest: int  # interval slots per (src, dst) device pair

    @property
    def spec(self) -> KmerSpec:
        return KmerSpec(self.k)

    @property
    def interval_len(self) -> int:
        return 2 * self.k - self.p  # msp.rs:292 bound


def _scatter_intervals(plan: ShardPlan, bases, lengths, labels):
    """Local MSP scan + all_to_all bucket exchange.

    Returns received (sub_bases, sub_len, sub_exts, sub_labels) arrays of
    leading dim n_shards * cap_per_dest, plus the local overflow count
    (intervals dropped because a destination's slots filled up).
    """
    k, p, ns, cap_d = plan.k, plan.p, plan.n_shards, plan.cap_per_dest
    iv = M.msp_intervals_device(k, p, bases, lengths, None, rc=not plan.stranded)
    sub = M.gather_interval_bases(k, p, bases, iv)  # (cap, 2k-p)
    cap = sub.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < iv["n_intervals"]
    dest = jnp.where(valid, iv["bucket"] % ns, ns)
    lab = jnp.asarray(labels, jnp.int32)[iv["read"]]

    # rank each interval within its destination group (stable, sort-based —
    # scales to any n_shards without unrolled loops)
    hist = jnp.zeros(ns + 1, jnp.int32).at[dest].add(1)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(hist)[:-1]])
    order = jnp.argsort(dest, stable=True)
    rank = jnp.zeros(cap, jnp.int32).at[order].set(jnp.arange(cap, dtype=jnp.int32))
    within = rank - offsets[dest]

    ok = valid & (within < cap_d)
    slot = jnp.where(ok, dest * cap_d + within, ns * cap_d)
    overflow = (valid & ~ok).sum().astype(jnp.int32)

    nslots = ns * cap_d
    send_sub = jnp.zeros((nslots, plan.interval_len), jnp.int32).at[slot].set(
        sub, mode="drop"
    )
    send_len = jnp.zeros(nslots, jnp.int32).at[slot].set(iv["length"], mode="drop")
    send_exts = jnp.zeros(nslots, jnp.int32).at[slot].set(iv["exts"], mode="drop")
    send_lab = jnp.zeros(nslots, jnp.int32).at[slot].set(lab, mode="drop")

    a2a = partial(
        jax.lax.all_to_all, axis_name=SHARDS, split_axis=0, concat_axis=0, tiled=True
    )
    return (
        a2a(send_sub),
        a2a(send_len),
        a2a(send_exts),
        a2a(send_lab),
        overflow,
    )


def sharded_count_step(plan: ShardPlan, data_reduce: str = "label_first"):
    """Build the per-device step function (to be wrapped in shard_map).

    Returns fn(bases, lengths, labels) -> (KmerTableDev, chains, u_exts,
    contrib, overflow): the complete sharded count+compress forward step.
    """

    def step(bases, lengths, labels):
        sub, slen, sexts, slab, overflow = _scatter_intervals(
            plan, bases, lengths, labels
        )
        table = F.count_kmers(
            plan.spec,
            sub,
            slen,
            sexts,
            slab,
            stranded=plan.stranded,
            min_obs=plan.min_obs,
            data_reduce=data_reduce,
        )
        chains, u_exts, contrib = C.compress_kmer_table_device(
            plan.spec, plan.stranded, table.kmers, table.exts, table.n_valid
        )
        # leading singleton axis on every leaf so the out_specs concat
        # yields clean (n_shards, ...) per-shard stacks
        return jax.tree.map(
            lambda x: x[None], (table, chains, u_exts, contrib, overflow)
        )

    return step


def _dest_histogram_fn(k: int, p: int, n_shards: int, stranded: bool, mesh):
    """Cheap first pass for count-then-allocate buffer sizing (SURVEY §7
    hard part 4): per-device histogram of MSP intervals by destination.

    Returns fn(bases, lengths) -> (n_shards, n_shards) counts where
    row s, col d = intervals source device s will send to destination d.
    """

    def step(bases, lengths):
        iv = M.msp_intervals_device(k, p, bases, lengths, None, rc=not stranded)
        cap = iv["bucket"].shape[0]
        valid = jnp.arange(cap, dtype=jnp.int32) < iv["n_intervals"]
        dest = jnp.where(valid, iv["bucket"] % n_shards, n_shards)
        hist = jnp.zeros(n_shards + 1, jnp.int32).at[dest].add(1)
        return hist[None, :n_shards]

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(SHARDS), P(SHARDS)),
            out_specs=P(SHARDS),
            check_vma=False,
        )
    )


def _shard_map_fn(plan: ShardPlan, mesh, data_reduce: str = "label_first"):
    step = sharded_count_step(plan, data_reduce)
    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(SHARDS), P(SHARDS), P(SHARDS)),
            out_specs=P(SHARDS),
            # the sort/search primitives initialize loop carries from
            # constants; skip the varying-manual-axes consistency check
            check_vma=False,
        )
    )


def _pad_rows(bases, lengths, labels, n_shards):
    r = bases.shape[0]
    rpad = (-r) % n_shards
    if rpad:
        bases = np.pad(bases, ((0, rpad), (0, 0)))
        lengths = np.pad(lengths, (0, rpad))
        labels = np.pad(labels, (0, rpad))
    return bases, lengths, labels


def sharded_tables(
    reads: Sequence[np.ndarray],
    k: int,
    p: int,
    *,
    stranded: bool = False,
    min_obs: int = 1,
    mesh=None,
    labels: Optional[np.ndarray] = None,
    slack: Optional[float] = None,
    cap_per_dest: Optional[int] = None,
    data_reduce: str = "label_first",
):
    """Run the device-sharded scan/exchange/count/compress step.

    Buffer sizing is count-then-allocate by default (SURVEY §7 hard part
    4): a cheap histogram pass counts intervals per (source, destination)
    pair and the exchange buffers are sized to the max, so skewed
    minimizer distributions never overflow.  Pass ``slack`` (the legacy
    worst-case fraction heuristic) or an explicit ``cap_per_dest`` to skip
    the extra pass.

    Returns (plan, stacked KmerTableDev, chains, u_exts, contrib) with a
    leading n_shards axis on every array.
    """
    if mesh is None:
        mesh = make_mesh()
    n_shards = int(mesh.devices.size)
    items = [np.asarray(s, np.uint8) for s in reads if len(s) >= k]
    if not items:
        raise ValueError("no reads of length >= k")
    bases, lengths = F.pad_reads(items, min_len=k, pad_to=16)
    if labels is None:
        labels = np.zeros(len(items), np.int32)
    bases, lengths, labels = _pad_rows(bases, lengths, np.asarray(labels, np.int32), n_shards)

    r_loc = bases.shape[0] // n_shards
    cap = r_loc * (bases.shape[1] - k + 1)
    if cap_per_dest is None:
        if slack is not None:
            cap_per_dest = min(cap, max(16, int(np.ceil(cap * slack / n_shards))))
        else:
            hist_fn = _dest_histogram_fn(k, p, n_shards, stranded, mesh)
            hist = np.asarray(hist_fn(jnp.asarray(bases), jnp.asarray(lengths)))
            need = int(hist.max())
            # round up to a multiple of 128 so repeated runs with similar
            # skew reuse the compiled program (static shapes)
            cap_per_dest = min(cap, max(128, -(-need // 128) * 128))
    plan = ShardPlan(k, p, stranded, min_obs, n_shards, cap_per_dest)

    log.debug(
        "sharded_tables: %d reads over %d shards, cap_per_dest=%d",
        bases.shape[0], n_shards, cap_per_dest,
    )
    fn = _shard_map_fn(plan, mesh, data_reduce)
    table, chains, u_exts, contrib, overflow = fn(
        jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(labels)
    )
    total_overflow = int(np.asarray(overflow).sum())
    if total_overflow:
        raise RuntimeError(
            f"{total_overflow} MSP intervals overflowed their destination "
            f"buffers; re-run with a larger slack or explicit cap_per_dest"
        )
    return plan, table, chains, u_exts, contrib


def assemble_sharded(
    reads: Sequence[np.ndarray],
    k: int,
    p: int,
    *,
    stranded: bool = False,
    min_obs: int = 1,
    mesh=None,
    labels: Optional[np.ndarray] = None,
    slack: Optional[float] = None,
    cap_per_dest: Optional[int] = None,
    data_reduce_compress: str = "sum_sat_u16",
):
    """Full sharded assembly == test.rs:418-504 in one call.

    reads -> mesh-sharded MSP/count/compress -> combine shard graphs ->
    global re-compression.  Returns the final DebruijnGraph; the result
    equals the unsharded pipeline on the same reads (the reference's
    N-shard == 1-shard oracle).
    """
    from tpu_debruijn.graph import BaseGraph, compress_graph

    plan, table, chains, u_exts, contrib = sharded_tables(
        reads,
        k,
        p,
        stranded=stranded,
        min_obs=min_obs,
        mesh=mesh,
        labels=labels,
        slack=slack,
        cap_per_dest=cap_per_dest,
    )
    spec = plan.spec
    kmers = np.asarray(table.kmers)
    counts = np.asarray(table.counts)

    combined = BaseGraph(plan.k, stranded)
    for s in range(plan.n_shards):
        combined.add_flat(
            *C.assemble_unitigs_flat(
                spec,
                kmers[s],
                np.asarray(chains.uid[s]),
                np.asarray(chains.pos[s]),
                np.asarray(chains.flip[s]),
                np.asarray(chains.length[s]),
                np.asarray(chains.first_item[s]),
                np.asarray(chains.first_flip[s]),
                int(chains.n_unitigs[s]),
                np.asarray(u_exts[s]),
                np.asarray(contrib[s]),
                counts[s],
                data_reduce=data_reduce_compress,
            )
        )
    return compress_graph(combined.finish(), data_reduce=data_reduce_compress)

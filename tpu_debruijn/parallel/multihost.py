"""Multi-host orchestration: the same MSP-bucket pipeline over DCN+ICI.

The single-host pipeline (shard.py) is already SPMD over a 1-D mesh; on a
multi-host slice the identical program runs under ``jax.distributed`` —
the mesh spans every host's devices and the ``all_to_all`` bucket exchange
rides ICI within a host and DCN across hosts.  Reads are fed
process-local (each host reads its own FASTQ chunk), which is exactly the
data-parallel input sharding the plan's ``in_specs=P(SHARDS)`` expects.

This module only adds the bootstrap + host-sharded input helpers; it is
exercised in CI by the virtual-device mesh (the driver's multichip dry
run), since this image exposes a single TPU chip.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_read_slice(paths: Sequence[str]) -> List[str]:
    """Partition input files round-robin over processes (host-local IO)."""
    pid = jax.process_index()
    n = jax.process_count()
    return [p for i, p in enumerate(paths) if i % n == pid]


def global_mesh():
    """1-D mesh over every device of every process (ICI-contiguous order
    within hosts; the shard axis crosses DCN at host boundaries)."""
    from tpu_debruijn.parallel.mesh import SHARDS
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (SHARDS,))


def assemble_multihost(paths: Sequence[str], k: int, p: int, **kwargs):
    """Read this host's file slice and run the sharded assembly over the
    global mesh.  Each process must call this with the same arguments."""
    from tpu_debruijn.io import read_fastx
    from tpu_debruijn.parallel.shard import assemble_sharded

    reads: List[np.ndarray] = []
    for path in local_read_slice(paths):
        reads.extend(read_fastx(path))
    return assemble_sharded(reads, k, p, mesh=global_mesh(), **kwargs)

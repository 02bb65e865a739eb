"""Ad-hoc profiling: count vs compress timing at several batch sizes."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpu_debruijn import compress as C
from tpu_debruijn import filter as F
from tpu_debruijn.kmer import KmerSpec
from bench import make_reads  # noqa: E402

k = 31
spec = KmerSpec(k)
L = 160


def timeit(f, *a, iters=20):
    out = f(*a)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


for n_reads in (2048, 8192, 32768) if __import__("os").environ.get("BIG") else (2048, 8192):
    bases = make_reads(n_reads, L, 400_000)
    lengths = np.full(n_reads, L, np.int32)
    z = np.zeros(n_reads, np.int32)
    db, dl, de, dlab = map(jnp.asarray, (bases, lengths, z, z))

    count = jax.jit(
        lambda b, l, e, la: F.count_kmers(spec, b, l, e, la, stranded=False, min_obs=1)
    )
    t_count, table = timeit(count, db, dl, de, dlab)

    compress = jax.jit(
        lambda km, ex, nv: C.compress_kmer_table_device(spec, False, km, ex, nv)
    )
    t_comp, out = timeit(compress, table.kmers, table.exts, table.n_valid)

    n_kmers = n_reads * (L - k + 1)
    print(
        f"reads={n_reads:6d} kmers={n_kmers:8d} "
        f"count={t_count*1e6:8.1f}us compress={t_comp*1e6:8.1f}us "
        f"total_rate={n_kmers/(t_count+t_comp)/1e9:7.2f}Gkmer/s "
        f"n_valid={int(np.asarray(table.n_valid))} n_unitigs={int(np.asarray(out[0].n_unitigs))}"
    )

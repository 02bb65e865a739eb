"""Colored (multi-sample) assembly capability run on the live backend.

Builds a 3-sample colored corpus (~3M kmer observations), runs the
array-native CountFilterSet pipeline (filter_kmers_set_arrays), folds the
color sets through compression (compress_kmers_color_sets — the
SimpleCompress(extend) pattern over Vec<u8> colors, filter.rs:68-101 +
compression.rs:40-65), and records wall times + per-unitig color stats
into artifacts/colored_run.json.

Run: python scripts/bench_colored.py [--cpu] [--reads-per-sample 2700]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads-per-sample", type=int, default=2700)
    ap.add_argument("--read-len", type=int, default=160)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(repo, ".jax_cache_cpu" if args.cpu else ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_debruijn import compress as C
    from tpu_debruijn import filter as F
    from tpu_debruijn.graph import from_compress_output

    rng = np.random.default_rng(11)
    # three overlapping genomes: a shared core plus per-sample flanks,
    # so color sets genuinely mix ({0},{1},{2},{0,1},...,{0,1,2})
    core = rng.integers(0, 4, 60_000).astype(np.uint8)
    genomes = []
    for s in range(args.samples):
        flank_l = rng.integers(0, 4, 20_000).astype(np.uint8)
        flank_r = rng.integers(0, 4, 20_000).astype(np.uint8)
        genomes.append(np.concatenate([flank_l, core, flank_r]))

    reads = []
    L = args.read_len
    for s, g in enumerate(genomes):
        for _ in range(args.reads_per_sample):
            p = int(rng.integers(0, len(g) - L))
            r = g[p : p + L].copy()
            if rng.random() < 0.5:
                r = (3 - r[::-1]).astype(np.uint8)
            reads.append((r, 0, s))

    n_obs = len(reads) * (L - args.k + 1)
    t0 = time.time()
    table, pair_label, split = F.filter_kmers_set_arrays(
        reads, args.k, stranded=False, min_obs=2
    )
    t_filter = time.time() - t0

    t0 = time.time()
    nodes, out_labels, out_split = C.compress_kmers_color_sets(
        table, pair_label, split
    )
    t_compress = time.time() - t0

    graph = from_compress_output(args.k, False, [
        (s, e, 0) for s, e, _ in nodes
    ]).finish()

    set_sizes = np.diff(out_split)
    from collections import Counter

    dist = Counter(
        tuple(int(x) for x in out_labels[out_split[u] : out_split[u + 1]])
        for u in range(len(nodes))
    )
    result = {
        "device": str(jax.devices()[0]),
        "samples": args.samples,
        "n_reads": len(reads),
        "n_kmer_obs": n_obs,
        "n_valid_kmers": len(table),
        "n_color_pairs": len(pair_label),
        "n_unitigs": len(nodes),
        "filter_wall_s": round(t_filter, 1),
        "compress_wall_s": round(t_compress, 1),
        "obs_per_s": round(n_obs / (t_filter + t_compress), 1),
        "unitig_color_set_histogram": {
            str(kset): cnt for kset, cnt in sorted(dist.items())
        },
        "mean_colors_per_unitig": round(float(set_sizes.mean()), 2)
        if len(set_sizes)
        else 0,
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(repo, "artifacts", "colored_run.json"), "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()

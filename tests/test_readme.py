"""Keep the README quick-start honest: run it verbatim-shaped end to end."""

import gzip

import numpy as np

_LUT = np.frombuffer(b"ACGT", np.uint8)


def test_readme_quickstart(tmp_path, rng):
    # build a small fastq.gz like a user would have
    genome = rng.integers(0, 4, 800)
    path = tmp_path / "reads.fq.gz"
    with gzip.open(path, "wt") as f:
        for i in range(120):
            s = int(rng.integers(0, len(genome) - 80))
            r = genome[s : s + 80]
            f.write(f"@r{i}\n{bytes(_LUT[r]).decode()}\n+\n{'I' * 80}\n")

    # --- the README quick start, line for line ---
    from tpu_debruijn import filter as F, compress as C, io as IO
    from tpu_debruijn.graph import from_compress_output

    reads = IO.read_fastq(str(path))
    table = F.filter_kmers([(r, 0, 0) for r in reads], k=31,
                           stranded=False, min_obs=2)
    nodes = C.compress_kmers(table)
    graph = from_compress_output(31, False, nodes).finish()
    out = tmp_path / "assembly.gfa"
    graph.to_gfa(str(out))
    # --- end quick start ---

    text = out.read_text()
    assert text.startswith("H\t")
    assert sum(1 for line in text.splitlines() if line.startswith("S\t")) == len(graph)
    assert len(graph) >= 1

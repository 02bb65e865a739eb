"""Run the parity test subset on the REAL TPU backend once per round.

VERDICT r3 weak item 5: the pytest suite pins jax_platforms=cpu, so
backend-divergence risk (lax.sort stability, Mosaic lowering, gather
emitter differences) was only covered by bench runs.  This script runs
the core parity suites with the axon TPU backend live and records the
result in artifacts/tpu_tests.json.

Run from the repo root (the axon plugin is cwd-dependent):

    python scripts/run_tpu_tests.py [extra pytest args]

The subset is chosen to exercise every device code path (extraction,
canonicalization, sorts, segmented scans, partitions, joins, pointer
doubling, node-level recompression) while staying tractable through the
TPU tunnel (~8ms per dispatch): the big randomized sweeps stay on CPU.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUBSET = [
    "tests/test_exts.py",
    "tests/test_kmer_ops.py",
    "tests/test_dna.py",
    "tests/test_msp.py",
    "tests/test_io.py",
    "tests/test_filter.py",
    "tests/test_summarizers.py",
    "tests/test_compress.py",
    "tests/test_graph.py",
    "tests/test_kernels.py",
    "tests/test_golden.py",
    "tests/test_reference_vectors.py",
    "tests/test_rich_data.py",
    # runs on a 1-device mesh on silicon (test_parallel._NDEV); the
    # 8-shard equality stays on the CPU virtual mesh.  test_multihost
    # (subprocess Gloo) stays CPU-only.
    "tests/test_parallel.py",
]


def main():
    env = dict(os.environ)
    env["TPU_DEBRUIJN_TEST_BACKEND"] = "tpu"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *SUBSET, *sys.argv[1:]],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
    )
    dt = time.time() - t0
    tail = proc.stdout.strip().splitlines()[-5:]
    res = {
        "backend": "tpu (axon)",
        "subset": SUBSET,
        "rc": proc.returncode,
        "wall_s": round(dt, 1),
        "tail": tail,
    }
    print(json.dumps(res, indent=1))
    with open(os.path.join(REPO, "artifacts", "tpu_tests.json"), "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()

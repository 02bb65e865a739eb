"""Pallas TPU kernels for the engine's hot inner loops.

These are the TPU-native counterparts of the reference's per-int-width bit
kernels and AVX2 intrinsics (/root/reference/src/kmer.rs:97-228,
src/bitops_avx2.rs): branch-free uint32 lane ops on the VPU, fused so each
kmer batch is read from HBM once.

Every kernel has an ``interpret`` fallback so the same code path runs on
CPU test meshes; the jitted wrappers pick the real kernel on TPU.
"""

from tpu_debruijn.kernels.canonical import canonicalize_fused, pallas_enabled

__all__ = ["canonicalize_fused", "pallas_enabled"]

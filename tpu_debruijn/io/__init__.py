"""Host IO: native ASCII<->2-bit codec, FASTA/FASTQ reading, checkpoints.

The graph export formats (GFA/dot/JSON, graph.rs:493-710 equivalents) live
on DebruijnGraph in ``tpu_debruijn.graph``; re-exported here for
discoverability.
"""

from tpu_debruijn.io.native import (
    ascii_to_codes,
    codes_to_ascii,
    native_available,
    pack_codes,
    rc_codes,
    unpack_codes,
)
from tpu_debruijn.io.fastx import (read_fasta, read_fastx, read_fastq,
                                   stream_fastx_blocks)

__all__ = [
    "ascii_to_codes",
    "codes_to_ascii",
    "native_available",
    "pack_codes",
    "rc_codes",
    "unpack_codes",
    "read_fasta",
    "read_fastq",
    "read_fastx",
    "stream_fastx_blocks",
]

"""L0 base-code primitives: the 2-bit DNA alphabet.

Equivalent capability to the reference's base helpers
(/root/reference/src/lib.rs:51-108): A=0, C=1, G=2, T=3, with
complement(b) = (~b) & 3.  Host-side (numpy) versions here; the device
pipeline works directly on integer arrays and never needs scalar calls.
"""

from __future__ import annotations

import numpy as np

A, C, G, T = 0, 1, 2, 3

#: ascii byte -> 2-bit code, unknown bases map to 0 (like lib.rs:65-73)
_ASCII_TO_BITS = np.zeros(256, dtype=np.uint8)
#: ascii byte -> is a valid ACGT/acgt letter
_ASCII_VALID = np.zeros(256, dtype=bool)
for _c, _v in [("A", A), ("C", C), ("G", G), ("T", T)]:
    _ASCII_TO_BITS[ord(_c)] = _v
    _ASCII_TO_BITS[ord(_c.lower())] = _v
    _ASCII_VALID[ord(_c)] = True
    _ASCII_VALID[ord(_c.lower())] = True

_BITS_TO_ASCII = np.frombuffer(b"ACGT", dtype=np.uint8).copy()


def base_to_bits(c: int) -> int:
    """ASCII byte -> 2-bit code (unknown -> 0).  lib.rs:65 equivalent."""
    return int(_ASCII_TO_BITS[c])


def dna_only_base_to_bits(c: int):
    """ASCII byte -> 2-bit code, or None for non-ACGT.  lib.rs:76."""
    return int(_ASCII_TO_BITS[c]) if _ASCII_VALID[c] else None


def is_valid_base(c: int) -> bool:
    """True for ACGTacgt ascii bytes.  lib.rs:88."""
    return bool(_ASCII_VALID[c])


def bits_to_base(b: int) -> str:
    """2-bit code -> 'A'/'C'/'G'/'T' ('X' out of range).  lib.rs:94."""
    return "ACGT"[b] if 0 <= b <= 3 else "X"


def bits_to_ascii(b: int) -> int:
    """2-bit code -> ascii byte (b'X' out of range).  lib.rs:53."""
    return int(_BITS_TO_ASCII[b]) if 0 <= b <= 3 else ord("X")


def complement(base):
    """Complement of 2-bit base(s); works on scalars and arrays.  lib.rs:106."""
    return (~np.asarray(base)) & 3 if isinstance(base, np.ndarray) else (~base) & 3


def ascii_to_bases(s) -> np.ndarray:
    """Vectorized ascii (bytes/str/uint8 array) -> 2-bit base array.

    Unknown characters become A (0), matching DnaString::from_dna_string
    via base_to_bits (dna_string.rs:187).
    """
    if isinstance(s, str):
        s = s.encode()
    arr = np.frombuffer(bytes(s), dtype=np.uint8)
    return _ASCII_TO_BITS[arr].copy()


def ascii_valid_mask(s) -> np.ndarray:
    """Vectorized validity mask for ascii input (non-ACGT -> False)."""
    if isinstance(s, str):
        s = s.encode()
    arr = np.frombuffer(bytes(s), dtype=np.uint8)
    return _ASCII_VALID[arr].copy()


def bases_to_ascii(b: np.ndarray) -> bytes:
    """2-bit base array -> ascii bytes."""
    return _BITS_TO_ASCII[np.asarray(b, dtype=np.uint8)].tobytes()


def bases_to_str(b: np.ndarray) -> str:
    return bases_to_ascii(b).decode()

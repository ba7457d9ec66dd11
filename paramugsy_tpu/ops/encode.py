"""DNA encoding for on-device alignment.

Genomes are int8 tensors: A=0, C=1, G=2, T=3, anything else (N, IUPAC
ambiguity) = 4.  All compute kernels operate on these packed tensors; text
only exists at ingest/emit (the reference pipes FASTA text between external
binaries; we stage tensors into HBM once).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Host-side LUT: byte -> code.
_LUT = np.full(256, 4, dtype=np.int8)
for i, c in enumerate("ACGT"):
    _LUT[ord(c)] = i
    _LUT[ord(c.lower())] = i

_DECODE = np.frombuffer(b"ACGTN", dtype=np.uint8)


def encode(seq: str | bytes) -> np.ndarray:
    """Sequence text -> int8 codes (host)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return _LUT[np.frombuffer(seq, dtype=np.uint8)]


def decode(codes: np.ndarray) -> str:
    return _DECODE[np.asarray(codes)].tobytes().decode()


def revcomp_codes(codes):
    """Reverse complement in code space: A<->T (0<->3), C<->G (1<->2), N->N."""
    comp = jnp.where(codes < 4, 3 - codes, codes)
    return comp[::-1]


def revcomp_codes_np(codes: np.ndarray) -> np.ndarray:
    """Host (NumPy) reverse complement — avoids a device round trip."""
    return np.where(codes < 4, 3 - codes, codes).astype(np.int8)[::-1]


def pad_to(codes: np.ndarray, size: int, fill: int = 4) -> np.ndarray:
    """Pad with N codes to a static bucket size (shape stability under jit)."""
    if len(codes) > size:
        raise ValueError(f"sequence length {len(codes)} exceeds bucket {size}")
    out = np.full(size, fill, dtype=np.int8)
    out[: len(codes)] = codes
    return out


def bucket_size(n: int, minimum: int = 1 << 12) -> int:
    """Next power-of-two bucket (limits the number of compiled variants)."""
    size = minimum
    while size < n:
        size <<= 1
    return size


def kmer_codes(codes, k: int):
    """Packed 2-bit k-mer codes and validity at every window start.

    Returns (kmers[uint32, N], valid[bool, N]); positions with fewer than k
    bases remaining or any non-ACGT base in the window are invalid (their
    code is forced to 0).  k <= 16.
    """
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")
    n = codes.shape[0]
    base = jnp.where(codes < 4, codes, 0).astype(jnp.uint32)
    bad = (codes >= 4).astype(jnp.int32)
    acc = jnp.zeros(n, dtype=jnp.uint32)
    badc = jnp.zeros(n, dtype=jnp.int32)
    for j in range(k):
        shifted = jnp.roll(base, -j)
        acc = (acc << jnp.uint32(2)) | shifted
        badc = badc + jnp.roll(bad, -j)
    idx = jnp.arange(n)
    valid = (idx <= n - k) & (badc == 0)
    return jnp.where(valid, acc, 0), valid

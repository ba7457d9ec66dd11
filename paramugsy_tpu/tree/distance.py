"""Genome distance estimation on device (replaces the MUSCLE subprocess).

The reference shells out to ``muscle -clusteronly -tree1`` (k-mer distance
clustering) to get a guide tree (lib/base/mugsy_guide_tree.ml:72-90).  We
compute k-mer *presence sketches* — one dense {0,1} vector of dimension 4^k
per genome — and estimate pairwise Jaccard similarity with a single matmul
over the genome axis, which is exactly the MXU's sweet spot:

    inter = S @ S.T          (G x D) @ (D x G), bfloat16 on TPU
    union = |A| + |B| - inter
    J = inter / union
    mash distance D = -1/k * ln(2J / (1 + J))      (Ondov et al. 2016)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from paramugsy_tpu.ops.encode import kmer_codes


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_sketch(codes, k: int = 8):
    """Dense presence vector over the 4^k k-mer space (float32 [4^k])."""
    km, valid = kmer_codes(codes, k)
    dim = 4**k
    sketch = jnp.zeros(dim, dtype=jnp.float32)
    sketch = sketch.at[jnp.where(valid, km, 0)].max(
        jnp.where(valid, 1.0, 0.0)
    )
    return sketch


@jax.jit
def jaccard_matrix(sketches):
    """Pairwise Jaccard similarity from presence sketches [G, D]."""
    inter = jnp.dot(
        sketches, sketches.T, preferred_element_type=jnp.float32
    )
    sizes = jnp.diag(inter)
    union = sizes[:, None] + sizes[None, :] - inter
    return inter / jnp.maximum(union, 1.0)


def mash_distance(jaccard: np.ndarray, k: int = 8) -> np.ndarray:
    j = np.clip(np.asarray(jaccard), 1e-9, 1.0)
    d = -np.log(2 * j / (1 + j)) / k
    np.fill_diagonal(d, 0.0)
    return np.maximum(d, 0.0)


def distance_matrix(genome_codes: list[np.ndarray], k: int = 8) -> np.ndarray:
    """Pairwise Mash distances for a list of encoded genomes."""
    sketches = jnp.stack([kmer_sketch(jnp.asarray(c), k=k) for c in genome_codes])
    return mash_distance(jaccard_matrix(sketches), k=k)

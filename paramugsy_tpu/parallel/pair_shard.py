"""Sharded multi-pair alignment step (the distributed data path).

The reference distributes pairwise nucmer jobs over a cluster with shell
scripts and rsync manifests (lib/base/job_processor.ml:128-154 +
scripts/sync_to.sh).  Here a *batch of genome pairs* is a tensor sharded
over the ``pairs`` mesh axis; each device runs the seeding + clustering
kernels on its shard, and per-pair results are exchanged with an
all_gather over ICI — after which every host holds every pair's packed
summary and no filesystem hop is needed (the store remains for
resume only).  The guide-tree distance matrix shards the sketch
dimension (``kdim`` axis) so the Jaccard matmul contracts over a sharded
axis — XLA turns that into a psum.

`make_sharded_packed_pair_step` is the production data plane: the SAME
fused compute as the single-chip `seed_cluster_both_packed_batch`,
shard_mapped over the mesh, consumed by
`parallel.collective.sharded_genome_pair_deltas`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from paramugsy_tpu.ops.chaining import cluster_seeds
from paramugsy_tpu.ops.seeding import (
    find_seeds_both,
    seed_cluster_both_packed_batch,
)


def make_sharded_packed_pair_step(
    mesh: Mesh,
    *,
    k: int = 15,
    max_seeds: int = 1 << 15,
    unique_in_query: bool = False,
    min_match: int = 20,
    band: int = 16,
    max_gap: int = 90,
    max_clusters: int = 4096,
    sample_shift: int = 0,
    m_out: int | None = None,
    c_out: int | None = None,
    compact_slice: bool | None = None,
    gather: bool = False,
):
    """Jitted step: [B, N] pair batches sharded over ``pairs`` -> packed
    int32 [B, L].

    With ``gather`` the result is replicated on every device via
    all_gather; the default leaves it SHARDED over ``pairs`` so each host
    finishes (unpacks/chains/extends) only its own rows — the host tail
    scales with 1/hosts instead of being replicated (round 2 replicated
    it), and the packed-seed ICI traffic disappears entirely.  Finished
    delta entries are exchanged instead (collective.py), which are ~100x
    smaller.

    Per-shard compute is byte-identical to the single-chip batched path
    (`ops.seeding.seed_cluster_both_packed_batch`), so the host-side
    unpack/chain/extend tail is shared between one chip and a pod.
    """
    step = functools.partial(
        seed_cluster_both_packed_batch,
        k=k, max_seeds=max_seeds, unique_in_query=unique_in_query,
        min_match=min_match, band=band, max_gap=max_gap,
        max_clusters=max_clusters, sample_shift=sample_shift,
        m_out=m_out, c_out=c_out, compact_slice=compact_slice,
    )

    def shard_fn(refs, queries, q_lens):
        packed = step(refs, queries, q_lens)
        if gather:
            packed = lax.all_gather(packed, "pairs", axis=0, tiled=True)
        return packed

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("pairs"), P("pairs"), P("pairs")),
        out_specs=P("pairs") if not gather else P(),
        check_vma=False,
    )
    return jax.jit(mapped)


def _pair_step(
    ref_codes, query_codes, q_len, *, k, max_seeds, max_clusters, min_match=20
):
    """Single-pair device work: both-strand seeds -> per-strand clusters
    (no host round trip; same compute as the single-chip fused path).

    ``q_len`` is the pair's unpadded query length (rows may be N-padded to
    the batch width).  Output arrays carry a leading strand axis [2, ...]
    (0 = forward, 1 = reverse).
    """
    seeds = find_seeds_both(
        ref_codes, query_codes, q_len, k=k, max_seeds=max_seeds
    )
    base_keep = seeds.mask & (seeds.length >= min_match)
    per_strand = []
    for reverse in (False, True):
        cl = cluster_seeds(
            seeds.rpos,
            seeds.qpos,
            seeds.length,
            base_keep & (seeds.reverse == reverse),
            max_clusters=max_clusters,
        )
        per_strand.append(
            {
                "c_rstart": cl.c_rstart,
                "c_rend": cl.c_rend,
                "c_qstart": cl.c_qstart,
                "c_qend": cl.c_qend,
                "c_weight": cl.c_weight,
                "c_mask": cl.c_mask,
                "n_clusters": cl.n_clusters,
                "n_seeds": seeds.n_runs,
            }
        )
    return jax.tree.map(lambda a, b: jnp.stack([a, b]), *per_strand)


def make_sharded_pair_step(
    mesh: Mesh, *, k: int = 15, max_seeds: int = 1 << 14, max_clusters: int = 1024
):
    """Build a jitted step: pair batch [P, N] x2 -> gathered cluster stats.

    The batch axis is sharded over the ``pairs`` mesh axis; outputs are
    all-gathered so every host sees every pair's summaries (the reference's
    rsync-back of delta files, as one ICI collective).
    """
    step = functools.partial(
        _pair_step, k=k, max_seeds=max_seeds, max_clusters=max_clusters
    )

    def shard_fn(ref_batch, query_batch, qlen_batch):
        out = jax.vmap(step)(ref_batch, query_batch, qlen_batch)
        # Merge across the pairs axis so every device holds all summaries.
        return jax.tree.map(
            lambda x: lax.all_gather(x, "pairs", axis=0, tiled=True), out
        )

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("pairs"), P("pairs"), P("pairs")),
        out_specs=P(),
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def call(ref_batch, query_batch, qlen_batch=None):
        if qlen_batch is None:
            qlen_batch = jnp.full(
                (query_batch.shape[0],), query_batch.shape[1], jnp.int32
            )
        return jitted(ref_batch, query_batch, qlen_batch)

    return call


def make_sharded_distance_step(mesh: Mesh):
    """Jaccard matrix with the sketch dimension sharded over ``kdim``.

    sketches [G, D] with D sharded: the G x G matmul contracts over the
    sharded axis, produced with an explicit psum inside shard_map.
    """

    def shard_fn(sketches):
        inter_local = jnp.dot(
            sketches, sketches.T, preferred_element_type=jnp.float32
        )
        inter = lax.psum(inter_local, "kdim")
        sizes = jnp.diagonal(inter)
        union = sizes[:, None] + sizes[None, :] - inter
        return inter / jnp.maximum(union, 1.0)

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, "kdim"),),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)

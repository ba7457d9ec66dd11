"""Fine-grained phase breakdown of one headline-pair alignment rep."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from paramugsy_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import build_pair, GENOME_MBP
from paramugsy_tpu.ops.align_pair import (
    AlignConfig,
    _chains_of_strands,
    _entries_of_chain,
    _finish_pair,
    device_codes,
    initial_max_seeds,
    resolve_sample_shift,
)
from paramugsy_tpu.ops.encode import revcomp_codes_np
from paramugsy_tpu.ops.seeding import (
    seed_cluster_both_packed,
    unpack_seed_clusters,
)
import jax
import jax.numpy as jnp

n = int(GENOME_MBP * 1e6)
rng = np.random.default_rng(12345)
ref, query = build_pair(rng, n)
cfg = AlignConfig()
cache = {}
ref_d = device_codes(ref, cache, "r")
query_d = device_codes(query, cache, "q")
max_seeds = initial_max_seeds(cfg, ref_d.shape[0], query_d.shape[0])

shift = resolve_sample_shift(cfg, ref_d.shape[0], query_d.shape[0])
kw = dict(
    k=cfg.k, max_seeds=max_seeds, unique_in_query=cfg.unique_in_query,
    min_match=cfg.min_match, band=cfg.band, max_gap=cfg.max_gap,
    max_clusters=cfg.max_clusters, sample_shift=shift,
    merge_gap=cfg.seed_merge_gap,
)
print(f"sample_shift={shift} max_seeds={max_seeds}", flush=True)

# warm
packed_dev = seed_cluster_both_packed(ref_d, query_d, None, jnp.int32(len(query)), **kw)
jax.block_until_ready(packed_dev)

for rep in range(3):
    t0 = time.perf_counter()
    packed_dev = seed_cluster_both_packed(ref_d, query_d, None, jnp.int32(len(query)), **kw)
    jax.block_until_ready(packed_dev)
    t1 = time.perf_counter()
    packed = np.asarray(packed_dev)
    t2 = time.perf_counter()
    n_raw, n_runs, _samp_over, _mc, strands = unpack_seed_clusters(packed, max_seeds, cfg.max_clusters)
    t3 = time.perf_counter()
    chains = _chains_of_strands(strands, cfg)
    t4 = time.perf_counter()
    print(
        f"rep{rep}: device_dp={t1-t0:.3f} transfer({packed.nbytes>>10}KB)="
        f"{t2-t1:.3f} unpack={t3-t2:.3f} chain+assemble={t4-t3:.3f} "
        f"n_runs={n_runs} chains={len(chains)}",
        flush=True,
    )

# finish breakdown
from paramugsy_tpu.ops.extend import align_segments

query_rc = revcomp_codes_np(query)
t0 = time.perf_counter()
seg_count = 0
all_entries = []
for chain in chains:
    qn = query_rc if chain.reverse else query
    all_entries.extend(
        _entries_of_chain(chain, ref, qn, "r", "q", len(query), cfg)
    )
t1 = time.perf_counter()
print(f"finish total={t1-t0:.3f} entries={len(all_entries)}", flush=True)

# segment stats: lengths of inter-anchor gaps
seeds = np.concatenate([c.seeds for c in chains])
for chain in chains:
    s = chain.seeds
    if len(s) > 1:
        gr = s[1:, 0] - (s[:-1, 0] + s[:-1, 2])
        gq = s[1:, 1] - (s[:-1, 1] + s[:-1, 2])
        g = np.maximum(gr, gq)
        g = g[g <= cfg.break_len]
        hist = np.histogram(g, bins=[0, 1, 4, 16, 64, 256])[0]
        print(f"chain rev={chain.reverse} seeds={len(s)} seg_maxlen_hist[0,1,4,16,64,256]={hist}")

# isolate align_segments time
segs = []
for chain in chains:
    s = chain.seeds
    qn = query_rc if chain.reverse else query
    rend = s[:, 0] + s[:, 2] - 1
    qend = s[:, 1] + s[:, 2] - 1
    for i in range(1, len(s)):
        if max(s[i, 0] - rend[i - 1] - 1, s[i, 1] - qend[i - 1] - 1) <= cfg.break_len:
            segs.append((ref[rend[i-1]+1:s[i,0]], qn[qend[i-1]+1:s[i,1]]))
t0 = time.perf_counter()
res = align_segments(segs, cfg.scoring)
t1 = time.perf_counter()
print(f"align_segments alone: {t1-t0:.3f}s over {len(segs)} segs", flush=True)

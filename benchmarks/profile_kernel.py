"""Stage bisection of the fused seeding kernel + tunnel floor measurement.

Run on the real chip:
    timeout 500 python benchmarks/profile_kernel.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from paramugsy_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp
from jax import lax

from bench import build_pair, GENOME_MBP
from paramugsy_tpu.ops.align_pair import AlignConfig, device_codes
from paramugsy_tpu.ops.encode import kmer_canonical


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


n = int(GENOME_MBP * 1e6)
rng = np.random.default_rng(12345)
ref, query = build_pair(rng, n)
cfg = AlignConfig()
cache = {}
ref_d = device_codes(ref, cache, "r")
query_d = device_codes(query, cache, "q")
k = cfg.k
shift = 2

# --- tunnel floors -------------------------------------------------------
tiny = jnp.zeros((8,), jnp.int32)


@jax.jit
def _noop(x):
    return x + 1


t, _ = timeit(lambda x: np.asarray(_noop(x)), tiny)
print(f"RTT floor (dispatch+fetch 32B): {t*1000:.1f} ms", flush=True)

for kb in (32, 128, 352, 1024):
    buf = jnp.zeros((kb * 256,), jnp.int32)
    t, _ = timeit(lambda x: np.asarray(_noop(x)), buf)
    print(f"fetch {kb:5d} KB: {t*1000:.1f} ms", flush=True)

# --- kernel stages -------------------------------------------------------
M23 = (1 << 23) - 1


@jax.jit
def s0_canon(r, q):
    rk, rs, rv = kmer_canonical(r, k)
    qk, qs, qv = kmer_canonical(q, k)
    return rk, qk


@jax.jit
def s1_sort1(r, q):
    rk, rstrand, rvalid = kmer_canonical(r, k)
    qk, qstrand, qvalid = kmer_canonical(q, k)
    n_r, n_q = rk.shape[0], qk.shape[0]
    nn = n_r + n_q
    packed = jnp.concatenate(
        [
            (rstrand.astype(jnp.int32) << 23) | jnp.arange(n_r, dtype=jnp.int32),
            (1 << 24)
            | (qstrand.astype(jnp.int32) << 23)
            | jnp.arange(n_q, dtype=jnp.int32),
        ]
    )
    invalid_b = jnp.concatenate([~rvalid, ~qvalid])
    codes_all = jnp.concatenate([rk, qk])
    h = codes_all * jnp.uint32(2654435761)
    keep = (h >> jnp.uint32(32 - shift)) == 0
    keep = keep & ~invalid_b
    B = ((nn >> shift) + (nn >> (shift + 2)) + 1023) & ~1023
    B = min(B, nn)
    key1 = jnp.where(keep, codes_all, codes_all | jnp.uint32(1 << 30))
    key1, packed = lax.sort((key1, packed), num_keys=1)
    key1 = lax.slice_in_dim(key1, 0, B)
    packed = lax.slice_in_dim(packed, 0, B)
    return key1, packed


from paramugsy_tpu.ops.seeding import find_seeds_both


@functools.partial(jax.jit)
def s2_seeds(r, q, ql):
    return find_seeds_both(
        r, q, ql, k=k, max_seeds=4096, sample_shift=shift, merge_gap=None
    )


from paramugsy_tpu.ops.seeding import seed_cluster_both_packed


@jax.jit
def s3_full(r, q, ql):
    return seed_cluster_both_packed(
        r, q, None, ql,
        k=k, max_seeds=4096, min_match=cfg.min_match, band=cfg.band,
        max_gap=cfg.max_gap, max_clusters=cfg.max_clusters,
        sample_shift=shift, merge_gap=None,
    )


ql = jnp.int32(len(query))
t, _ = timeit(s0_canon, ref_d, query_d)
print(f"s0 kmer_canonical:        {t*1000:.1f} ms", flush=True)
t, _ = timeit(s1_sort1, ref_d, query_d)
print(f"s1 + keep + sort1+slice:  {t*1000:.1f} ms", flush=True)
t, _ = timeit(s2_seeds, ref_d, query_d, ql)
print(f"s2 + sort2/3 (find_seeds):{t*1000:.1f} ms", flush=True)
t, out = timeit(s3_full, ref_d, query_d, ql)
print(f"s3 full fused kernel:     {t*1000:.1f} ms ({out.nbytes>>10} KB out)", flush=True)

# end-to-end: dispatch + single blocking fetch (the bench's economics)
t0 = time.perf_counter()
packed = np.asarray(s3_full(ref_d, query_d, ql))
print(f"dispatch+fetch as one:    {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)

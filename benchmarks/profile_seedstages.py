"""Fine bisection inside find_seeds_both (stage-2 = 29 ms, where?).

Copies the kernel body with a stop= parameter; run on the real chip.
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
from paramugsy_tpu.ops.seeding import _prefix_max, _suffix_min

BIG = jnp.int32(2**31 - 1)
k = 15
shift = 2
max_seeds = 4096


@functools.partial(jax.jit, static_argnames=("stop",))
def staged(ref_codes, query_codes, q_len, stop: str):
    rk, rstrand, rvalid = kmer_canonical(ref_codes, k)
    qk, qstrand, qvalid = kmer_canonical(query_codes, k)
    n_r, n_q = rk.shape[0], qk.shape[0]
    n = n_r + n_q
    merge_gap = 16 << shift
    M23 = (1 << 23) - 1
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
    B = ((n >> shift) + (n >> (shift + 2)) + 1023) & ~1023
    B = min(B, n)
    key1 = jnp.where(keep, codes_all, codes_all | jnp.uint32(1 << 30))
    key1, packed = lax.sort((key1, packed), num_keys=1)
    key1 = lax.slice_in_dim(key1, 0, B)
    packed = lax.slice_in_dim(packed, 0, B)
    n = B
    if stop == "sort1":
        return key1, packed
    valid = key1 < (1 << 30)
    same_code = key1 == jnp.roll(key1, 1)

    owner = packed >> jnp.int32(24)
    strand = (packed >> jnp.int32(23)) & 1
    pos = packed & M23

    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = valid & (~same_code | (idx == 0))
    nxt_invalid = jnp.concatenate([~valid[1:], jnp.array([True])])
    nxt_start = jnp.concatenate([is_start[1:], jnp.array([True])])
    is_end = valid & (nxt_start | nxt_invalid)

    ref_in = (owner == 0) & valid
    query_in = (owner > 0) & valid
    cum_ref = jnp.cumsum(ref_in.astype(jnp.int32))
    if stop == "cumref":
        return cum_ref

    def seg_count(cum, contrib):
        before = _prefix_max(
            jnp.where(is_start, cum - contrib.astype(jnp.int32), -1)
        )
        at_end = _suffix_min(jnp.where(is_end, cum, BIG))
        return at_end - before

    ref_count = seg_count(cum_ref, ref_in)
    if stop == "segcount":
        return ref_count

    seg_start_idx = _prefix_max(jnp.where(is_start, idx, -1))
    last_ref_idx = _prefix_max(jnp.where(ref_in, idx, -1))
    if stop == "idxmax":
        return seg_start_idx, last_ref_idx
    ref_packed = packed[jnp.maximum(last_ref_idx, 0)]
    if stop == "gather1":
        return ref_packed
    rpos = ref_packed & M23
    r_strand = (ref_packed >> jnp.int32(23)) & 1

    is_match = valid & query_in & (ref_count == 1) & (last_ref_idx >= seg_start_idx)
    n_raw = jnp.sum(is_match.astype(jnp.int32))

    rev = strand != r_strand
    qpos_local = jnp.where(rev, q_len - pos - k, pos)
    owner2 = 1 + rev.astype(jnp.int32)

    OFF = 1 << 23
    diag = rpos - qpos_local + OFF
    key2 = jnp.where(
        is_match, (owner2 << jnp.int32(24)) | diag, jnp.int32(1 << 30)
    ).astype(jnp.int32)
    key2, rpos_c = lax.sort((key2, rpos), num_keys=2)
    if stop == "sort2":
        return key2, rpos_c
    mask_c = key2 < (1 << 30)
    owner_c = (key2 >> jnp.int32(24)) & 3
    qpos_c = rpos_c - (key2 & (OFF * 2 - 1)) + OFF
    cidx = idx

    prev_mask = jnp.roll(mask_c, 1).at[0].set(False)
    dr_prev = rpos_c - jnp.roll(rpos_c, 1)
    run_start = mask_c & (
        ~prev_mask
        | (key2 != jnp.roll(key2, 1))
        | (dr_prev < 1)
        | (dr_prev > merge_gap + 1)
    )
    dr_next = jnp.roll(rpos_c, -1) - rpos_c
    next_continues = (
        jnp.roll(mask_c, -1)
        & (jnp.roll(key2, -1) == key2)
        & (dr_next >= 1)
        & (dr_next <= merge_gap + 1)
    )
    is_run_end = mask_c & ((cidx == n - 1) | ~next_continues)
    run_start_idx = _prefix_max(jnp.where(run_start, cidx, -1))
    if stop == "runmerge":
        return run_start_idx, is_run_end
    rpos0 = rpos_c[jnp.maximum(run_start_idx, 0)]
    if stop == "gather2":
        return rpos0
    run_rpos = rpos0
    run_qpos = qpos_c - (rpos_c - rpos0)
    run_span = rpos_c - rpos0 + k

    n_runs = jnp.sum(is_run_end.astype(jnp.int32))

    key3 = jnp.where(
        is_run_end, (owner_c << jnp.int32(24)) | run_rpos, jnp.int32(1 << 30)
    ).astype(jnp.int32)
    key3, o_qpos, o_len = lax.sort(
        (key3, run_qpos, run_span), num_keys=1, is_stable=True
    )
    take = min(max_seeds, n)
    cut = lambda x: lax.dynamic_slice_in_dim(x, 0, take)  # noqa: E731
    return cut(key3), cut(o_qpos), cut(o_len), n_raw, n_runs


@functools.partial(jax.jit, static_argnames=("stop",))
def staged_sum(ref_codes, query_codes, q_len, stop: str):
    """Scalar-sum wrapper: forces full execution + a 4-byte fetch, so
    timings are trustworthy even if block_until_ready is lazy on axon."""
    out = staged(ref_codes, query_codes, q_len, stop=stop)
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(x.astype(jnp.int32)) for x in leaves)


def timeit(fn, *args, reps=5, **kw):
    out = np.asarray(fn(*args, **kw))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = np.asarray(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best


n = int(GENOME_MBP * 1e6)
rng = np.random.default_rng(12345)
ref, query = build_pair(rng, n)
cache = {}
ref_d = device_codes(ref, cache, "r")
query_d = device_codes(query, cache, "q")
ql = jnp.int32(len(query))

t_rtt = timeit(staged_sum, ref_d, query_d, ql, stop="sort1")
print(f"(sort1 incl RTT: {t_rtt*1000:.1f} ms)", flush=True)
prev = 0.0
for stop in ("sort1", "cumref", "segcount", "idxmax", "gather1", "sort2",
             "runmerge", "gather2", "full"):
    t = timeit(staged_sum, ref_d, query_d, ql, stop=stop)
    print(f"{stop:10s}: {t*1000:7.1f} ms  (+{(t-prev)*1000:6.1f})", flush=True)
    prev = t

"""Breakdown of the device wavefront DP engine: forward vs traceback vs
transfer, at the bench smoke's shape (64 x 8 kb, band 512).

Run on the real chip: timeout 580 python benchmarks/profile_devdp.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from paramugsy_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from paramugsy_tpu.ops.pallas_extend import (
    _device_stream_inputs,
    _expand_streams,
    _wavefront_streams,
    wavefront_dp,
    wavefront_dp_device_tb,
    wavefront_align_many,
)

rng = np.random.default_rng(0)
n_pairs, length = 64, 8192
pairs = []
for _ in range(n_pairs):
    a = rng.integers(0, 4, size=length).astype(np.int8)
    b = np.delete(a, rng.choice(length, 20, replace=False)).copy()
    m = rng.random(len(b)) < 0.02
    b[m] = ((b[m] + 1) % 4).astype(np.int8)
    pairs.append((a, b))

cells = sum(len(a) * 512 for a, _ in pairs)


def timeit(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# end-to-end (the bench number)
t = timeit(lambda: wavefront_align_many(pairs))
print(f"end-to-end wavefront_align_many: {t*1000:.0f} ms = {cells/t/1e9:.2f} Gcells/s", flush=True)

# forward only (sum of packed dirs, 4-byte fetch)
steps = max(len(a) + len(b) for a, b in pairs)
chunk = 128
steps = -(-steps // chunk) * chunk
bucket = chunk
while bucket < steps:
    bucket *= 2
A_new, B_new, Awin, Bwin = _wavefront_streams(pairs, bucket, 64, 512)
args = (jnp.asarray(A_new), jnp.asarray(B_new), jnp.asarray(Awin), jnp.asarray(Bwin))


@jax.jit
def fwd_sum(a, b, c, d):
    return jnp.sum(
        wavefront_dp(a, b, c, d, width=512, chunk=chunk, batch=64)
    )


t = timeit(lambda: np.asarray(fwd_sum(*args)))
print(f"forward only (+RTT):            {t*1000:.0f} ms = {cells/t/1e9:.2f} Gcells/s", flush=True)

# forward + device traceback (path fetch)
lens = np.array([(len(a), len(b)) for a, b in pairs], np.int32)
lens_j = jnp.asarray(lens)


def run_tb():
    buf = wavefront_dp_device_tb(
        *args, lens_j, width=512, chunk=chunk, batch=64
    )
    return np.asarray(buf)


t = timeit(run_tb)
print(f"forward + device tb (+fetch):   {t*1000:.0f} ms = {cells/t/1e9:.2f} Gcells/s", flush=True)

# --- discriminators ------------------------------------------------------
# A: pure-SNP pairs (no indels): ideal jump conditions.
pairs2 = []
for _ in range(n_pairs):
    a = rng.integers(0, 4, size=length).astype(np.int8)
    b = a.copy()
    m = rng.random(len(b)) < 0.02
    b[m] = ((b[m] + 1) % 4).astype(np.int8)
    pairs2.append((a, b))
A_new2 = _device_stream_inputs(pairs2, bucket, 64, 512)
import paramugsy_tpu.ops.pallas_extend as pe

args2 = pe._expand_streams(*map(jnp.asarray, A_new2), steps=bucket, width=512)
lens2 = jnp.asarray(np.array([(len(a), len(b)) for a, b in pairs2], np.int32))


def run_tb2():
    return np.asarray(wavefront_dp_device_tb(*args2, lens2, width=512, chunk=chunk, batch=64))


t = timeit(run_tb2)
print(f"fwd+tb PURE-SNP pairs:          {t*1000:.0f} ms", flush=True)

# B: forward + bitmap build only (no walk): cost of the XLA bitmap pass.
@jax.jit
def fwd_bm(a, b, c, d):
    dirs = pe.wavefront_dp(a, b, c, d, width=512, chunk=chunk, batch=64)
    dirs = jnp.transpose(dirs, (1, 0, 2))
    u = dirs.astype(jnp.uint32)
    e = (u & jnp.uint32(0x33333333)) == 0
    o = (u & jnp.uint32(0xCCCCCCCC)) == 0
    st = jnp.stack([e, o], axis=1)
    r32 = (bucket // 16) // 32
    bits = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, None, :, None]
    bmp = jnp.sum(st.reshape(64, 2, r32, 32, 512).astype(jnp.uint32) * bits, axis=3, dtype=jnp.uint32)
    return jnp.sum(bmp.astype(jnp.int32)) + jnp.sum(dirs)


t = timeit(lambda: np.asarray(fwd_bm(*args)))
print(f"fwd + bitmap build only (+RTT): {t*1000:.0f} ms", flush=True)

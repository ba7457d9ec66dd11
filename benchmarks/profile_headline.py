"""One-off: phase-by-phase wall breakdown of the headline bench pair.

Run on the real chip to see where the 4m26s warm wall goes:
    timeout 580 python benchmarks/profile_headline.py
"""
import sys
import time

t0 = time.perf_counter()


def mark(label):
    print(f"[{time.perf_counter() - t0:7.1f}s] {label}", flush=True)


mark("python start")
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
from paramugsy_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
mark("cache enabled")

import jax  # noqa: E402

mark(f"jax imported")
dev = jax.devices()
mark(f"devices: {dev}")

from bench import build_pair, GENOME_MBP  # noqa: E402
from paramugsy_tpu.ops.align_pair import AlignConfig, align_pair  # noqa: E402
from paramugsy_tpu.ops import engines  # noqa: E402

n = int(GENOME_MBP * 1e6)
rng = np.random.default_rng(12345)
ref, query = build_pair(rng, n)
mark("pair built")

cfg = AlignConfig()
cache = {}
entries = align_pair(ref, query, "warm.r", "warm.q", cfg, device_cache=cache)
mark(f"warm-up align done ({len(entries)} entries)")

for rep in range(3):
    t = time.perf_counter()
    entries = align_pair(ref, query, "warm.r", "warm.q", cfg, device_cache=cache)
    mark(f"rep {rep}: {time.perf_counter() - t:.3f}s")

# Phase breakdown of one rep using internal pieces.
from paramugsy_tpu.ops.align_pair import (  # noqa: E402
    _chain_seeds_all,
    _finish_pair,
    device_codes,
)

t = time.perf_counter()
ref_d = device_codes(ref, cache, "warm.r")
query_d = device_codes(query, cache, "warm.q")
mark(f"device codes (cached): {time.perf_counter() - t:.3f}s")

t = time.perf_counter()
chains = _chain_seeds_all(ref_d, query_d, len(query), cfg)
mark(f"seed+cluster+chain: {time.perf_counter() - t:.3f}s ({len(chains)} chains)")

t = time.perf_counter()
entries = _finish_pair(chains, ref, query, "warm.r", "warm.q", cfg)
mark(f"finish (extend+assemble): {time.perf_counter() - t:.3f}s")
mark(f"dp_engines: {dict(engines.COUNTS)}")

# uncached upload cost
t = time.perf_counter()
_ = device_codes(ref, None, None)
import jax

jax.block_until_ready(_)
mark(f"fresh 2Mbp upload: {time.perf_counter() - t:.3f}s")
print("TOTAL", time.perf_counter() - t0, flush=True)

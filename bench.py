"""Benchmark harness: pairwise whole-genome alignment throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config: a synthetic bacterial-scale genome pair (ref + 1%-diverged query
with indels and an inversion), aligned end-to-end (device seeding/clustering
+ host chaining/extension) after a warm-up run that absorbs compilation.

Baseline: the reference pipeline's aligner is external MUMmer ``nucmer``;
a nucmer run on an E. coli-scale pair costs ~15-30 s on one CPU core,
i.e. ~0.3 aligned Mbp/s.  BASELINE.md records that the reference publishes
no numbers of its own, so this constant is the measured-order-of-magnitude
stand-in the driver can compare against.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_ALIGNED_MBP_PER_S = 0.3
GENOME_MBP = 2.0


def build_pair(rng, n):
    bases = np.array(list("ACGT"))
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    q = ref.copy()
    subs = rng.random(n) < 0.01
    q[subs] = ((q[subs] + rng.integers(1, 4, size=int(subs.sum()))) % 4).astype(np.int8)
    # a few indels + one inversion, applied in numpy code space
    q = np.concatenate([q[: n // 3], q[n // 3 + 12 :]])
    ins = rng.integers(0, 4, size=9).astype(np.int8)
    q = np.concatenate([q[: n // 2], ins, q[n // 2 :]])
    a, b = 2 * n // 3, 2 * n // 3 + 20000
    inv = (3 - q[a:b])[::-1].copy()
    q = np.concatenate([q[:a], inv, q[b:]])
    return ref, q


def main() -> None:
    import jax

    from paramugsy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from paramugsy_tpu.ops.align_pair import AlignConfig, align_pair

    n = int(GENOME_MBP * 1e6)
    rng = np.random.default_rng(12345)
    ref, query = build_pair(rng, n)
    cfg = AlignConfig()

    # Warm-up: compiles (or loads from the persistent cache) the device
    # kernels for this bucket shape.
    _ = align_pair(ref, query, "warm.r", "warm.q", cfg)

    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        entries = align_pair(ref, query, "R.c", "Q.c", cfg)
        dt = min(dt, time.perf_counter() - t0)

    aligned_cols = sum(e.alignment_length() for e in entries)
    mbp_per_s = aligned_cols / 1e6 / dt
    print(
        json.dumps(
            {
                "metric": "aligned_mbp_per_s_per_chip",
                "value": round(mbp_per_s, 3),
                "unit": "Mbp/s",
                "vs_baseline": round(mbp_per_s / BASELINE_ALIGNED_MBP_PER_S, 2),
                "detail": {
                    "genome_mbp": GENOME_MBP,
                    "entries": len(entries),
                    "aligned_bp": aligned_cols,
                    "wall_s": round(dt, 3),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark harness: pairwise whole-genome alignment throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config: a synthetic bacterial-scale genome pair (ref + 1%-diverged query
with indels and an inversion), aligned end-to-end (device seeding/clustering
+ chaining + extension) after a warm-up run that absorbs compilation.

Baselines (see benchmarks/BENCH_NOTES.md "Baseline provenance"):
* ``vs_baseline`` compares against a MEASURED single-core host-CPU run of
  this same pipeline on this same pair (taskset -c 0, JAX_PLATFORMS=cpu,
  PARAMUGSY_DEVICE_DP=0): 5.4 Mbp/s on this machine, 2026-08-19.  That is
  the strongest single-core baseline available in this environment.
* The reference's own aligner is external MUMmer ``nucmer`` (not present
  here, no egress to fetch it); literature timings for bacterial-scale
  pairs put it at ~0.1-0.5 Mbp/s single-core — reported separately in
  ``detail.vs_nucmer_class_estimate`` and clearly labeled an estimate.

``detail`` also reports the device wavefront-DP engine's end-to-end
throughput (64 x 8 kbp banded alignments, on-device traceback) and a
repeat-rich-input measurement, so kernel or repeat-handling regressions
are visible in BENCH_rN.json.
"""
from __future__ import annotations

import json
import time

import numpy as np

# Measured on this machine (2026-08-19): same pipeline, one CPU core
# (taskset -c 0, JAX_PLATFORMS=cpu, PARAMUGSY_DEVICE_DP=0), same pair.
BASELINE_HOST_1CORE_MBP_PER_S = 5.4
# Literature-derived nucmer-class estimate (NOT measured here): MUMmer-
# family aligners run bacterial pairs in tens of seconds single-core.
NUCMER_CLASS_MBP_PER_S_ESTIMATE = 0.3
GENOME_MBP = 2.0


def build_pair(rng, n):
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


def build_repeat_rich_pair(rng, n, unit=4000, copies=40):
    """A pair whose ref carries a dispersed repeat family (`copies` copies
    of a `unit`-bp element at ~95% identity) — hostile input for unique-
    k-mer seeding, unlike the headline pair."""
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    element = rng.integers(0, 4, size=unit).astype(np.int8)
    sites = rng.choice(n - unit, size=copies, replace=False)
    for s in sites:
        copy = element.copy()
        m = rng.random(unit) < 0.05
        copy[m] = ((copy[m] + 1) % 4).astype(np.int8)
        ref[s : s + unit] = copy
    q = ref.copy()
    subs = rng.random(n) < 0.01
    q[subs] = ((q[subs] + rng.integers(1, 4, size=int(subs.sum()))) % 4).astype(np.int8)
    q = np.concatenate([q[: n // 2], q[n // 2 + 17 :]])
    return ref, q


def bench_align(ref, query, cfg, align_pair, reps=3):
    dt = float("inf")
    entries = []
    for _ in range(reps):
        t0 = time.perf_counter()
        entries = align_pair(ref, query, "R.c", "Q.c", cfg)
        dt = min(dt, time.perf_counter() - t0)
    aligned = sum(e.alignment_length() for e in entries)
    return aligned / 1e6 / dt, entries, dt


def bench_device_dp(rng, n_pairs=64, length=8192, reps=2):
    """End-to-end device wavefront DP (forward + on-device traceback)."""
    from paramugsy_tpu.ops.pallas_extend import wavefront_align_many

    pairs = []
    for _ in range(n_pairs):
        a = rng.integers(0, 4, size=length).astype(np.int8)
        b = np.delete(a, rng.choice(length, 20, replace=False)).copy()
        m = rng.random(len(b)) < 0.02
        b[m] = ((b[m] + 1) % 4).astype(np.int8)
        pairs.append((a, b))
    _ = wavefront_align_many(pairs)  # warm-up / compile
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = wavefront_align_many(pairs)
        dt = min(dt, time.perf_counter() - t0)
    cells = sum(len(a) * 512 for a, _ in pairs)
    assert all(r[2] >= length for r in res)
    return cells / dt / 1e9


def main() -> None:
    import jax

    from paramugsy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from paramugsy_tpu.ops import engines
    from paramugsy_tpu.ops.align_pair import AlignConfig, align_pair

    n = int(GENOME_MBP * 1e6)
    rng = np.random.default_rng(12345)
    ref, query = build_pair(rng, n)
    cfg = AlignConfig()

    # Warm-up: compiles (or loads from the persistent cache) the device
    # kernels for this bucket shape.
    _ = align_pair(ref, query, "warm.r", "warm.q", cfg)

    mbp_per_s, entries, dt = bench_align(ref, query, cfg, align_pair)

    rr_ref, rr_query = build_repeat_rich_pair(rng, n)
    _ = align_pair(rr_ref, rr_query, "rwarm.r", "rwarm.q", cfg)
    rr_mbp_per_s, rr_entries, rr_dt = bench_align(
        rr_ref, rr_query, cfg, align_pair
    )

    device_dp_gcells = None
    if jax.default_backend() == "tpu":
        device_dp_gcells = round(bench_device_dp(rng), 3)

    print(
        json.dumps(
            {
                "metric": "aligned_mbp_per_s_per_chip",
                "value": round(mbp_per_s, 3),
                "unit": "Mbp/s",
                "vs_baseline": round(
                    mbp_per_s / BASELINE_HOST_1CORE_MBP_PER_S, 2
                ),
                "detail": {
                    "genome_mbp": GENOME_MBP,
                    "entries": len(entries),
                    "aligned_bp": sum(e.alignment_length() for e in entries),
                    "wall_s": round(dt, 3),
                    "backend": jax.default_backend(),
                    "baseline_host_1core_mbp_per_s": BASELINE_HOST_1CORE_MBP_PER_S,
                    "vs_nucmer_class_estimate": round(
                        mbp_per_s / NUCMER_CLASS_MBP_PER_S_ESTIMATE, 1
                    ),
                    "repeat_rich_mbp_per_s": round(rr_mbp_per_s, 3),
                    "repeat_rich_entries": len(rr_entries),
                    "device_dp_gcells_per_s": device_dp_gcells,
                    "dp_engines": dict(engines.COUNTS),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

"""Measure the single-core host-CPU baseline for bench.py's vs_baseline.

The strongest single-core baseline available in this environment: the
SAME pipeline (same pair, same configuration) on one CPU core with the
device engines disabled.  Re-run whenever the shared host path changes
(VERDICT r3 weak #2: the denominator must track the current code) and
copy the number + date + commit into bench.py and BENCH_NOTES.md.

Run:  taskset -c 0 python benchmarks/baseline_host.py
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["PARAMUGSY_DEVICE_DP"] = "0"
# One core end to end: XLA:CPU intra-op threads and the native kernels'
# OpenMP pool both pinned to 1 (taskset bounds the hardware side).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_cpu_multi_thread_eigen=false"
)
os.environ["OMP_NUM_THREADS"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from bench import GENOME_MBP, build_pair  # noqa: E402
from paramugsy_tpu.ops.align_pair import AlignConfig, align_pair  # noqa: E402


def main() -> None:
    n = int(GENOME_MBP * 1e6)
    rng = np.random.default_rng(12345)
    ref, query = build_pair(rng, n)
    cfg = AlignConfig()
    cache: dict = {}
    t0 = time.monotonic()
    entries = align_pair(ref, query, "b.r", "b.q", cfg, device_cache=cache)
    print(f"warm-up {time.monotonic() - t0:.1f}s ({len(entries)} entries)")
    best = float("inf")
    for rep in range(3):
        t = time.perf_counter()
        entries = align_pair(ref, query, "b.r", "b.q", cfg, device_cache=cache)
        dt = time.perf_counter() - t
        best = min(best, dt)
        print(f"rep {rep}: {dt:.3f}s")
    aligned = sum(e.alignment_length() for e in entries)
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    print(
        f"BASELINE host 1-core: {aligned / 1e6 / best:.2f} Mbp/s "
        f"(aligned {aligned} bp, best {best:.3f}s, commit {commit}, "
        f"{time.strftime('%Y-%m-%d')})"
    )


if __name__ == "__main__":
    main()

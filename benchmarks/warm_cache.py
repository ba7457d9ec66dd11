"""Pre-compile every jit shape bench.py touches into the persistent cache.

Run once per machine (and after any edit to jitted code):

    timeout 3000 python benchmarks/warm_cache.py

First run pays the real XLA/axon compiles (minutes per large shape); all
later processes — bench.py, the CLI — load them in seconds.  bench.py
itself never compiles a shape this script didn't: the repeat-rich pair
runs with a pinned seed bucket (no retry ladder), and the quality
mini-run shares the headline bucket.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

t0 = time.monotonic()


def mark(label):
    print(f"[{time.monotonic() - t0:7.1f}s] {label}", flush=True)


def main():
    from paramugsy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench
    from paramugsy_tpu.ops.align_pair import AlignConfig, align_pair

    n = int(bench.GENOME_MBP * 1e6)
    rng = np.random.default_rng(12345)
    cache: dict = {}
    cfg = AlignConfig()

    ref, query = bench.build_pair(rng, n)
    entries = align_pair(ref, query, "w.r", "w.q", cfg, device_cache=cache)
    mark(f"headline seeding shape ({len(entries)} entries)")

    rr_ref, rr_query = bench.build_repeat_rich_pair(rng, n)
    rr = align_pair(rr_ref, rr_query, "w.rr", "w.rq", cfg, device_cache=cache)
    mark(f"repeat-rich (shares headline shapes; {len(rr)} entries)")

    import jax

    if jax.default_backend() == "tpu":
        g = bench.bench_device_dp(rng, reps=1)
        mark(f"device wavefront DP shape ({g:.2f} Gcells/s)")

    q = bench.bench_quality(rng, n)
    mark(f"quality mini-run shapes {q}")
    mark("warm_cache done")


if __name__ == "__main__":
    main()

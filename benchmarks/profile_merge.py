"""cProfile the host merge phase of the 4-genome quality mini-run.

The pairwise part runs wherever JAX_PLATFORMS points (CPU is fine — we
only care about the host merge Python here):
    JAX_PLATFORMS=cpu timeout 900 python benchmarks/profile_merge.py [n_mbp]
"""
import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from paramugsy_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import build_family
from paramugsy_tpu.pipeline import Aligner, PipelineConfig, finalize_blocks

n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 2_000_000
rng = np.random.default_rng(12345)
genomes = build_family(rng, n)
cfg = PipelineConfig()

# Warm the jit caches so compile time doesn't pollute the profile.
warm = Aligner(genomes[:2], cfg)
warm.run()

aligner = Aligner(genomes, cfg)
t0 = time.perf_counter()
prof = cProfile.Profile()
prof.enable()
blocks = finalize_blocks(aligner.run())
prof.disable()
print(f"total wall: {time.perf_counter() - t0:.2f}s, blocks={len(blocks)}")
st = pstats.Stats(prof)
st.sort_stats("cumulative").print_stats(35)

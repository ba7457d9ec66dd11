"""Measure the sharded pair plane's overhead on the virtual CPU mesh.

VERDICT r4 #5a: quantify what the mesh costs/buys at CPU scale so the
first real multi-chip run has a prediction to check.  Compares, on the
same host and input batch:

  * the plain single-device batched dispatch
    (`ops.seeding.seed_cluster_both_packed_batch`), vs
  * the same compute shard_mapped over an 8-virtual-device `pairs` mesh
    (`parallel.pair_shard.make_sharded_packed_pair_step`).

On one host both run the same FLOPs on the same silicon, so the delta IS
the sharding machinery's overhead (partitioning, per-shard dispatch,
reassembly).  On real multi-chip hardware the sharded form divides the
work n_devices ways instead.

Run:  timeout 900 python benchmarks/bench_shard_overhead.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paramugsy_tpu.ops.seeding import seed_cluster_both_packed_batch
from paramugsy_tpu.parallel.pair_shard import make_sharded_packed_pair_step

B, N = 16, 1 << 19  # 16 pairs x 512 kb
rng = np.random.default_rng(7)
refs = rng.integers(0, 4, size=(B, N)).astype(np.int8)
queries = refs.copy()
m = rng.random(refs.shape) < 0.01
queries[m] = ((queries[m] + 1) % 4).astype(np.int8)
q_lens = np.full(B, N, np.int32)

kw = dict(k=15, max_seeds=4096, min_match=20, band=16, max_gap=90,
          max_clusters=4096, sample_shift=2, m_out=2048, c_out=512)


def timeit(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


refs_j, queries_j, qlens_j = jnp.asarray(refs), jnp.asarray(queries), jnp.asarray(q_lens)
t_plain = timeit(lambda: seed_cluster_both_packed_batch(refs_j, queries_j, qlens_j, **kw))
print(f"plain batched dispatch ({B} pairs x {N>>10} kb): {t_plain*1000:.0f} ms"
      f" = {B/t_plain:.1f} pairs/s", flush=True)

mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("pairs",))
step = make_sharded_packed_pair_step(mesh, **kw)
sh = NamedSharding(mesh, P("pairs"))
refs_s = jax.device_put(refs_j, sh)
queries_s = jax.device_put(queries_j, sh)
qlens_s = jax.device_put(qlens_j, sh)
t_shard = timeit(lambda: step(refs_s, queries_s, qlens_s))
print(f"sharded over 8-device mesh:                    {t_shard*1000:.0f} ms"
      f" = {B/t_shard:.1f} pairs/s", flush=True)
print(f"mesh overhead vs plain on ONE host: {t_shard/t_plain:.2f}x "
      "(real multi-chip divides the work n_devices ways instead)", flush=True)

"""2-process jax.distributed wall vs 1-process on the same input (CPU).

VERDICT r4 #5b: put a number on the distributed harness's end-to-end
cost within this environment's limits (one host, virtual CPU devices —
both configurations run the same FLOPs on the same silicon, so the
2-process run measures pure coordination overhead: jax.distributed
init, cross-process mesh dispatch, the wire-format entry exchange, and
the store-backed merge plane.  On real multi-host hardware the same
machinery divides the pairwise work per host instead).

Run:  timeout 1800 python benchmarks/bench_dist_wall.py
"""
import os
import socket
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
WORKER = "/root/repo/tests/dist_worker.py"
N, COUNT = 200_000, 4


def write_genomes(work):
    rng = np.random.default_rng(42)
    bases = np.array(list("ACGT"))
    anc = rng.integers(0, 4, N)
    for i in range(COUNT):
        g = anc.copy()
        s = rng.random(N) < 0.01
        g[s] = (g[s] + rng.integers(1, 4, int(s.sum()))) % 4
        g = np.delete(g, rng.integers(0, N, 8))
        with open(os.path.join(work, f"g{i}.fa"), "w") as f:
            f.write(f">g{i}.chr\n" + "".join(bases[g]) + "\n")


def run_single(work):
    code = (
        "import os, sys, time;"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "sys.path.insert(0,'/root/repo');"
        "from paramugsy_tpu.parallel.collective import align_fastas_sharded;"
        f"paths=[os.path.join('{work}',f'g{{i}}.fa') for i in range({COUNT})];"
        "t0=time.perf_counter();"
        f"b=align_fastas_sharded(paths, os.path.join('{work}','single.maf'));"
        "print('WALL', time.perf_counter()-t0, len(b))"
    )
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
    )
    assert out.returncode == 0, out.stderr[-2000:]
    inner = [ln for ln in out.stdout.splitlines() if ln.startswith("WALL")][0]
    return float(inner.split()[1]), time.perf_counter() - t0


def run_two(work):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port), "e2e", work],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    wall = time.perf_counter() - t0
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    return wall


def main():
    with tempfile.TemporaryDirectory() as work:
        write_genomes(work)
        inner1, outer1 = run_single(work)
        print(
            f"1-process align_fastas_sharded ({COUNT} x {N//1000} kb): "
            f"{inner1:.1f} s inner ({outer1:.1f} s incl. process start)",
            flush=True,
        )
        wall2 = run_two(work)
        print(
            f"2-process jax.distributed, same input: {wall2:.1f} s "
            f"(incl. both process starts + coordinator)",
            flush=True,
        )
        maf0 = open(os.path.join(work, "out0.maf")).read()
        single = open(os.path.join(work, "single.maf")).read()
        print("2-proc output == 1-proc output:", maf0 == single, flush=True)


if __name__ == "__main__":
    main()

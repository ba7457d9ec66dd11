"""Real 2-process jax.distributed execution of the collective plane.

VERDICT r3 #4: the `n_proc > 1` branches of parallel/collective.py were
only ever simulated (threads / virtual devices).  These tests spawn two
genuine jax.distributed CPU processes (localhost coordinator, 4 devices
each -> one 8-device world) and run `align_fastas_sharded` end-to-end —
sharded cross-process pair dispatch, `_exchange_blobs`, owner
publication, `wait_node` — asserting byte-identical MAFs from both
processes; plus the documented fail-fast contract when a peer dies
before a collective phase (VERDICT r3 #5).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _write_genomes(work: str, n: int = 12000, count: int = 4) -> None:
    rng = np.random.default_rng(42)
    bases = np.array(list("ACGT"))
    anc = rng.integers(0, 4, n)
    for i in range(count):
        g = anc.copy()
        s = rng.random(n) < 0.01
        g[s] = (g[s] + rng.integers(1, 4, int(s.sum()))) % 4
        g = np.delete(g, rng.integers(0, n, 4))
        with open(os.path.join(work, f"g{i}.fa"), "w") as f:
            f.write(f">g{i}.chr\n" + "".join(bases[g]) + "\n")


def _spawn(idx: int, port: int, mode: str, work: str, env: dict):
    return subprocess.Popen(
        [sys.executable, WORKER, str(idx), str(port), mode, work],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(WORKER))),
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _clean_env(**extra) -> dict:
    env = dict(os.environ)
    # The workers configure their own platform/devices.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(extra)
    return env


def test_two_process_sharded_alignment_identical_mafs(tmp_path):
    work = str(tmp_path)
    _write_genomes(work)
    port = _free_port()
    env = _clean_env()
    procs = [_spawn(i, port, "e2e", work, env) for i in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        assert "BLOCKS" in out
    maf0 = open(os.path.join(work, "out0.maf")).read()
    maf1 = open(os.path.join(work, "out1.maf")).read()
    assert maf0 == maf1 and maf0.count("\na ") >= 3
    # The distributed merge phase really used the store: pair and node
    # artifacts were published by their owners.
    store = os.path.join(work, "store")
    assert os.listdir(os.path.join(store, "pairs"))
    assert os.listdir(os.path.join(store, "nodes"))
    # Quality oracle on the merged result.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(WORKER))))
    from paramugsy_tpu.formats.maf import read_maf
    from paramugsy_tpu.tools.mafvalidate import find_faults

    blocks = list(read_maf(os.path.join(work, "out0.maf")))
    assert not find_faults(blocks)


def test_dead_peer_fails_fast_with_contract_error(tmp_path):
    work = str(tmp_path)
    _write_genomes(work, n=4000)
    port = _free_port()
    env = _clean_env(PARAMUGSY_BARRIER_TIMEOUT="15")
    p0 = _spawn(0, port, "die", work, env)
    p1 = _spawn(1, port, "die", work, env)
    out1 = p1.communicate(timeout=120)[0]
    assert p1.returncode == 3, out1[-2000:]
    out0 = p0.communicate(timeout=240)[0]
    # Fail-fast fires through whichever detector wins the race: the
    # phase barrier (DeadHostError, exit 9) when the survivor reaches it
    # first, or the JAX coordination service's heartbeat watchdog (a
    # C++-level fatal abort naming the dead task) when it fires during
    # the survivor's compile phase.  Both are prompt, explicit deaths —
    # never a hang past the documented bounds.
    assert p0.returncode != 0, "survivor must not complete"
    if p0.returncode == 9:
        assert "DEADHOST" in out0 and "fail-fast" in out0
    else:
        assert "task:1" in out0 and (
            "unhealthy" in out0 or "crashed" in out0
        ), f"unexpected survivor failure:\n{out0[-3000:]}"

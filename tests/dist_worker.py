"""Subprocess worker for the REAL 2-process jax.distributed CPU tests.

Invoked by tests/test_dist.py:  python dist_worker.py IDX PORT MODE WORKDIR

Each worker is a genuine jax.distributed process (CPU platform, 4 local
devices -> 8 global), exercising the n_proc > 1 branches of
parallel/collective.py that single-process tests cannot reach: the
sharded pair dispatch over a cross-process mesh, `_exchange_blobs`'s
versioned-wire-format allgather (parallel/wire.py), owner publication
and `wait_node` in the store-backed merge phase.  This is the executable analog of the
reference's fake-cluster seam (lib/base/queue_server_test.ml:6-33) —
except nothing is faked.

Modes:
  e2e  both processes run `align_fastas_sharded` end-to-end and write
       out<idx>.maf (the test asserts byte equality).
  die  process 1 exits before the collective phase; process 0 must fail
       fast with DeadHostError (exit 9) per the documented contract.
"""
import os
import sys


def main() -> None:
    idx, port, mode, work = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("PARAMUGSY_BARRIER_TIMEOUT", "30")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=idx
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if mode == "die" and idx == 1:
        # A dead host does not run atexit hooks: hard-exit so the
        # distributed shutdown barrier cannot mask the death.
        os._exit(3)

    from paramugsy_tpu.parallel.collective import (
        DeadHostError,
        align_fastas_sharded,
    )

    paths = [os.path.join(work, f"g{i}.fa") for i in range(4)]
    out = os.path.join(work, f"out{idx}.maf")
    try:
        blocks = align_fastas_sharded(
            paths, out, tmp_dir=os.path.join(work, "store")
        )
    except DeadHostError as e:
        print(f"DEADHOST: {e}", flush=True)
        sys.exit(9)
    print(f"BLOCKS {len(blocks)}", flush=True)


if __name__ == "__main__":
    main()

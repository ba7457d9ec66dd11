"""Multi-host runtime initialization (the SGE-backend replacement).

The reference scales across machines via qsub + rsync-over-ssh staging
(lib/base/sge_interface.ml, scripts/sync_to.sh).  The TPU-native
equivalent: ``jax.distributed`` joins all hosts of a pod slice into one
logical device world; genome-pair batches shard over the global ``pairs``
mesh axis (paramugsy_tpu.parallel); data moves over ICI/DCN collectives,
not ssh.

Single-process (one chip, or CPU) runs skip initialization entirely — the
same seam the reference's ``local`` backend provides.
"""
from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class DistContext:
    initialized: bool
    process_index: int
    process_count: int
    n_devices: int

    @property
    def is_primary(self) -> bool:
        return self.process_index == 0


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> DistContext:
    """Join the multi-host world if configured; no-op for single host.

    Configuration can come from arguments or the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS etc.).  Returns the process topology.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        initialized = True
    else:
        initialized = False
    return DistContext(
        initialized=initialized,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        n_devices=len(jax.devices()),
    )


def local_pair_slice(n_pairs: int, ctx: DistContext) -> slice:
    """The contiguous slice of a global pair list this process owns."""
    per = (n_pairs + ctx.process_count - 1) // ctx.process_count
    start = ctx.process_index * per
    return slice(start, min(start + per, n_pairs))

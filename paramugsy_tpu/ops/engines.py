"""DP engine selection and usage accounting.

Round 1 swallowed fallback exceptions silently (`except Exception: pass`
around the native/Pallas paths), so a broken fast path degraded to the
slow one with no trace.  This module centralizes the policy:

* `record()` counts which engine actually ran (tests pin the expectation
  that the native/device engines run when available);
* engine choices are logged once per process;
* genuine load failures of an *existing* native library raise instead of
  silently degrading (`ops.native.load`).

Env knobs: PARAMUGSY_DEVICE_DP=1 forces the Pallas wavefront engine for
long segments, =0 forces the host engines; unset auto-selects by backend
(device DP on TPU, host otherwise).
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger("paramugsy.engines")

# engine name -> number of segment batches it aligned this process
COUNTS: dict[str, int] = {}
_logged: set[str] = set()


def record(engine: str, n: int = 1) -> None:
    COUNTS[engine] = COUNTS.get(engine, 0) + n
    if engine not in _logged:
        _logged.add(engine)
        log.info("DP engine in use: %s", engine)


def reset_counts() -> None:
    COUNTS.clear()


def record_seedcluster(n: int = 1) -> None:
    """Count fused seeding/clustering dispatches by backend — the pair
    pipeline's heavy compute, so dp_engines shows where FLOPs went
    rather than only the residual segment DPs."""
    try:
        import jax

        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    record(f"seedcluster-{backend}", n)


def device_dp_enabled() -> bool:
    """Should long-segment extension run on the device?"""
    v = os.environ.get("PARAMUGSY_DEVICE_DP")
    if v == "1":
        return True
    if v == "0":
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:  # jax unavailable/uninitializable: host path
        return False

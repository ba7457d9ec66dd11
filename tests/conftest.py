"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding logic is
exercised on a virtual CPU mesh (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).

Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we force
the platform through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

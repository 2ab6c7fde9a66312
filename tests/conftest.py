"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver's bench runs use the real TPU chip; tests validate numerics and
sharding on host CPU with XLA's virtual-device emulation (SURVEY.md §4 test
strategy: multi-process-on-one-host distributed tests).

Note: this environment's sitecustomize registers the axon TPU backend and
imports jax at interpreter startup, so plain env vars are too late — we
override via jax.config before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

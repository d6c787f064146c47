"""Root conftest: force the test run onto a virtual 8-device CPU mesh.

The driver's bench runs on the real TPU chip; tests deliberately use the CPU
backend so sharding paths can be exercised without N real chips
(SURVEY.md §4).  In this image a ``sitecustomize`` imports jax and registers
the TPU (axon) backend at interpreter startup, so plain env vars set here
are too late for platform *discovery* — but backend *initialization* is
lazy, so overriding ``jax_platforms`` before any backend is touched still
lands the whole run on CPU.  XLA_FLAGS is also read lazily at CPU client
init, which is where the 8 virtual devices come from.
"""

import os

os.environ.setdefault("RCTPU_TESTS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (imported by sitecustomize already; cheap)

jax.config.update("jax_platforms", "cpu")

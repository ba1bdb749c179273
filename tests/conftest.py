"""Test config: force an 8-device virtual CPU platform so collectives,
sharding, and pod-style behavior are exercised without TPU hardware
(SURVEY.md §4 — JAX's standard fake-multi-device mechanism).

Note: in this environment ``jax`` is pre-imported at interpreter startup
with a hardware platform pinned via ``JAX_PLATFORMS=axon``, so env-var
assignment alone is too late — we go through ``jax.config`` (and reset the
backend if something already initialized it)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    # a backend was already initialized: reset and reconfigure
    import jax.extend as jex

    jex.backend.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

assert jax.device_count() == 8, (
    f"tests require the 8-device virtual CPU platform, got {jax.devices()}"
)

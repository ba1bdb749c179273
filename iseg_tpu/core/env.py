"""One-call environment setup.

Parity with the reference's ``core_env.py:16`` ``common_env_setup`` (seeds,
determinism flags, mixed precision, strategy creation) and
``core_env.py:90`` ``common_env_clean``. TPU-native: "strategy" becomes a
``jax.sharding.Mesh``; mixed precision becomes a dtype policy threaded into
modules (params fp32, compute bf16 — the reference's ``mixed_bfloat16``
Keras policy, ``utils/common.py:32-64``).

Determinism: JAX is deterministic by construction given fixed seeds and
``--xla_tpu_enable_latency_hiding_scheduler`` defaults; the reference's
``TF_DETERMINISTIC_OPS`` dance (``core_env.py:40-48``) has no analogue
needed. Seeded ``jax.random`` keys are threaded through augments and
drop-path explicitly.
"""

from __future__ import annotations

import dataclasses
import os
import random as _py_random

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.parallel.mesh import MeshEnv, create_mesh


@dataclasses.dataclass
class EnvConfig:
    """Knob surface of reference ``common_env_setup`` (``core_env.py:16-29``)."""

    random_seed: int = 0
    mixed_precision: bool = True
    model_parallelism: int = 1
    # cap the mesh to the first N local devices (eval/predict drivers use
    # this to keep the data axis a divisor of small eval batches; the
    # reference's equivalent is strategy selection, core_env.py:63-81)
    num_devices: int | None = None
    # persistent XLA compilation cache (first ResNet-50-sized compile can
    # take minutes on TPU; subsequent runs hit the cache)
    compilation_cache_dir: str | None = "~/.cache/iseg_tpu_xla"
    # multi-host (TPU pod): call jax.distributed.initialize first
    initialize_distributed: bool = False
    coordinator_address: str | None = None
    num_processes: int | None = None
    process_id: int | None = None


def common_env_setup(config: EnvConfig | None = None, **kwargs) -> MeshEnv:
    """Set seeds + precision policy and build the device mesh.

    Returns a :class:`MeshEnv`; training/eval/predict run with its mesh,
    mirroring the reference's "everything inside ``strategy.scope()``"
    contract (``core_env.py:63-81``).
    """
    if config is None:
        config = EnvConfig(**kwargs)

    if config.compilation_cache_dir:
        cache_dir = os.path.expanduser(config.compilation_cache_dir)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass  # older jax without the knob

    if config.initialize_distributed:
        jax.distributed.initialize(
            coordinator_address=config.coordinator_address,
            num_processes=config.num_processes,
            process_id=config.process_id,
        )

    set_random_seed(config.random_seed)

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if config.mixed_precision and on_tpu:
        compute_dtype = jnp.bfloat16
    elif config.mixed_precision:
        # CPU/GPU: bf16 works everywhere XLA runs; keep bf16 (not fp16) for
        # range-safety, matching the reference's TPU-preferred policy.
        compute_dtype = jnp.bfloat16
    else:
        compute_dtype = jnp.float32

    devices = None
    if config.num_devices is not None:
        devices = jax.devices()[: config.num_devices]
    mesh = create_mesh(devices=devices,
                       model_parallelism=config.model_parallelism)
    return MeshEnv(
        mesh=mesh,
        seed=config.random_seed,
        compute_dtype=compute_dtype,
        param_dtype=jnp.float32,
    )


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs (reference ``utils/common.py:22-29``). Device-side
    randomness is explicit via ``jax.random`` keys derived from this seed."""
    _py_random.seed(seed)
    np.random.seed(seed)
    # NOTE: CPython fixes hash randomization only when PYTHONHASHSEED is
    # set BEFORE interpreter start — setting it here cannot affect this
    # process (export it in the launcher for hash-order determinism);
    # still exported so subprocesses inherit it
    os.environ["PYTHONHASHSEED"] = str(seed)


def common_env_clean(env: MeshEnv | None = None) -> None:
    """Reference ``core_env.py:90`` shuts the TPU system down; in JAX the
    runtime owns the TPU for the process lifetime, so this only clears
    compilation caches (useful between experiments in one process)."""
    jax.clear_caches()

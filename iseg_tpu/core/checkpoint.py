"""Checkpoint management (orbax) + pretrained-weight ingest.

Parity with the reference's ``modelhelper.py:59`` ``ModelHelper`` (save /
restore with ``max_to_keep`` GC :136-151,181-225) and the name-based H5
backbone-weight loader (``saver/h5_saver.py:38``) — the H5 ingest lives in
``iseg_tpu.core.h5_ingest``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class ModelHelper:
    """Thin orbax CheckpointManager wrapper with the reference's knob
    surface (``modelhelper.py:22-56`` ``model_common_setup``)."""

    def __init__(self, checkpoint_dir: str, max_to_keep: int = 3,
                 async_save: bool = False):
        """``async_save=True`` makes ``save()`` return as soon as the
        device arrays are snapshotted (orbax commits to disk on a
        background thread), overlapping checkpoint I/O with the next
        epoch's compute — the TPU-native answer to multi-GB pod
        checkpoints stalling the step loop. ``wait()`` (called
        automatically before the next save, at restore, and by
        ``CoreTrain`` at train end) blocks until the last save is
        durable."""
        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        self.async_save = async_save
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self._manager = ocp.CheckpointManager(self.checkpoint_dir, options=options)

    def save(self, step: int, state: Any) -> None:
        """Save train state (params/batch_stats/opt_state/step)."""
        self._manager.save(step, args=ocp.args.StandardSave(_arrays_only(state)))
        if not self.async_save:
            self._manager.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save is committed."""
        self._manager.wait_until_finished()

    def restore_latest(self, template_state: Any) -> Optional[Any]:
        """Restore the newest checkpoint into the template's structure,
        or None when no checkpoint exists (reference ``modelhelper.py:125``)."""
        self._manager.wait_until_finished()  # flush any in-flight save
        step = self._manager.latest_step()
        if step is None:
            return None
        template = _arrays_only(template_state)
        try:
            restored = self._manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        except Exception as first_err:
            # EMA on/off transitions change the checkpoint tree in BOTH
            # directions; retry with the adjusted template and, if the
            # retry also fails, surface the ORIGINAL error (a corrupt
            # checkpoint must not masquerade as an EMA-shape problem)
            try:
                if "ema_params" in template:
                    # enabling EMA mid-run: disk predates EMA — restore
                    # everything else and seed the EMA from the restored
                    # params (create_train_state's step-0 initialization)
                    slim = {k: v for k, v in template.items()
                            if k != "ema_params"}
                    restored = dict(self._manager.restore(
                        step, args=ocp.args.StandardRestore(slim)))
                    restored["ema_params"] = jax.tree_util.tree_map(
                        lambda x: x, restored["params"])
                else:
                    # disabling EMA mid-run: disk carries an ema_params
                    # item the template lacks — restore it into a
                    # params-shaped dummy and drop it
                    fat = dict(template)
                    fat["ema_params"] = jax.tree_util.tree_map(
                        lambda x: x, template["params"])
                    restored = dict(self._manager.restore(
                        step, args=ocp.args.StandardRestore(fat)))
                    restored.pop("ema_params")
            except Exception:
                raise first_err
        # return UNCOMMITTED arrays: orbax pins restored buffers to specific
        # devices, which conflicts with mesh-sharded batches at the next jit
        # dispatch; a host round-trip at restore time keeps them movable
        import jax.numpy as jnp
        import numpy as np

        restored = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), restored
        )
        return template_state.replace(**restored)

    def restore_latest_variables(self, variables_template) -> Optional[dict]:
        """Restore ONLY ``params``/``batch_stats`` (plus ``ema_params``
        when on disk) for eval/predict drivers. The optimizer state's tree
        structure depends on the training chain (schedule, momentum,
        grad-accum wrapping), which an eval process neither has nor needs
        — a full-tree ``restore_latest`` would fail on the mismatch.
        Returns an eval ``variables`` dict (EMA params preferred when
        present), or None when no checkpoint exists."""
        import jax.numpy as jnp
        import numpy as np

        self._manager.wait_until_finished()
        step = self._manager.latest_step()
        if step is None:
            return None
        template = {
            k: variables_template[k]
            for k in ("params", "batch_stats")
            if k in variables_template and variables_template[k] is not None
        }
        restored = dict(self._manager.restore(
            step, args=ocp.args.PyTreeRestore(template,
                                              partial_restore=True)))
        try:  # EMA weights, when the trainer tracked them
            ema = self._manager.restore(
                step, args=ocp.args.PyTreeRestore(
                    {"ema_params": template["params"]},
                    partial_restore=True))
            restored["params"] = ema["ema_params"]
        except Exception:
            pass
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), restored)

    def all_steps(self):
        return self._manager.all_steps()


def _arrays_only(state) -> dict:
    """Strip non-pytree fields (apply_fn/tx) for serialization.

    ``ema_params`` rides along only when EMA is enabled on the state —
    save and restore templates stay symmetric: checkpoints written
    without EMA restore into non-EMA states directly, and restoring one
    into an EMA-enabled state seeds the EMA from the restored params
    (see ``restore_latest``)."""
    out = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    if getattr(state, "ema_params", None) is not None:
        out["ema_params"] = state.ema_params
    return out

"""Crash-resume audit: SIGKILL a training process mid-run (async
checkpointing enabled) and prove the restarted process resumes from the
last *durably committed* checkpoint and completes.

This is the failure-recovery behavior the reference gets from Keras'
ckpt_saver callback + ``modelhelper.py:113`` restore_checkpoint, audited
here under the harshest condition: the kill can land while orbax's
background thread is mid-commit, so restore must see only atomic,
committed steps (orbax commits via rename; torn saves are invisible).

Subprocess-based on purpose — an in-process test cannot simulate losing
the Python heap. Slow tier (two child interpreters, XLA:CPU compiles).
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

pytestmark = pytest.mark.slow

_CHILD = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update(
        "jax_compilation_cache_dir",
        __import__("os").path.expanduser("~/.cache/iseg_tpu_xla_tests"))
    import numpy as np
    import jax.numpy as jnp

    import iseg_tpu.nn.norm as norm
    norm.set_bn_momentum(0.9)
    from iseg_tpu.backbones import get_backbone
    from iseg_tpu.core.checkpoint import ModelHelper
    from iseg_tpu.core.env import EnvConfig, common_env_setup
    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import CoreTrain
    from iseg_tpu.nn import heads
    from iseg_tpu.core.model import SegManaged

    ckpt_dir, mode = sys.argv[1], sys.argv[2]
    CROP, BATCH, NC, SPE, EPOCHS = 32, 8, 3, 5, 5

    env = common_env_setup(EnvConfig(random_seed=0))
    model = SegManaged(
        num_class=NC,
        backbone=get_backbone("mobilenetv2", output_stride=16,
                              width_multiplier=0.35,
                              include_top_conv=False),
        head=heads.SimpleDecoder(),
    )
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, CROP, CROP, 3)))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.1,
                          train_steps=SPE * EPOCHS, warmup_steps=2)

    def ds(epoch):
        rng = np.random.RandomState(epoch)
        for _ in range(SPE):
            yield {
                "image": rng.rand(BATCH, CROP, CROP, 3).astype("float32"),
                "label": rng.randint(0, NC, (BATCH, CROP, CROP)),
            }

    trainer = CoreTrain(
        env, model, tx, input_shape=(1, CROP, CROP, 3),
        checkpoint_manager=ModelHelper(ckpt_dir, async_save=True),
        log_every=100,
    )
    trainer.restore()
    start_step = int(trainer.state.step)
    print(f"START step={start_step}", flush=True)
    if mode == "resume":
        # a committed checkpoint exists at an epoch boundary >= epoch 1
        assert start_step >= SPE and start_step % SPE == 0, start_step
    trainer.train(ds, epochs=EPOCHS, steps_per_epoch=SPE, initial_epoch=-1)
    print(f"FINAL step={int(trainer.state.step)}", flush=True)
    """
)


def test_sigkill_mid_training_then_resume(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    ckpt = str(tmp_path / "ckpt")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo_root)

    # phase 1: train, SIGKILL once >= 2 epoch saves have had an epoch of
    # runway to commit (epoch-2-done means save(step=5) and save(step=10)
    # were issued 1-2 epochs ago; save(step=15) is being issued right as
    # the kill lands — the racy one restore must tolerate)
    p = subprocess.Popen(
        [sys.executable, str(script), ckpt, "fresh"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    from subproc_util import read_lines_with_deadline

    state = {"killed": False}

    def _on_line(line):
        if "epoch 2 done" in line:
            os.kill(p.pid, signal.SIGKILL)  # the child pid, not a pattern
            state["killed"] = True
            return "stop"

    lines, timed_out = read_lines_with_deadline(p, 600, _on_line)
    if timed_out:
        pytest.fail("phase-1 child produced no epoch logs in time:\n"
                    + "".join(lines[-30:]))
    p.wait(timeout=60)
    assert state["killed"], "never saw an epoch complete before the deadline"

    # phase 2: a fresh process must restore a committed epoch boundary
    # (asserted inside the child) and run to completion
    out = subprocess.run(
        [sys.executable, str(script), ckpt, "resume"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        timeout=600,
    )
    assert out.returncode == 0, out.stdout[-3000:]
    assert "FINAL step=25" in out.stdout, out.stdout[-3000:]

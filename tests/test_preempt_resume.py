"""Graceful-preemption audit: SIGTERM a training process mid-epoch and
prove it (a) checkpoints durably at the next step boundary and exits
cleanly, and (b) a restarted process resumes from that EXACT step —
fast-forwarding the epoch-seeded data stream so no batch is applied
twice — and finishes with exactly ``epochs * steps_per_epoch`` steps.

Beyond-reference production behavior (the reference's Keras loop saves
per-epoch only, ``core_train.py:121-152`` + ``modelhelper.py:113``, so a
pod preemption loses up to a full epoch). Subprocess-based: signal
delivery and process teardown can't be simulated in-process.
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
    CROP, BATCH, NC, SPE, EPOCHS = 32, 8, 3, 6, 4

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
        log_every=1,
    )
    trainer.restore()
    start_step = int(trainer.state.step)
    print(f"START step={start_step}", flush=True)
    if mode == "resume":
        # the preempt save landed mid-epoch: not a multiple of SPE
        assert start_step % SPE != 0, start_step
    trainer.train(ds, epochs=EPOCHS, steps_per_epoch=SPE, initial_epoch=-1)
    print(f"FINAL step={int(trainer.state.step)}", flush=True)
    """
)


def test_sigterm_saves_mid_epoch_and_resume_is_exact_step(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    ckpt = str(tmp_path / "ckpt")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo_root)

    # phase 1: SIGTERM once epoch 1 is mid-flight (log_every=1 prints every
    # step; "epoch 1 step 2" is mid-epoch — SPE=6)
    p = subprocess.Popen(
        [sys.executable, str(script), ckpt, "fresh"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo_root,
    )
    from subproc_util import read_lines_with_deadline

    state = {"signalled": False}

    def _on_line(line):
        if not state["signalled"] and "epoch 1 step 2" in line:
            p.send_signal(signal.SIGTERM)  # the child pid, not a pattern
            state["signalled"] = True

    lines, timed_out = read_lines_with_deadline(p, 600, _on_line)
    if timed_out:
        pytest.fail("phase-1 child produced no step logs in time:\n"
                    + "".join(lines[-30:]))
    rc = p.wait(timeout=120)
    out = "".join(lines)
    assert state["signalled"], "never saw a mid-epoch step log:\n" + out[-3000:]
    assert rc == 0, f"preempted child should exit cleanly, rc={rc}:\n" + out[-3000:]
    assert "preempted: checkpoint durable at step=" in out, out[-3000:]
    saved_step = int(out.split("preempted: checkpoint durable at step=")[1]
                     .split(";")[0])
    assert saved_step % 6 != 0, f"expected a mid-epoch save, got {saved_step}"

    # phase 2: a fresh process restores the exact preempt step (asserted in
    # the child), fast-forwards the partial epoch, and finishes with
    # exactly EPOCHS*SPE steps — proof no batch ran twice
    out2 = subprocess.run(
        [sys.executable, str(script), ckpt, "resume"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo_root, timeout=600,
    )
    assert out2.returncode == 0, out2.stdout[-3000:]
    assert f"START step={saved_step}" in out2.stdout, out2.stdout[-3000:]
    assert "FINAL step=24" in out2.stdout, out2.stdout[-3000:]

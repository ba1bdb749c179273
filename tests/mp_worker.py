"""Worker for the REAL 2-process tests: one OS process = one JAX process
with 4 local CPU devices, joined into a global 8-device mesh via
``jax.distributed.initialize`` (Gloo collectives over localhost — the CPU
stand-in for a multi-host TPU pod's ICI/DCN fabric).

Usage: python mp_worker.py <process_id> <num_processes> <port> <ckpt_dir>

Exercises, end to end across processes:
  * global mesh construction + replicated state placement
  * per-process loader partition -> ``shard_batch``'s
    ``make_array_from_process_local_data`` global-batch assembly
  * the jitted DP train step (GSPMD cross-process all-reduces: grads,
    sync-BN moments, the all_mean loss)
  * orbax save with BOTH processes participating + restore + 1 more step
  * the resident dataset's multi-process upload partition
    (``data/resident.py``: per-host contiguous slice -> one global
    sample-sharded resident array)

Prints a machine-checkable protocol on stdout; ``test_multiprocess.py``
asserts rank agreement and bit-parity with the single-process run.
"""

import os
import sys

pid, nproc, port, ckpt_dir = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8 // nproc)
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

import mp_common as C  # noqa: E402
from iseg_tpu.core.checkpoint import ModelHelper  # noqa: E402
from iseg_tpu.parallel.mesh import create_mesh  # noqa: E402


def out(*parts):
    print(" ".join(str(p) for p in parts), flush=True)


assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
out("MPDEVS", pid, jax.device_count(), jax.local_device_count())

mesh = create_mesh()
model = C.make_model()
state = C.replicate_state(mesh, C.build_state(model))

losses, state = C.run_steps(mesh, model, state)
for i, v in enumerate(losses):
    out(C.LOSS_FMT, pid, i, f"{v:.9f}")

# --- orbax save/restore with both processes participating ---------------
helper = ModelHelper(ckpt_dir, max_to_keep=2)
helper.save(C.N_STEPS, state)
helper.wait()
restored = helper.restore_latest(state)
ok = 1
for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                jax.tree_util.tree_leaves(state.params)):
    if not np.allclose(np.asarray(a), np.asarray(b)):
        ok = 0
out("MPRESTORE", pid, ok)

# one more step from the RESTORED state (restored arrays are host-round-
# tripped by ModelHelper; re-pin them to the global mesh)
restored = C.replicate_state(mesh, restored)
more, _ = C.run_steps(mesh, model, restored, n_steps=1)
out("MPRESUME", pid, f"{more[0]:.9f}")

# --- resident dataset: per-process upload partition over the global mesh
from iseg_tpu.data.resident import DeviceResidentDataset  # noqa: E402

images, labels = C.make_data()
res = DeviceResidentDataset((images, labels), mesh=mesh)
out("MPRESIDENT_N", pid, res.num_samples)
# global gather must see every process's rows: checksum a fixed batch
batch = next(res.batches(C.GLOBAL_BATCH, epoch=0, seed=0, shuffle=True))
img_sum = float(jax.device_get(batch["image"].astype("float64").sum()))
out("MPRESIDENT_SUM", pid, f"{img_sum:.6f}")

out("MPDONE", pid)

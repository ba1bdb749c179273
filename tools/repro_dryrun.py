"""Dry-run of the REPRO.md runbook against synthetic stand-ins (CI-safe,
CPU mesh, no egress): every command a user will run on an egress-enabled
TPU host executes here end to end at toy geometry.

1. Synthesize a published-format backbone .h5: build the REFERENCE'S
   resnet50 with its own code, save its (randomized) weights under its
   real weight names — byte-layout identical to the release files.
2. Synthesize a VOC-layout dataset (images/ + labels/ index PNGs).
3. `examples/train_seg.py --pretrained <h5> --data_dir <dir>` (subprocess
   — the exact CLI from REPRO.md §2, incl. the unmatched-params guard).
4. `examples/eval_seg.py --ckpt_dir ...` multi-scale+flip eval -> mIoU.
5. The miniature reference-oracle driver: the reference's own SegManaged
   + create_compiled_model + compiled fit step on the same data.
Prints REPRO_DRYRUN_PASS on success.
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SIZE = 64
NC = 5
N_IMAGES = 16


def make_backbone_h5(path):
    import h5py
    import numpy as np

    import ref_compat

    model = ref_compat.build_reference_backbone("resnet50", SIZE,
                                                output_stride=32)
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        for w in model.weights:
            name = w.path if hasattr(w, "path") else w.name
            a = rng.randn(*w.shape).astype(np.float32) * 0.05
            if "moving_variance" in name:
                a = np.abs(a) + 0.5
            f.create_dataset(name, data=a)
    return path


def make_voc_layout(root):
    import numpy as np
    from PIL import Image

    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "labels"))
    rng = np.random.RandomState(0)
    for i in range(N_IMAGES):
        img = np.full((SIZE + 8, SIZE + 8, 3), 127, np.uint8)
        lab = np.zeros(img.shape[:2], np.uint8)
        for k in range(1, NC):
            y, x = rng.randint(0, SIZE, 2)
            s = rng.randint(8, 24)
            img[y : y + s, x : x + s] = 40 + (215 * k) // NC
            lab[y : y + s, x : x + s] = k
        lab[:2] = 255  # ignore band
        Image.fromarray(img).save(
            os.path.join(root, "images", f"im{i:03d}.png"))
        Image.fromarray(lab).save(
            os.path.join(root, "labels", f"im{i:03d}.png"))
    return root


def run_cli(args, cwd=REPO, timeout=1200):
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.run([sys.executable] + args, cwd=cwd, timeout=timeout,
                       capture_output=True, text=True, env=env)
    if p.returncode != 0:
        print(p.stdout[-4000:])
        print(p.stderr[-4000:])
        raise SystemExit(f"command failed: {' '.join(args)}")
    return p.stdout


def run_reference_oracle(data_dir):
    """REPRO.md §2's oracle driver in miniature: the reference's own
    SegManaged + create_compiled_model + compiled train step."""
    import numpy as np

    import ref_compat

    ref_compat.install_keras2_shims()
    import keras
    import tensorflow as tf
    from iseg.layers.aspp import AtrousSpatialPyramidPooling
    from iseg.layers.core_model_ext import SegManaged
    from iseg.optimizers.polydecay import WarmUpPolyDecay
    from iseg.utils.model_utils import create_compiled_model

    from iseg_tpu.data.loader import SegDirectoryDataset

    class OracleModel(SegManaged):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.head = AtrousSpatialPyramidPooling(filters=64)

        def compute_head_results(self, head_inputs, training=None):
            return [self.head(head_inputs[-1], training=training)]

        def compute_final_results(self, logits_list):
            # reference keras3 bug workaround (core_model_ext.py falls
            # through with no return on the keras3 branch)
            return [tf.cast(l, tf.float32) for l in logits_list]

    model = OracleModel(backbone_name="resnet50", output_stride=32,
                        num_class=NC, build_input_size=(SIZE, SIZE),
                        use_dict_outputs=True)
    model(tf.zeros((2, SIZE, SIZE, 3)), training=False)
    opt = keras.optimizers.SGD(
        learning_rate=WarmUpPolyDecay(0.01, 100), momentum=0.9)
    create_compiled_model(model, NC, ignore_label=255, batch_size=2,
                          jit_compile=False, optimizer=opt)

    ds = SegDirectoryDataset(os.path.join(data_dir, "images"),
                             os.path.join(data_dir, "labels"))
    losses = []
    for step in range(3):
        imgs, labs = zip(*(ds[(step * 2 + j) % len(ds)] for j in range(2)))
        x = np.stack([im[:SIZE, :SIZE] for im in imgs]) / 127.5 - 1.0
        y = np.stack([lb[:SIZE, :SIZE] for lb in labs])[..., None]
        logs = model.train_on_batch(
            tf.constant(x.astype(np.float32)),
            {"output_1": tf.constant(y.astype(np.int32))},
            return_dict=True)
        losses.append(float(logs["loss"]))
    assert all(np.isfinite(losses)), losses
    print("oracle losses:", [round(v, 4) for v in losses])


def main():
    tmp = tempfile.mkdtemp(prefix="repro_dryrun_")
    h5 = make_backbone_h5(os.path.join(tmp, "resnet50.h5"))
    data = make_voc_layout(os.path.join(tmp, "voc"))
    ckpt = os.path.join(tmp, "ckpt")

    out = run_cli([
        "examples/train_seg.py", "--cpu", "--backbone", "resnet50",
        "--head", "aspp", "--output_stride", "32", "--crop", str(SIZE),
        "--batch", "8", "--epochs", "1", "--steps_per_epoch", "4",
        "--num_class", str(NC), "--lr", "0.02",
        "--pretrained", h5, "--data_dir", data, "--ckpt_dir", ckpt])
    assert "pretrained ingest:" in out, out[-2000:]

    out = run_cli([
        "examples/eval_seg.py", "--cpu", "--data_dir", data,
        "--num_class", str(NC), "--backbone", "resnet50", "--head", "aspp",
        "--output_stride", "32", "--ckpt_dir", ckpt,
        "--scales", "0.75,1.0", "--flip"])
    result = json.loads(out.strip().splitlines()[-1])
    assert 0.0 <= result["miou"] <= 1.0 and result["images"] == N_IMAGES

    run_reference_oracle(data)
    print("REPRO_DRYRUN_PASS")


if __name__ == "__main__":
    main()

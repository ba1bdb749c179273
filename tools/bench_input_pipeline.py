"""Host input-pipeline throughput with REAL PNG decode (VERDICT round-1
weak #1). Writes synthetic 512x512 PNG image/label pairs to /tmp, then
measures img/s through SegDirectoryDataset + StandardAugmentationsPipeline
for the serial path and for increasing thread-pool widths.

Target: host throughput >= 1.5x the chip's step throughput for config #2
geometry (ResNet-50+ASPP 512^2; ~283 img/s/chip in BENCH_r01) so the input
pipeline never gates the chip.

Usage: PYTHONPATH=. python tools/bench_input_pipeline.py [n_images]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from PIL import Image

from iseg_tpu.data.loader import SegDirectoryDataset, batched_dataset
from iseg_tpu.data.pipeline import StandardAugmentationsPipeline


def make_dataset(root: str, n: int, hw: int = 512) -> None:
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        # realistic PNG entropy: smooth gradients + noise (pure noise PNGs
        # decode unrealistically slowly, flat ones unrealistically fast)
        yy, xx = np.mgrid[0:hw, 0:hw]
        img = (
            128
            + 60 * np.sin(xx / (20 + i % 7))[..., None]
            + 40 * np.cos(yy / (15 + i % 5))[..., None]
            + rng.randint(-25, 25, (hw, hw, 3))
        ).clip(0, 255).astype(np.uint8)
        lab = rng.randint(0, 21, (hw // 8, hw // 8)).repeat(8, 0).repeat(8, 1)
        Image.fromarray(img).save(os.path.join(root, "images", f"{i:04d}.png"))
        Image.fromarray(lab.astype(np.uint8)).save(
            os.path.join(root, "labels", f"{i:04d}.png"))


def measure(ds, pipeline, batch_size: int, num_workers: int,
            epochs: int = 1) -> float:
    n = 0
    t0 = time.perf_counter()
    for epoch in range(epochs):
        for batch in batched_dataset(
                ds, batch_size, pipeline=pipeline, shuffle=True, epoch=epoch,
                num_workers=num_workers):
            n += batch["image"].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    with tempfile.TemporaryDirectory() as root:
        print(f"writing {n_images} 512x512 PNG pairs...", flush=True)
        make_dataset(root, n_images)
        ds = SegDirectoryDataset(os.path.join(root, "images"),
                                 os.path.join(root, "labels"))
        pipeline = StandardAugmentationsPipeline(
            training=True, crop_size=(512, 512), random_brightness=True)

        # warmup (page cache)
        measure(ds, pipeline, 8, 0)

        results = {}
        for workers in (0, 4, 8, 16, 32):
            rate = measure(ds, pipeline, 8, workers)
            results[workers] = rate
            print(f"num_workers={workers:3d}: {rate:8.1f} img/s", flush=True)
        best = max(results.values())
        print(f"best {best:.1f} img/s "
              f"({best / max(results[0], 1e-9):.2f}x serial)")


if __name__ == "__main__":
    main()

"""Benchmark connected-components labeling on TPU (ops/ccl.py).

The reference claims its XLA CCL is "even faster than GPU custom OP
sometimes" (/root/reference/ops/ccl.py:6-7) with no number attached; this
measures ours: random-blob masks at SOD/HCE-relevant sizes, one jitted
call (min-propagation scan), median of 5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def blob_mask(rs, hw, n_blobs=30):
    m = np.zeros((hw, hw), bool)
    yy, xx = np.mgrid[:hw, :hw]
    for _ in range(n_blobs):
        cy, cx = rs.randint(0, hw, 2)
        r = rs.randint(hw // 64 + 1, hw // 12 + 2)
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    return m


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iseg_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from iseg_tpu.ops.ccl import label_components

    rs = np.random.RandomState(0)
    for hw, batch in ((256, 8), (512, 4), (1024, 1)):
        masks = jnp.asarray(
            np.stack([blob_mask(rs, hw) for _ in range(batch)]))
        f = jax.jit(label_components)
        out = np.asarray(f(masks))
        n_comp = len(np.unique(out)) - 1
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(f(masks))
            times.append(time.perf_counter() - t0)
        p50 = sorted(times)[2]
        print(json.dumps({
            "size": f"{batch}x{hw}^2", "p50_ms": round(p50 * 1e3, 1),
            "components_found": int(n_comp),
            "megapixels_per_s": round(batch * hw * hw / p50 / 1e6, 1),
        }))


if __name__ == "__main__":
    main()

"""Dump the ENTRY computation of the slow DCNv3 composition: every
top-level instruction is a materialized buffer — census by (op, shape).

python tools/probe_ii_hlo.py [fast|slow]
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import probe_ii_cost as pc  # noqa: E402  (builds fns, no timing)
import jax


def entry_census(fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    # entry computation: from "ENTRY" to the end of its block
    m = re.search(r"ENTRY [^{]+\{(.*?)\n\}", txt, re.S)
    body = m.group(1)
    rows = []
    for line in body.splitlines():
        mm = re.match(r"\s+%?\S+ = (\w+\[[0-9,]*\])[^ ]* (\S+?)\(", line)
        if mm:
            shape, op = mm.groups()
            rows.append((op, shape))
    cnt = Counter(rows)
    def nbytes(shape):
        dt, dims = shape.split("[")
        dims = dims.rstrip("]")
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * {"f32": 4, "bf16": 2, "s32": 4, "pred": 1, "u32": 4,
                    "f16": 2, "s8": 1}.get(dt, 4)
    total = 0
    for (op, shape), k in cnt.most_common(25):
        b = nbytes(shape) * k
        total += b
        print(f"  {op:18s} {shape:28s} x{k:3d}  {b/1e6:8.1f} MB")
    print(f"  entry materialized total: {total/1e9:.2f} GB "
          f"({len(rows)} instructions)")


which = sys.argv[1] if len(sys.argv) > 1 else "slow"
if which == "slow":
    entry_census(pc.slow_fn, pc.x)
else:
    entry_census(pc.fast_fn, pc.vg_leaf, pc.off_leaf, pc.mod_leaf)

"""Recorded test gate (VERDICT r2 #8): run the fast suite AND the
activation-parity + slow (convergence/big-model) suites, plus the
multichip dryrun, and write one machine-readable artifact.

Usage:  python tools/run_gate.py [--out GATE.json] [--sections fast,parity,...]

The parity suite drives the reference's own TF code as the oracle, so it
needs TensorFlow importable (it is, in this image). Sections run as
subprocesses so each gets a clean backend config.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SECTIONS = {
    # name: (argv, timeout_s)
    # Tiers (VERDICT r3 #7): ``fast`` is the sub-5-minute inner loop
    # (single-jit / pure-numpy tests); ``mesh`` is the 8-virtual-device
    # suites (collectives, GSPMD, pod data, multi-process); ``slow`` is
    # convergence/big-model; ``parity`` drives the reference's TF code.
    "fast": ([sys.executable, "-m", "pytest", "tests/", "-q"], 2400),
    "mesh": ([sys.executable, "-m", "pytest", "tests/", "-q",
              "-m", "mesh and not slow", "-p", "no:cacheprovider"], 2400),
    "parity": ([sys.executable, "-m", "pytest", "tests/", "-q",
                "-m", "parity", "-p", "no:cacheprovider"], 3600),
    "slow": ([sys.executable, "-m", "pytest", "tests/", "-q",
              "-m", "slow", "-p", "no:cacheprovider"], 3600),
    "dryrun": ([sys.executable, "-c",
                "import __graft_entry__ as g; g.dryrun_multichip(8)"], 1200),
    # ``tpu``: compiled-Mosaic checks that need the real chip (round-4
    # advisor: the Pallas cache-gather's multi-block lowering was only
    # interpret-verified). Each script self-SKIPs (exit 0) off-TPU.
    "tpu": ([sys.executable, "tools/check_cache_gather_tpu.py"], 1200),
}

def parse_pytest_summary(output: str):
    passed = failed = 0
    for line in output.splitlines()[::-1]:
        if " passed" in line or " failed" in line or " error" in line:
            mp = re.search(r"(\d+) passed", line)
            mf = re.search(r"(\d+) failed", line)
            me = re.search(r"(\d+) error", line)
            passed = int(mp.group(1)) if mp else 0
            failed = (int(mf.group(1)) if mf else 0) + (
                int(me.group(1)) if me else 0)
            return passed, failed
    return passed, failed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "GATE.json"))
    ap.add_argument("--sections", default="fast,mesh,parity,slow,dryrun,tpu")
    args = ap.parse_args()

    results = {}
    ok = True
    for name in args.sections.split(","):
        argv, timeout = SECTIONS[name]
        t0 = time.time()
        try:
            proc = subprocess.run(
                argv, cwd=REPO, capture_output=True, text=True,
                timeout=timeout,
            )
            rc = proc.returncode
            out = proc.stdout + proc.stderr
        except subprocess.TimeoutExpired as e:
            rc = -1
            # TimeoutExpired carries bytes even under text=True (CPython
            # quirk): the captured pipes never went through the decoder
            def _s(b):
                return b.decode(errors="replace") if isinstance(b, bytes) \
                    else (b or "")
            out = _s(e.stdout) + _s(e.stderr) + "\nTIMEOUT"
        dt = time.time() - t0
        entry = {"returncode": rc, "seconds": round(dt, 1)}
        if name != "dryrun":
            passed, failed = parse_pytest_summary(out)
            entry.update({"passed": passed, "failed": failed})
        results[name] = entry
        ok = ok and rc == 0
        print(f"[gate] {name}: rc={rc} {entry}", flush=True)
        if rc != 0:
            tail = "\n".join(out.splitlines()[-30:])
            print(tail, flush=True)

    results["ok"] = ok
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""CI wrapper for the REPRO.md dry-run (VERDICT r3 next #8): every
command in the real-data runbook must execute end to end against the
synthetic stand-ins on this rig."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.parity  # drives the reference's TF code

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_repro_dryrun():
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "repro_dryrun.py")],
        capture_output=True, text=True, timeout=2400, env=env, cwd=REPO)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    assert "REPRO_DRYRUN_PASS" in p.stdout

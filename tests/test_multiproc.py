"""Multi-process jax.distributed execution: the sharded pipeline over a
mesh spanning two real processes must match the single-process reference
(SURVEY §4's multi-host prescription; exercised via tools/multiproc_check).
Marked slow: spawns 3 JAX processes (~2-4 min)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multiproc_sharded_matches():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "BST_MP_RANK")}
    env["BST_MP_PORT"] = "9787"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiproc_check.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "MULTIPROC CHECK: PASS" in r.stdout

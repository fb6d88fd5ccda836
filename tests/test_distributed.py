"""Config-5 proxy: the collectives must execute across a real OS
process boundary (jax.distributed.initialize + gloo/TCP), not just
between virtual devices of one process (SURVEY §2.5; the reference's
parallel.py:17-56 thread pool is replaced by the JAX multi-process
runtime)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.timeout(900)
def test_two_process_psum_invariance():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_distributed.py"),
         "--launch2", "--total-batch", "2", "--dur", "0.5", "--iters", "1",
         "--port", "23461"],
        capture_output=True, text=True, timeout=840, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout)
    assert report["run_2proc"]["processes"] == 2
    assert report["voiced_count_invariant"]
    assert report["psum_mean_rel_dev"] < 1e-5
    # both configurations really ran the same total work
    assert (report["run_2proc"]["total_batch"]
            == report["baseline_1proc"]["total_batch"])

"""REAL multi-process execution test (VERDICT r2 next #3).

Everything else in the suite simulates multi-host with index math on a
single process; this test actually launches 2 jax.distributed processes
(gloo CPU collectives, 4 forced host devices each) via
scripts/run_multiprocess.py and asserts the full KD step — Batcher stripe
decoding, jax.make_array_from_process_local_data assembly, host-spilled
teacher cache — matches a single-process run on the same 8-device mesh.

Slow (~4-8 min on the 1-vCPU host: several tiny-model CPU compiles per
process). Skip with LMSU_SKIP_MULTIPROCESS=1.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("LMSU_SKIP_MULTIPROCESS") == "1",
                    reason="LMSU_SKIP_MULTIPROCESS=1")
def test_two_process_distributed_matches_single():
    env = dict(os.environ)
    # Workers set their own JAX_PLATFORMS/XLA_FLAGS; drop the conftest's
    # forced 8-device flag so it doesn't fight the per-worker 4-device one.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_multiprocess.py"),
         "--num-processes", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "OK — multi-process result matches single-process" in proc.stdout
    assert '"stripes_disjoint_and_complete": true' in proc.stdout
    assert '"host_spill_teacher_cache": true' in proc.stdout

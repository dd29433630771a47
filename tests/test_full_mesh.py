"""Full 4-axis parallelism composition: dp x pp x sp x tp in one train step.

The reference's ceiling is DDP (+ a dead ``cp_size`` flag, SURVEY.md §2.7);
here data, pipeline (GPipe), sequence, and tensor parallel all compose on a
2x2x2x2 mesh and reproduce the unsharded loss.  Runs in a subprocess because
conftest pins the in-process virtual-device count to 8.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_train_step_dp_pp_sp_tp(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "full_mesh_worker.py")
    out = str(tmp_path / "out.json")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, worker, out],
        env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, f"worker failed:\n{proc.stdout}\n{proc.stderr}"
    res = json.load(open(out))
    assert res["mesh"] == {"data": 2, "pipe": 2, "seq": 2, "model": 2}
    np.testing.assert_allclose(res["loss_mesh"], res["loss_base"], rtol=2e-5)

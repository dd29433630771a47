"""CI smoke for the speak probe (scripts/train_speak_probe.py).

Runs the --tiny CPU mode end to end in a subprocess: corpus synthesis,
production Trainer with the log_samples eval hook, CER through the
production sampler, order-sensitivity diagnostic, and the final synth
through the fused serving engine.  The tiny model does NOT learn (CER 1.0
expected) — this guards the probe's mechanics, not the result; the real
on-chip result (held-out CER 0.00 at update 999) is recorded in
DEVELOPMENT.md and re-verifiable via --skip-train.
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_speak_probe_tiny_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_speak_probe.py"),
         "--tiny", "--cpu", "--fresh",
         "--ckpt-dir", str(tmp_path / "ck"), "--out", str(tmp_path / "p.npz")],
        env=env, capture_output=True, text=True, timeout=900, cwd=repo)
    assert r.returncode == 0, r.stderr[-4000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    assert result["metric"] == "speak_probe"
    assert result["cer_curve"] and 0.0 <= result["final_cer"] <= 1.0
    assert 0.0 <= result["engine_cer"] <= 1.0  # engine path produced finite mel
    assert (tmp_path / "p.npz").is_file()

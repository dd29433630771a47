"""Multi-host data-sharded training: 2 jax.distributed processes x 4 virtual
CPU devices each, every process collating only its slice of each global batch
(the per-rank dataloader-shard counterpart of reference trainer.py:327-329)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_identical_result(tmp_path):
    port = _free_port()
    ckpt = str(tmp_path / "ck_mh")
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), str(port), outs[i], ckpt],
                         env=env, cwd=os.path.dirname(os.path.dirname(worker)),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    r0, r1 = (json.load(open(o)) for o in outs)
    # both processes hold the identical replicated result
    assert r0["updates"] == r1["updates"] > 0
    np.testing.assert_allclose(r0["param_head"], r1["param_head"], rtol=0, atol=0)
    assert r0["param_l2"] == r1["param_l2"]

    # and it matches a single-host 8-device run on the same data/seed
    from test_train import make_dataset

    import jax
    from f5_tts_tpu.models import dit as D
    from f5_tts_tpu.models.configs import DiTConfig, MelConfig, ModelConfig
    from f5_tts_tpu.parallel.mesh import make_mesh
    from f5_tts_tpu.train.step import OptimConfig
    from f5_tts_tpu.train.trainer import Trainer

    arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=16,
                     text_num_embeds=256, text_dim=16, conv_layers=1, max_pos=512)
    model_cfg = ModelConfig(name="tiny", arch=arch, mel=MelConfig(n_mel_channels=16),
                            tokenizer="byte")
    trainer = Trainer(model_cfg, None,
                      OptimConfig(num_warmup_updates=2, total_updates=50),
                      ckpt_dir=str(tmp_path / "ck_sh"), batch_size_per_device=400,
                      max_samples=4, save_per_updates=1000, last_per_updates=1000,
                      seed=0, mesh=make_mesh(data=8, model=1))
    p, _, upd = trainer.train(D.init(jax.random.PRNGKey(0), arch), make_dataset(12),
                              epochs=1, resume=False)
    assert upd == r0["updates"]
    flat = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(p)])
    # same math, different collate widths (text padded to n vs 64-multiple):
    # results agree to fp32 reduction noise
    np.testing.assert_allclose(flat[:8], r0["param_head"], atol=1e-5)
    np.testing.assert_allclose(float(np.sqrt((flat ** 2).sum())), r0["param_l2"], rtol=1e-5)

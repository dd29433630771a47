"""Multi-host trainer worker: one process of a 2-process x 4-virtual-CPU-device
jax.distributed run (spawned by tests/test_multihost.py).

Usage: python tests/mh_worker.py <process_id> <coordinator_port> <out_json> <ckpt_dir>
"""

import json
import os
import sys


def main():
    pid, port, out_path, ckpt_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tests")

    from test_train import make_dataset

    from f5_tts_tpu.models import dit as D
    from f5_tts_tpu.models.configs import DiTConfig, MelConfig, ModelConfig
    from f5_tts_tpu.parallel.mesh import make_mesh
    from f5_tts_tpu.train.step import OptimConfig
    from f5_tts_tpu.train.trainer import Trainer

    assert jax.process_count() == 2 and len(jax.devices()) == 8

    arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=16,
                     text_num_embeds=256, text_dim=16, conv_layers=1, max_pos=512)
    model_cfg = ModelConfig(name="tiny", arch=arch, mel=MelConfig(n_mel_channels=16),
                            tokenizer="byte")
    ds = make_dataset(12)
    mesh = make_mesh(data=8, model=1)
    trainer = Trainer(model_cfg, None,
                      OptimConfig(num_warmup_updates=2, total_updates=50),
                      ckpt_dir=ckpt_dir, batch_size_per_device=400, max_samples=4,
                      save_per_updates=1000, last_per_updates=1000, seed=0, mesh=mesh)
    params = D.init(jax.random.PRNGKey(0), arch)
    p, ema, upd = trainer.train(params, ds, epochs=1, resume=False)

    flat = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(p)])
    out = {
        "process": pid,
        "updates": upd,
        "param_sum": float(flat.sum()),
        "param_head": [float(v) for v in flat[:8]],
        "param_l2": float(np.sqrt((flat ** 2).sum())),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"worker {pid} done: {out['param_l2']:.6f}", flush=True)


if __name__ == "__main__":
    main()

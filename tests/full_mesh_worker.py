"""dp2 x pp2 x seq2 x tp2 = 16-virtual-CPU-device full-composition train step
(spawned by tests/test_full_mesh.py; conftest pins 8 devices in-process, so
the 4-axis mesh needs its own interpreter).

All four production parallelism axes in ONE jitted step: data-sharded batch,
GPipe microbatching over 'pipe', ring attention rotating KV over 'seq'
INSIDE the flat {pipe, seq} manual region (parallel/pipeline.py seq_shard —
see test_ring_attention.test_train_step_pp_sp_ring), Megatron TP over
'model'.  The sharded loss must match the single-device step
bit-for-bit-ish (fp32 tol).

Usage: python tests/full_mesh_worker.py <out_json>
"""

import functools
import json
import os
import sys


def main():
    out_path = sys.argv[1]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from f5_tts_tpu.models import dit
    from f5_tts_tpu.models.configs import DiTConfig
    from f5_tts_tpu.parallel import pipeline as pp
    from f5_tts_tpu.parallel import sequence as sp
    from f5_tts_tpu.parallel.mesh import (
        DATA_AXIS, backbone_param_specs, make_train_mesh, shard_params,
    )
    from f5_tts_tpu.train.step import OptimConfig, init_train_state, train_step

    assert len(jax.devices()) == 16, jax.devices()
    cfg = DiTConfig(dim=64, depth=4, heads=4, dim_head=16, ff_mult=2, mel_dim=8,
                    text_num_embeds=40, text_dim=24, conv_layers=1, max_pos=128)
    params = dit.init(jax.random.PRNGKey(1), cfg)
    opt_cfg = OptimConfig(num_warmup_updates=2, total_updates=10)
    b, n, nt = 4, 32, 8
    rng = np.random.default_rng(21)
    batch_np = {
        "mel": rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32),
        "text_ids": rng.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32),
        "lens": np.full((b,), n, np.int32),
    }
    key = jax.random.PRNGKey(2)

    opt_state, ema, step = init_train_state(params, opt_cfg)
    base_fn = jax.jit(functools.partial(
        train_step, arch_cfg=cfg, opt_cfg=opt_cfg, backend="sdpa"))
    *_, m1 = base_fn(params, opt_state, ema, step,
                     {k: jnp.asarray(v) for k, v in batch_np.items()}, key)

    mesh = make_train_mesh(data=2, pipe=2, seq=2, model=2)
    block_scan = pp.make_dit_block_scan(cfg, mesh, n_micro=2, backend="sdpa",
                                        ring_sequence="auto")
    specs = pp.pp_param_specs(backbone_param_specs(params), cfg.depth, 2)
    sharded = shard_params(params, mesh, specs)
    opt_state2, ema2, step2 = init_train_state(sharded, opt_cfg)
    bsh = NamedSharding(mesh, P(DATA_AXIS))
    batch = {k: jax.device_put(v, bsh) for k, v in batch_np.items()}
    step_fn = jax.jit(functools.partial(
        train_step, arch_cfg=cfg, opt_cfg=opt_cfg, backend="sdpa",
        block_scan=block_scan,
        activation_constraint=sp.make_seq_constraint(mesh)))
    with jax.set_mesh(mesh):
        *_, m2 = step_fn(sharded, opt_state2, ema2, step2, batch, key)
    with open(out_path, "w") as f:
        json.dump({"loss_base": float(m1["loss"]), "loss_mesh": float(m2["loss"]),
                   "mesh": dict(mesh.shape)}, f)


if __name__ == "__main__":
    main()

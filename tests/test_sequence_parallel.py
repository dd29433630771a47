"""Sequence (context) parallelism: sharding the frame axis over a ``seq``
mesh axis via activation constraints must not change the numerics, and the
sharding must actually take (output committed to the seq-sharded layout).

No reference counterpart (TRT engines are single-GPU per replica) — the
oracle is the unsharded path. See parallel/sequence.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from f5_tts_tpu.models import dit
from f5_tts_tpu.models.configs import DiTConfig
from f5_tts_tpu.parallel import sequence as sp
from f5_tts_tpu.parallel.mesh import DATA_AXIS, dit_param_specs, shard_params

CFG = DiTConfig(
    dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=8,
    text_num_embeds=40, text_dim=24, conv_layers=1, max_pos=128,
)


def make_case(b=4, n=32, nt=8, seed=0):
    rng = np.random.default_rng(seed)
    params = dit.init(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(rng.standard_normal((b, n, CFG.mel_dim)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, n, CFG.mel_dim)), jnp.float32)
    text_ids = jnp.asarray(rng.integers(0, CFG.text_num_embeds, (b, nt)), jnp.int32)
    time = jnp.asarray(rng.uniform(0.1, 0.9, (b,)), jnp.float32)
    lens = jnp.asarray(rng.integers(n // 2, n + 1, (b,)), jnp.int32)
    mask = jnp.arange(n)[None, :] < lens[:, None]
    te = dit.text_embedding(params, CFG, text_ids, n, lens=lens)
    return params, (x, cond, te, time, mask)


def test_forward_parity_seq_sharded():
    params, (x, cond, te, time, mask) = make_case()
    ref = jax.jit(functools.partial(dit.forward, cfg=CFG, mask=mask, backend="sdpa"))(
        params, x=x, cond=cond, text_emb=te, time=time)

    mesh = sp.make_sp_mesh(data=2, seq=2, model=2)
    specs = dit_param_specs(params)
    sharded = shard_params(params, mesh, specs)
    constrain = sp.make_seq_constraint(mesh)
    in_sh = NamedSharding(mesh, P(DATA_AXIS, sp.SEQ_AXIS, None))
    xs = jax.device_put(x, in_sh)
    got = jax.jit(functools.partial(
        dit.forward, cfg=CFG, mask=mask, backend="sdpa",
        activation_constraint=constrain,
    ))(sharded, x=xs, cond=cond, text_emb=te, time=time)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_seq_sharding_propagates():
    """The frame axis of the hidden states stays seq-sharded (the constraint
    is not a no-op): check the jitted output's committed sharding."""
    params, (x, cond, te, time, mask) = make_case()
    mesh = sp.make_sp_mesh(data=1, seq=4, model=1)
    constrain = sp.make_seq_constraint(mesh)

    @jax.jit
    def fwd(p, x):
        h = dit.forward(p, CFG, x, cond, te, time, mask=mask, backend="sdpa",
                        activation_constraint=constrain)
        return constrain(h)

    out = fwd(params, x)
    spec = out.sharding.spec
    assert spec[1] == sp.SEQ_AXIS, f"frame axis not seq-sharded: {spec}"


def test_train_step_with_sp():
    from f5_tts_tpu.train.step import OptimConfig, init_train_state, train_step

    params = dit.init(jax.random.PRNGKey(1), CFG)
    opt_cfg = OptimConfig(num_warmup_updates=2, total_updates=10)
    b, n, nt = 4, 32, 8
    rng = np.random.default_rng(5)
    batch_np = {
        "mel": rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32),
        "text_ids": rng.integers(0, CFG.text_num_embeds, (b, nt)).astype(np.int32),
        "lens": np.full((b,), n, np.int32),
    }
    key = jax.random.PRNGKey(2)

    opt_state, ema, step = init_train_state(params, opt_cfg)
    base_fn = jax.jit(functools.partial(
        train_step, arch_cfg=CFG, opt_cfg=opt_cfg, backend="sdpa"))
    *_, m1 = base_fn(params, opt_state, ema, step,
                     {k: jnp.asarray(v) for k, v in batch_np.items()}, key)

    mesh = sp.make_sp_mesh(data=2, seq=2, model=2)
    sharded = shard_params(params, mesh, dit_param_specs(params))
    opt_state, ema, step = init_train_state(sharded, opt_cfg)
    bsh = NamedSharding(mesh, P(DATA_AXIS))
    batch = {k: jax.device_put(v, bsh) for k, v in batch_np.items()}
    sp_fn = jax.jit(functools.partial(
        train_step, arch_cfg=CFG, opt_cfg=opt_cfg, backend="sdpa",
        activation_constraint=sp.make_seq_constraint(mesh)))
    *_, m2 = sp_fn(sharded, opt_state, ema, step, batch, key)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=2e-5)

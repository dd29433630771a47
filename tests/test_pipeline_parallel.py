"""Pipeline-parallel DiT: GPipe schedule over the ``pipe`` mesh axis must be
numerically equivalent to the plain ``lax.scan`` block stack — forward, grads,
and the full train step under a dp x pp x tp mesh.

The reference has NO working pipeline parallelism (TRT-LLM
convert_checkpoint.py:274 asserts pp_size == 1); this is capability beyond the
reference, so the oracle is our own sequential path, not torch.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from f5_tts_tpu.models import dit
from f5_tts_tpu.models.configs import DiTConfig
from f5_tts_tpu.parallel import pipeline as pp
from f5_tts_tpu.parallel.mesh import DATA_AXIS, dit_param_specs, shard_params

CFG = DiTConfig(
    dim=64, depth=4, heads=4, dim_head=16, ff_mult=2, mel_dim=8,
    text_num_embeds=40, text_dim=24, conv_layers=1, max_pos=128,
)


def make_inputs(b=4, n=32, nt=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, n, CFG.mel_dim)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, n, CFG.mel_dim)), jnp.float32)
    text_ids = jnp.asarray(rng.integers(0, CFG.text_num_embeds, (b, nt)), jnp.int32)
    time = jnp.asarray(rng.uniform(0.1, 0.9, (b,)), jnp.float32)
    lens = jnp.asarray(rng.integers(n // 2, n + 1, (b,)), jnp.int32)
    return x, cond, text_ids, time, lens


def randomized_params(key):
    """Init + re-randomize the zero-init AdaLN gates/proj_out so block outputs
    actually reach the loss (see DEVELOPMENT.md: zero-init makes block-level
    A/B comparisons vacuous)."""
    params = dit.init(key, CFG)
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.fold_in(key, 1), len(leaves))
    leaves = [
        jnp.where(jnp.all(leaf == 0), jax.random.normal(k, leaf.shape) * 0.05, leaf)
        if leaf.dtype == jnp.float32 else leaf
        for leaf, k in zip(leaves, ks)
    ]
    return jax.tree.unflatten(treedef, leaves)


@pytest.fixture(scope="module")
def setup():
    params = randomized_params(jax.random.PRNGKey(0))
    return params, make_inputs()


def run_forward(params, inputs, mesh=None, n_micro=None):
    x, cond, text_ids, time, lens = inputs
    n = x.shape[1]
    mask = jnp.arange(n)[None, :] < lens[:, None]
    te = dit.text_embedding(params, CFG, text_ids, n, lens=lens)
    block_scan = None
    if mesh is not None:
        block_scan = pp.make_dit_block_scan(CFG, mesh, n_micro, backend="sdpa")
    fn = functools.partial(
        dit.forward, cfg=CFG, mask=mask, backend="sdpa", block_scan=block_scan
    )
    return jax.jit(lambda p: fn(p, x=x, cond=cond, text_emb=te, time=time))(params)


@pytest.mark.parametrize("pipe,n_micro", [(2, 2), (2, 4), (4, 4), (4, 2)])
def test_forward_parity(setup, pipe, n_micro):
    params, inputs = setup
    ref = run_forward(params, inputs)
    mesh = pp.make_pp_mesh(data=1, pipe=pipe, model=1)
    got = run_forward(params, inputs, mesh=mesh, n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_forward_parity_with_tp(setup):
    """pp x tp composition: blocks depth-sharded on pipe AND feature-split on
    model; GSPMD keeps tp auto inside the manual-pipe region."""
    params, inputs = setup
    ref = run_forward(params, inputs)
    mesh = pp.make_pp_mesh(data=1, pipe=2, model=2)
    specs = pp.pp_param_specs(dit_param_specs(params), CFG.depth, 2)
    sharded = shard_params(params, mesh, specs)
    got = run_forward(sharded, inputs, mesh=mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_grad_parity(setup):
    """Autodiff through the ppermute pipeline gives the sequential gradients."""
    params, inputs = setup
    x, cond, text_ids, time, lens = inputs
    n = x.shape[1]
    mask = jnp.arange(n)[None, :] < lens[:, None]
    te = dit.text_embedding(params, CFG, text_ids, n, lens=lens)
    mesh = pp.make_pp_mesh(data=1, pipe=2, model=1)
    block_scan = pp.make_dit_block_scan(CFG, mesh, 2, backend="sdpa")

    def loss(p, bs):
        out = dit.forward(p, CFG, x, cond, te, time, mask=mask, backend="sdpa",
                          block_scan=bs)
        return jnp.mean(jnp.square(out))

    g_ref = jax.jit(jax.grad(functools.partial(loss, bs=None)))(params)
    g_pp = jax.jit(jax.grad(functools.partial(loss, bs=block_scan)))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2e-5, rtol=1e-4),
        g_ref, g_pp,
    )


def test_train_step_dp_pp_tp():
    """Full train step on a 2x2x2 (data x pipe x model) mesh matches the
    unsharded step's loss: same math, three parallelism axes."""
    from f5_tts_tpu.train.step import OptimConfig, init_train_state, train_step

    params = randomized_params(jax.random.PRNGKey(3))
    opt_cfg = OptimConfig(num_warmup_updates=2, total_updates=10)
    b, n, nt = 4, 32, 8
    rng = np.random.default_rng(7)
    batch_np = {
        "mel": rng.standard_normal((b, n, CFG.mel_dim)).astype(np.float32),
        "text_ids": rng.integers(0, CFG.text_num_embeds, (b, nt)).astype(np.int32),
        "lens": np.full((b,), n, np.int32),
    }
    key = jax.random.PRNGKey(11)

    # baseline: single-device
    opt_state, ema, step = init_train_state(params, opt_cfg)
    step_fn = jax.jit(functools.partial(
        train_step, arch_cfg=CFG, opt_cfg=opt_cfg, backend="sdpa"))
    p1, *_, m1 = step_fn(params, opt_state, ema, step,
                         {k: jnp.asarray(v) for k, v in batch_np.items()}, key)

    # dp=2 x pp=2 x tp=2
    mesh = pp.make_pp_mesh(data=2, pipe=2, model=2)
    specs = pp.pp_param_specs(dit_param_specs(params), CFG.depth, 2)
    sharded = shard_params(params, mesh, specs)
    opt_state, ema, step = init_train_state(sharded, opt_cfg)
    bsh = NamedSharding(mesh, P(DATA_AXIS))
    batch = {k: jax.device_put(v, bsh) for k, v in batch_np.items()}
    block_scan = pp.make_dit_block_scan(CFG, mesh, n_micro=2, backend="sdpa")
    step_fn_pp = jax.jit(functools.partial(
        train_step, arch_cfg=CFG, opt_cfg=opt_cfg, backend="sdpa",
        block_scan=block_scan))
    with jax.set_mesh(mesh):
        p2, *_, m2 = step_fn_pp(sharded, opt_state, ema, step, batch, key)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=2e-5)
    # params after one update also agree
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2e-5, rtol=1e-4),
        p1, p2,
    )


def test_pp1_falls_back_to_plain_scan(setup):
    params, inputs = setup
    mesh = pp.make_pp_mesh(data=1, pipe=1, model=1)
    ref = run_forward(params, inputs)
    got = run_forward(params, inputs, mesh=mesh, n_micro=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

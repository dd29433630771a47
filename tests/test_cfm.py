"""Golden tests for the CFM Euler sampler vs a torch oracle of cfm.py:83-229."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from f5_tts_tpu.models import cfm as C
from f5_tts_tpu.models import dit as D
from tests.test_dit import SMALL, make_params
from tests.oracles import torch_dit as OD


def test_epss_and_sway_schedule():
    # EPSS @ NFE=16 (reference model/utils.py:213) then sway with coef=-1
    ts = C.timestep_schedule(16, sway_sampling_coef=None, use_epss=True)
    want = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32]) / 32.0
    np.testing.assert_allclose(ts, want, atol=1e-7)
    ts_sway = C.timestep_schedule(16, sway_sampling_coef=-1.0, use_epss=True)
    np.testing.assert_allclose(ts_sway, 1.0 - np.cos(np.pi / 2.0 * want), atol=1e-6)
    # non-tabled NFE -> linspace
    ts8 = C.timestep_schedule(8, sway_sampling_coef=None, use_epss=True)
    np.testing.assert_allclose(ts8, np.linspace(0, 1, 9), atol=1e-7)


def torch_sample_oracle(params, cfg, cond, text_ids, duration, noise, lens, steps, cfg_strength, sway):
    """Independent torch replication of CFM.sample's padding/mask/ODE semantics."""
    b, n, d = cond.shape
    cond_mask = torch.arange(n)[None, :] < lens[:, None]
    step_cond = torch.where(cond_mask.unsqueeze(-1), cond, torch.zeros_like(cond))
    text_len = (text_ids != -1).sum(dim=-1)
    duration = torch.maximum(torch.maximum(text_len, lens) + 1, duration).clamp(max=n)
    mask = torch.arange(n)[None, :] < duration[:, None]

    y = torch.where(mask.unsqueeze(-1), noise, torch.zeros_like(noise))
    ts = C.timestep_schedule(steps, sway_sampling_coef=sway, use_epss=True)
    for k in range(steps):
        t = torch.full((b,), float(ts[k]))
        pred = OD.forward(params, cfg, y, step_cond, text_ids, t, mask=mask, lens=duration)
        null = OD.forward(params, cfg, y, step_cond, text_ids, t, mask=mask, lens=duration,
                          drop_audio_cond=True, drop_text=True)
        v = pred + (pred - null) * cfg_strength
        y = y + (float(ts[k + 1]) - float(ts[k])) * v
    out = torch.where(cond_mask.unsqueeze(-1), cond, y)
    return torch.where(mask.unsqueeze(-1), out, torch.zeros_like(out))


def test_sample_matches_torch_oracle():
    cfg = SMALL
    params = make_params(cfg)
    rng = np.random.default_rng(21)
    b, n, nt = 2, 48, 10
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    lens = np.array([12, 9], dtype=np.int32)
    cond[0, 12:] = 0.0
    cond[1, 9:] = 0.0
    text = rng.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    text[1, 6:] = -1
    duration = np.array([40, 30], dtype=np.int32)
    noise = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)

    opts = C.SampleOptions(steps=5, cfg_strength=2.0, sway_sampling_coef=-1.0)
    got = np.asarray(
        C.sample(params, cfg, jnp.asarray(cond), jnp.asarray(text), jnp.asarray(duration),
                 jnp.asarray(noise), lens=jnp.asarray(lens), opts=opts, backend="sdpa")
    )
    want = torch_sample_oracle(
        params, cfg, torch.from_numpy(cond), torch.from_numpy(text).long(),
        torch.from_numpy(duration).long(), torch.from_numpy(noise),
        torch.from_numpy(lens).long(), steps=5, cfg_strength=2.0, sway=-1.0,
    ).numpy()
    assert np.abs(got - want).mean() < 1e-3
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)
    # ref region must be exactly the prompt mel
    np.testing.assert_array_equal(got[0, :12], cond[0, :12])
    # padding beyond duration must be zero
    np.testing.assert_array_equal(got[0, 41:], 0.0)


def test_midpoint_second_order():
    """ode_method="midpoint" (reference cfm.py:42's torchdiffeq alternative)
    must beat Euler at equal step count against a fine-grid Euler truth —
    the explicit midpoint rule is 2nd order."""
    cfg = SMALL
    params = make_params(cfg)
    rng = np.random.default_rng(41)
    b, n, nt = 1, 40, 8
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    lens = np.array([10], dtype=np.int32)
    cond[0, 10:] = 0.0
    text = rng.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    duration = np.array([36], dtype=np.int32)
    noise = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)

    def run(steps, method):
        opts = C.SampleOptions(steps=steps, cfg_strength=2.0,
                               sway_sampling_coef=None, use_epss=False,
                               ode_method=method)
        return np.asarray(
            C.sample(params, cfg, jnp.asarray(cond), jnp.asarray(text),
                     jnp.asarray(duration), jnp.asarray(noise),
                     lens=jnp.asarray(lens), opts=opts, backend="sdpa"))

    truth = run(64, "euler")
    err_euler = np.abs(run(4, "euler") - truth).mean()
    err_mid = np.abs(run(4, "midpoint") - truth).mean()
    assert err_mid < err_euler, (err_mid, err_euler)
    # midpoint@4 (8 evals) should also beat euler@8 (8 evals) on a smooth flow
    err_euler8 = np.abs(run(8, "euler") - truth).mean()
    assert err_mid < err_euler8, (err_mid, err_euler8)


def test_sample_batch_invariance():
    """Same sample alone or in a batch gives the same result (the property the
    reference engineers via per-sample seeded noise, cfm.py:194-201)."""
    cfg = SMALL
    params = make_params(cfg)
    rng = np.random.default_rng(31)
    n, nt = 40, 8
    cond = rng.standard_normal((2, n, cfg.mel_dim)).astype(np.float32)
    lens = np.array([10, 8], dtype=np.int32)
    cond[0, 10:] = 0.0
    cond[1, 8:] = 0.0
    text = rng.integers(0, cfg.text_num_embeds, (2, nt)).astype(np.int32)
    duration = np.array([36, 28], dtype=np.int32)
    noise = rng.standard_normal((2, n, cfg.mel_dim)).astype(np.float32)
    opts = C.SampleOptions(steps=4, cfg_strength=2.0)

    batch = np.asarray(
        C.sample(params, cfg, jnp.asarray(cond), jnp.asarray(text), jnp.asarray(duration),
                 jnp.asarray(noise), lens=jnp.asarray(lens), opts=opts, backend="sdpa")
    )
    single = np.asarray(
        C.sample(params, cfg, jnp.asarray(cond[:1]), jnp.asarray(text[:1]),
                 jnp.asarray(duration[:1]), jnp.asarray(noise[:1]),
                 lens=jnp.asarray(lens[:1]), opts=opts, backend="sdpa")
    )
    np.testing.assert_allclose(batch[0], single[0], atol=1e-4)


def test_loss_finite_and_span_masked():
    cfg = SMALL
    params = make_params(cfg)
    rng = np.random.default_rng(41)
    b, n, nt = 3, 32, 8
    mel = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    lens = np.array([32, 20, 28], dtype=np.int32)
    val = C.loss(params, cfg, jnp.asarray(mel), jnp.asarray(text), jnp.asarray(lens),
                 jax.random.PRNGKey(0), backend="sdpa")
    assert np.isfinite(float(val))
    grads = jax.grad(
        lambda p: C.loss(p, cfg, jnp.asarray(mel), jnp.asarray(text), jnp.asarray(lens),
                         jax.random.PRNGKey(0), backend="sdpa")
    )(params)
    gnorm = float(jax.tree.reduce(lambda a, x: a + jnp.sum(jnp.square(x)), grads, 0.0) ** 0.5)
    assert np.isfinite(gnorm) and gnorm > 0


def test_mask_from_frac_lengths_bounds():
    key = jax.random.PRNGKey(5)
    lens = jnp.array([32, 20, 7])
    m = C.mask_from_frac_lengths(key, lens, 32, (0.7, 1.0))
    counts = np.asarray(m.sum(axis=1))
    for c, ln in zip(counts, np.asarray(lens)):
        assert 0.7 * ln - 1 <= c <= ln


def test_precompute_adaln_matches_inline():
    """The precomputed AdaLN-table sampling path (SampleOptions.precompute_adaln,
    models/dit.py precompute_adaln) must match the inline per-step adaln path —
    same math, hoisted out of the scan."""
    cfg = SMALL
    params = make_params(cfg, seed=3)
    rng = np.random.default_rng(11)
    b, n, nt = 2, 48, 12
    cond = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)), jnp.float32)
    text = np.full((b, nt), -1, np.int32)
    text[0, :9] = rng.integers(0, cfg.text_num_embeds, 9)
    text[1, :5] = rng.integers(0, cfg.text_num_embeds, 5)
    noise = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)), jnp.float32)
    lens = jnp.asarray([20, 14], jnp.int32)
    dur = jnp.asarray([n, n - 8], jnp.int32)
    outs = {}
    for pre in (True, False):
        opts = C.SampleOptions(steps=5, cfg_strength=2.0, precompute_adaln=pre)
        outs[pre] = np.asarray(C.sample(
            params, cfg, cond, jnp.asarray(text), dur, noise, lens=lens, opts=opts))
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-5, rtol=1e-5)

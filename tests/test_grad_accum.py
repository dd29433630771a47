"""Grad-accumulation update semantics + DP-padding validity mask
(reference model/trainer.py:63-68 counts optimizer updates, not micro-steps;
Accelerate never pads batches so padded rows must carry zero loss weight)."""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.models import cfm, dit as D
from f5_tts_tpu.models.configs import DiTConfig, MelConfig, ModelConfig
from f5_tts_tpu.train.step import OptimConfig, init_train_state, train_step
from f5_tts_tpu.train.trainer import Trainer
from tests.test_train import make_dataset


ARCH = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=16,
                 text_num_embeds=256, text_dim=16, conv_layers=1, max_pos=256)


def _batch(b=2, n=64, nt=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "mel": jnp.asarray(rng.standard_normal((b, n, ARCH.mel_dim)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(0, 100, (b, nt)), jnp.int32),
        "lens": jnp.full((b,), n, jnp.int32),
    }


def _leaf(p):
    return jax.tree.leaves(p)[0]


def test_ema_and_params_move_only_on_optimizer_updates():
    k = 4
    cfg = OptimConfig(num_warmup_updates=0, total_updates=100,
                      grad_accumulation_steps=k,
                      # decay 0.5 so one EMA step is visible above fp32 eps
                      ema_update_after_step=0, ema_update_every=1, ema_decay=0.5)
    params = D.init(jax.random.PRNGKey(0), ARCH)
    opt_state, ema, step = init_train_state(params, cfg)
    key = jax.random.PRNGKey(1)
    p_hist, e_hist = [], []
    for i in range(2 * k):
        key, sub = jax.random.split(key)
        params, opt_state, ema, step, _ = train_step(
            params, opt_state, ema, step, _batch(seed=i), sub,
            arch_cfg=ARCH, opt_cfg=cfg, backend="sdpa")
        p_hist.append(np.asarray(_leaf(params)).copy())
        e_hist.append(np.asarray(_leaf(ema)).copy())
    assert int(step) == 2 * k
    for i in range(2 * k):
        micro = i + 1
        if micro % k:  # accumulating: nothing must move
            np.testing.assert_array_equal(p_hist[i], p_hist[i - 1] if i else p_hist[0])
            np.testing.assert_array_equal(e_hist[i], e_hist[i - 1] if i else e_hist[0])
    # boundary micro-steps apply the update and move the EMA
    assert np.abs(p_hist[k - 1] - p_hist[k - 2]).max() > 0
    assert np.abs(e_hist[k - 1] - e_hist[k - 2]).max() > 0
    assert np.abs(p_hist[2 * k - 1] - p_hist[2 * k - 2]).max() > 0


def test_trainer_counts_updates_not_micro_steps(tmp_path):
    model_cfg = ModelConfig(name="tiny", arch=ARCH, mel=MelConfig(n_mel_channels=16),
                            tokenizer="byte")
    ds = make_dataset(12)
    trainer = Trainer(model_cfg, None,
                      OptimConfig(num_warmup_updates=1, total_updates=50),
                      ckpt_dir=str(tmp_path / "ck"), batch_size_per_device=400,
                      max_samples=4, grad_accumulation_steps=2,
                      save_per_updates=100, last_per_updates=100, seed=0)
    params = D.init(jax.random.PRNGKey(0), ARCH)
    from f5_tts_tpu.train.dataset import DynamicBatchSampler

    micro_per_epoch = len(DynamicBatchSampler(ds, 400, 4, 0))
    _, _, upd = trainer.train(params, ds, epochs=2, resume=False)
    assert upd == (2 * micro_per_epoch) // 2  # optimizer updates, not micro-steps
    # logged records use the update counter
    import json

    recs = [json.loads(line) for line in open(trainer.log_file)]
    assert all(r["update"] <= upd for r in recs)
    assert all(r["micro_step"] == r["update"] * 2 for r in recs)

    # resume: fast-forward measured in micro-steps, reported in updates
    trainer2 = Trainer(model_cfg, None,
                       OptimConfig(num_warmup_updates=1, total_updates=50),
                       ckpt_dir=str(tmp_path / "ck"), batch_size_per_device=400,
                       max_samples=4, grad_accumulation_steps=2,
                       save_per_updates=100, last_per_updates=100, seed=0)
    _, _, upd2 = trainer2.train(D.init(jax.random.PRNGKey(5), ARCH), ds, epochs=2)
    assert upd2 == upd


def test_valid_mask_makes_loss_independent_of_padded_rows():
    params = D.init(jax.random.PRNGKey(0), ARCH)
    key = jax.random.PRNGKey(3)
    b_real, pad, n = 3, 2, 64
    base = _batch(b=b_real + pad, n=n, seed=7)
    valid = jnp.asarray([1.0] * b_real + [0.0] * pad)

    def run(garbage_seed):
        mel = np.asarray(base["mel"]).copy()
        rng = np.random.default_rng(garbage_seed)
        mel[b_real:] = rng.standard_normal(mel[b_real:].shape) * 100.0
        def loss_fn(p):
            return cfm.loss(p, ARCH, jnp.asarray(mel), base["text_ids"],
                            base["lens"], key, valid=valid)
        return jax.value_and_grad(loss_fn)(params)

    (l1, g1), (l2, g2) = run(1), run(2)
    assert np.isfinite(float(l1))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_loss_cond_branch_matches_both_drop_states():
    """lax.cond text-embed selection must produce finite loss for keys landing
    in either drop branch (drop_both true/false)."""
    params = D.init(jax.random.PRNGKey(0), ARCH)
    batch = _batch(seed=11)
    losses = []
    for s in range(8):
        l = cfm.loss(params, ARCH, batch["mel"], batch["text_ids"], batch["lens"],
                     jax.random.PRNGKey(s))
        losses.append(float(l))
    assert all(np.isfinite(losses))
    assert len(set(np.round(losses, 6))) > 1  # different keys -> different losses

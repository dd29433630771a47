"""Training step: CFM loss + AdamW + EMA as one pjit-compiled function.

Replaces the reference's HF Accelerate DDP loop body (reference
model/trainer.py:342-438): grad all-reduce becomes XLA collectives implied by
the mesh sharding (batch on the ``data`` axis, params replicated or
tensor-parallel), EMA runs in-graph on every update (the reference uses
ema_pytorch on rank 0 only).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from f5_tts_tpu.models import cfm


@dataclass(frozen=True)
class OptimConfig:
    """Defaults mirror reference configs/*.yaml optim section + torch AdamW."""

    learning_rate: float = 7.5e-5
    num_warmup_updates: int = 20_000
    # None -> the Trainer derives the decay horizon from the actual run
    # length (epochs x batches / grad_accum), exactly like the reference
    # (trainer.py:316-326 SequentialLR over total_updates - warmup); a
    # pinned int is used as-is
    total_updates: int | None = None
    max_grad_norm: float = 1.0
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.01  # torch AdamW default used by the reference
    ema_decay: float = 0.9999  # ema_pytorch defaults (trainer.py:107)
    ema_update_after_step: int = 100
    ema_update_every: int = 10
    # bf16 compute with fp32 master weights (TPU mixed precision; the reference
    # trains fp32 — bf16 is the TPU-native choice, MXU-matched)
    mixed_precision: bool = False
    # micro-batch accumulation (reference grad_accumulation_steps,
    # trainer.py:63-68) — one optimizer update every k step calls
    grad_accumulation_steps: int = 1
    # "adamw" | "adafactor" (the memory-saving stand-in for the reference's
    # bnb 8-bit AdamW option, which is CUDA-only)
    optimizer: str = "adamw"


def lr_schedule(cfg: OptimConfig) -> optax.Schedule:
    """Linear warmup then linear decay to zero (reference trainer.py:316-326)."""
    total = cfg.total_updates if cfg.total_updates is not None else 1_000_000
    warmup = optax.linear_schedule(0.0, cfg.learning_rate, cfg.num_warmup_updates)
    decay = optax.linear_schedule(
        cfg.learning_rate, 0.0, max(total - cfg.num_warmup_updates, 1)
    )
    return optax.join_schedules([warmup, decay], [cfg.num_warmup_updates])


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adafactor":
        inner = optax.adafactor(lr_schedule(cfg), weight_decay_rate=cfg.weight_decay)
    else:
        inner = optax.adamw(
            lr_schedule(cfg), b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), inner)
    if cfg.grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accumulation_steps)
    return tx


def init_train_state(params, cfg: OptimConfig):
    """Returns (opt_state, ema_params, step)."""
    opt = make_optimizer(cfg)
    return opt.init(params), jax.tree.map(jnp.copy, params), jnp.zeros((), jnp.int32)


def ema_update(ema_params, params, step, cfg: OptimConfig, enabled=True):
    """ema_pytorch semantics: copy online weights until ``update_after_step``,
    then decay-average every ``update_every`` steps.  ``step`` counts OPTIMIZER
    updates (the reference calls ema.update() once per optimizer step,
    trainer.py:380); ``enabled`` gates micro-steps under grad accumulation."""
    do_update = ((step % cfg.ema_update_every) == 0) & enabled
    started = step > cfg.ema_update_after_step
    decay = jnp.where(started, cfg.ema_decay, 0.0)
    decay = jnp.where(do_update, decay, 1.0)

    def upd(e, p):
        return e * decay.astype(e.dtype) + p.astype(e.dtype) * (1.0 - decay.astype(e.dtype))

    return jax.tree.map(upd, ema_params, params)


def train_step(
    params,
    opt_state,
    ema_params,
    step,
    batch: dict,  # {"mel": [b,n,d] | "wav": [b,S], "text_ids": [b,nt], "lens": [b]}
    key: jax.Array,
    arch_cfg,
    opt_cfg: OptimConfig,
    backend: str = "train_auto",  # Pallas flash fwd+bwd on TPU, SDPA elsewhere
    block_scan=None,  # pipeline-parallel block schedule (parallel/pipeline.py)
    activation_constraint=None,  # sequence-parallel sharding pin (parallel/sequence.py)
    mel_cfg=None,  # MelConfig — required for "wav" batches (in-graph mel)
):
    """One optimizer update.  Pure function of its inputs -> jit/pjit over a
    mesh shards it (batch on data axis => gradient all-reduce via XLA).

    A "wav" batch carries host-reflect-padded waveforms (collate_wav_batch)
    and the log-mel is extracted ON-DEVICE inside this graph — the reference
    computes mel inside the model forward too (modules.py MelSpec); on a
    1-CPU TPU host this is what keeps the input pipeline ahead of the chip.
    """

    def loss_fn(p):
        if "wav" in batch:
            from f5_tts_tpu.ops.mel import log_mel_prepadded

            wav = batch["wav"]
            if wav.dtype == jnp.int16:  # collate_wav_batch int16 wire format
                wav = wav.astype(jnp.float32) * (batch["wav_scale"][:, None] / 32767.0)
            mel = log_mel_prepadded(wav, mel_cfg)
        else:
            mel = batch["mel"]
        if opt_cfg.mixed_precision:
            p = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, p
            )
            mel = mel.astype(jnp.bfloat16)
        return cfm.loss(
            p, arch_cfg, mel, batch["text_ids"], batch["lens"], key, backend=backend,
            valid=batch.get("valid"), block_scan=block_scan,
            activation_constraint=activation_constraint,
        )

    loss_val, grads = jax.value_and_grad(loss_fn)(params)
    opt = make_optimizer(opt_cfg)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    step = step + 1  # micro-step counter; optimizer updates = step // k
    k = opt_cfg.grad_accumulation_steps
    # MultiSteps applies the real update on micro-steps k, 2k, ...; EMA must
    # track OPTIMIZER updates (reference trainer.py:63-68,380), so it fires
    # only on those micro-steps, indexed by the update count.
    did_update = (step % k) == 0 if k > 1 else True
    ema_params = ema_update(ema_params, params, step // k, opt_cfg, enabled=did_update)
    gnorm = optax.global_norm(grads)
    return params, opt_state, ema_params, step, {"loss": loss_val, "grad_norm": gnorm}

"""DiT backbone — AdaLN-zero diffusion transformer over mel frames.

Functional rebuild of reference src/f5_tts/model/backbones/dit.py:170-370:
TextEmbedding (char embed + abs sinus pos + ConvNeXtV2 stack, dit.py:33-139),
InputEmbedding (dit.py:145-164), `depth` DiT blocks, AdaLN final + projection.

TPU-first differences:
- transformer blocks are a STACKED pytree scanned with ``lax.scan`` (one block
  compiled once, not `depth` times);
- the CFG cond/uncond pair is one fused 2B batch built by the sampler (the
  reference's cfg_infer path, dit.py:337-346) — there is no text-embed cache
  because the text encoder runs once outside the ODE loop by construction;
- rotary/abs-pos tables are baked constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from f5_tts_tpu.models import layers as L
from f5_tts_tpu.models.configs import DiTConfig
from f5_tts_tpu.ops.rope import abs_pos_table, rotary_freqs


def init(key: jax.Array, cfg: DiTConfig):
    ks = jax.random.split(key, 8)
    text_p = {"embed": L.embedding_init(ks[0], cfg.text_num_embeds + 1, cfg.text_dim)}
    if cfg.conv_layers > 0:
        bkeys = jax.random.split(ks[1], cfg.conv_layers)
        text_p["blocks"] = [
            L.convnext_v2_init(bkeys[i], cfg.text_dim, cfg.text_dim * cfg.conv_mult)
            for i in range(cfg.conv_layers)
        ]
    blocks = [
        L.dit_block_init(k, cfg.dim, cfg.heads, cfg.dim_head, ff_mult=cfg.ff_mult, qk_norm=cfg.qk_norm)
        for k in jax.random.split(ks[2], cfg.depth)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params = {
        "time_embed": L.timestep_embed_init(ks[3], cfg.dim),
        "text_embed": text_p,
        "input_embed": {
            "proj": L.linear_init(ks[4], cfg.mel_dim * 2 + cfg.text_dim, cfg.dim),
            "conv_pos": L.conv_pos_embed_init(ks[5], cfg.dim),
        },
        "blocks": stacked,
        "norm_out": L.adaln_final_init(ks[6], cfg.dim, zero=True),
        "proj_out": L.linear_init(ks[7], cfg.dim, cfg.mel_dim, zero=True),
    }
    if cfg.long_skip_connection:
        # NOT split(ks[2], 1)[0]: jax splits are prefix-stable, so that key
        # would be bit-identical to block 0's init key (correlated weights)
        params["long_skip"] = L.linear_init(
            jax.random.fold_in(ks[2], cfg.depth), cfg.dim * 2, cfg.dim, bias=False
        )
    return params


# per-device token budget below which "dots_flash" fits v5e HBM at
# F5TTS_v1_Base scale: measured fit at 16x1024 (39.9k frames/s), OOM at
# 32x1024 and 16x2048 (16.8G > 15.75G) — round-5 remat-policy matrix,
# DEVELOPMENT.md "Training remat-policy A/B"
AUTO_DOTS_FLASH_MAX_TOKENS = 16_384


def remat_policy(cfg, tokens: int | None = None):
    """jax.checkpoint policy from cfg.remat_policy (None = save nothing).

    "flash" saves only the flash-attention kernel outputs (tagged
    ``flash_out``/``flash_lse`` in ops/flash_attention.py) so the backward
    recompute never re-runs the Pallas forward (~out+lse per block vs "dots"
    saving every matmul).  "dots_flash" composes both.

    "auto" picks per shape from the measured round-5 policy matrix (v5e,
    F5TTS_v1_Base, bf16): "dots_flash" when the trace's token count
    (``tokens`` = b*n) fits HBM (fastest everywhere it compiles: 40.5k
    frames/s at 8x1024 vs 37.5k full-remat), else "flash" (beats full-remat
    at every large shape measured: 37.3k vs 35.3k at 32x1024, 32.1k vs 30.7k
    at 16x2048).  The Trainer pre-resolves "auto" from its per-device frame
    budget (exact under data parallelism); direct forward() calls resolve
    from the traced global shape, which over-counts per-device tokens on a
    mesh and therefore degrades conservatively toward "flash"."""
    pol = getattr(cfg, "remat_policy", "nothing")
    if pol == "auto":
        if tokens is None:
            raise ValueError(
                "remat_policy='auto' needs the trace's token count; pass "
                "tokens=b*n or pre-resolve (train/trainer.py resolve_remat_policy)")
        pol = "dots_flash" if tokens <= AUTO_DOTS_FLASH_MAX_TOKENS else "flash"
    if pol == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if pol == "flash":
        return jax.checkpoint_policies.save_only_these_names("flash_out", "flash_lse")
    if pol == "dots_flash":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names("flash_out", "flash_lse"),
        )
    if pol != "nothing":
        raise ValueError(f"unknown remat_policy {pol!r} (nothing|dots|flash|dots_flash)")
    return None


def _avg_upsample_one(emb, text_len, audio_len, seq_len):
    """ZipVoice-style average upsampling for one sample (dit.py:55-84):
    token j repeats base(+1 for the last `rem` tokens) times over audio_len."""
    tl = jnp.maximum(text_len, 1)
    base = audio_len // tl
    rem = audio_len % tl
    p = jnp.arange(seq_len)
    cut = (tl - rem) * base
    idx = jnp.where(p < cut, p // jnp.maximum(base, 1), (tl - rem) + (p - cut) // (base + 1))
    idx = jnp.clip(idx, 0, tl - 1)
    out = jnp.take(emb, idx, axis=0)
    keep = (p < audio_len)[:, None] & (text_len > 0)
    return jnp.where(keep, out, 0.0)


def text_embedding(
    params,
    cfg: DiTConfig,
    text_ids: jax.Array,  # [b, nt], -1 padded
    seq_len: int,  # static mel frame count
    lens: jax.Array | None = None,  # [b] per-sample valid speech lengths
    drop_text: bool = False,
):
    """TextEmbedding forward (dit.py:86-139) -> [b, seq_len, text_dim]."""
    p = params["text_embed"]
    ids = text_ids + 1  # 0 becomes the filler token
    nt = ids.shape[1]
    if nt >= seq_len:
        ids = ids[:, :seq_len]
    else:
        ids = jnp.pad(ids, ((0, 0), (0, seq_len - nt)))
    valid = None
    if lens is not None:
        valid = jnp.arange(seq_len)[None, :] < lens[:, None]
        ids = jnp.where(valid, ids, 0)
    # pad mask captured BEFORE drop_text: the uncond stream keeps the cond
    # stream's padding geometry (reference dit.py:103-107 ordering).
    pad_mask = ids == 0
    if drop_text:
        ids = jnp.zeros_like(ids)
    emb = L.embedding(p["embed"], ids)
    if valid is not None:
        emb = jnp.where(valid[..., None], emb, 0.0)
    if cfg.conv_layers > 0:
        freqs = jnp.asarray(abs_pos_table(cfg.max_pos, cfg.text_dim)[:seq_len], dtype=emb.dtype)
        if valid is not None:
            freqs = freqs[None] * valid[..., None].astype(emb.dtype)
        emb = emb + freqs
        if cfg.text_mask_padding:
            keep = (~pad_mask)[..., None].astype(emb.dtype)
            emb = emb * keep
            for bp in p["blocks"]:
                emb = L.convnext_v2(bp, emb) * keep
        else:
            for bp in p["blocks"]:
                emb = L.convnext_v2(bp, emb)
    if cfg.text_embedding_average_upsampling:
        text_lens = jnp.sum(~pad_mask, axis=1)
        target = lens if lens is not None else jnp.full((emb.shape[0],), seq_len)
        emb = jax.vmap(lambda e, tl, al: _avg_upsample_one(e, tl, al, seq_len))(emb, text_lens, target)
    return emb


def input_embedding(params, x, cond, text_emb, drop_audio_cond=False, mask=None,
                    activation_constraint=None):
    """InputEmbedding (dit.py:145-164).

    ``activation_constraint`` pins ``h`` BEFORE the grouped positional convs:
    GSPMD otherwise chooses to run them replicated under a batch-sharded mesh
    (measured: 2x [rows, n, dim] k=31 convolutions at full rows on every
    device) and only then slice."""
    p = params["input_embed"]
    if drop_audio_cond:
        cond = jnp.zeros_like(cond)
    h = L.linear(p["proj"], jnp.concatenate([x, cond, text_emb], axis=-1))
    if activation_constraint is not None:
        h = activation_constraint(h)
    return L.conv_pos_embed(p["conv_pos"], h, mask=mask) + h


def precompute_adaln(params, cfg: DiTConfig, times: jax.Array, dtype=jnp.float32):
    """AdaLN modulation tables for a KNOWN timestep schedule ``times`` [S].

    The AdaLN matrices (depth x Linear(dim -> 6*dim)) are ~41% of the DiT's
    parameters, and inside the NFE sampling loop their input depends only on
    the step's timestep — which the EPSS/sway schedule fixes ahead of time.
    Precomputing all steps' modulations ONCE moves that weight read out of
    the per-step loop (~0.37 ms/step at F5TTS_v1_Base; the reference cannot
    do this — it re-dispatches its engine per step,
    runtime/triton_trtllm/f5_tts_trtllm.py:296-372).

    Returns (block_mods [S, depth, 6*dim], final_mods [S, 2*dim]).
    """
    t_emb = L.timestep_embed(params["time_embed"], times.astype(dtype), dtype=dtype)  # [S, dim]
    h = jax.nn.silu(t_emb)
    blk = params["blocks"]["attn_norm"]["linear"]  # kernel [depth, dim, 6dim], bias [depth, 6dim]
    mods = (
        jnp.einsum("sd,ldm->slm", h, blk["kernel"].astype(dtype))
        + blk["bias"].astype(dtype)[None]
    )
    fin = L.linear(params["norm_out"]["linear"], h)  # [S, 2*dim]
    return mods, fin


def forward(
    params,
    cfg: DiTConfig,
    x: jax.Array,  # [b, n, mel] noised input
    cond: jax.Array,  # [b, n, mel] masked cond audio (zeroed if dropped)
    text_emb: jax.Array,  # [b, n, text_dim] precomputed text embedding
    time: jax.Array,  # [b] or scalar
    mask: jax.Array | None = None,  # [b, n] bool
    drop_audio_cond: bool = False,
    backend: str = "auto",
    block_scan=None,  # optional override for the block-stack loop, e.g. the
    # pipeline-parallel schedule (parallel/pipeline.py make_dit_block_scan);
    # called as block_scan(stacked_blocks, h, t_emb, mask, rope) -> h
    activation_constraint=None,  # optional h -> h sharding pin, e.g. sequence
    # parallelism (parallel/sequence.py make_seq_constraint)
    adaln_mods=None,  # optional (block_mods [depth, 6*dim], final_mod [2*dim])
    # from precompute_adaln for ONE shared timestep — replaces the in-loop
    # adaln matmuls; `time` is then unused.  Per-row variant ([depth, rows,
    # 6*dim], [rows, 2*dim]) serves the time-parallel window (cfm.py), where
    # batch rows carry different timesteps
):
    """DiT forward (dit.py:319-370) with text embedding precomputed.

    Returns predicted flow [b, n, mel_dim].
    """
    b, n, _ = x.shape
    if adaln_mods is None:
        if time.ndim == 0:
            time = jnp.broadcast_to(time, (b,))
        t_emb = L.timestep_embed(params["time_embed"], time, dtype=x.dtype)
    else:
        t_emb = None
    h = input_embedding(params, x, cond, text_emb, drop_audio_cond=drop_audio_cond,
                        mask=mask, activation_constraint=activation_constraint)
    if activation_constraint is not None:
        h = activation_constraint(h)
    rope = jnp.asarray(rotary_freqs(cfg.max_pos, cfg.dim_head)[:n])

    residual = h if cfg.long_skip_connection else None

    # GSPMD does NOT reliably propagate an input sharding constraint through
    # the scan carry (measured: batch-sharded rows ran the 22 blocks
    # replicated, per-device flops ratio 2.7/8) — re-pin the carry in the
    # scan BODY so every block's matmuls stay sharded
    _pin = activation_constraint if activation_constraint is not None else (lambda a: a)

    if block_scan is not None:
        h = block_scan(params["blocks"], h, t_emb, mask, rope)
    elif adaln_mods is not None:
        def block_fn_mod(carry, bp_mod):
            bp, mod = bp_mod
            out = L.dit_block(
                bp, carry, None, cfg.heads, mask=mask, rope_freqs=rope,
                pe_attn_head=cfg.pe_attn_head, backend=backend, mod=mod,
            )
            return _pin(out), None

        if cfg.checkpoint_activations:
            block_fn_mod = jax.checkpoint(block_fn_mod, policy=remat_policy(cfg, tokens=b * n))
        h, _ = jax.lax.scan(block_fn_mod, h, (params["blocks"], adaln_mods[0].astype(h.dtype)))
    else:
        def block_fn(carry, bp):
            out = L.dit_block(
                bp, carry, t_emb, cfg.heads, mask=mask, rope_freqs=rope,
                pe_attn_head=cfg.pe_attn_head, backend=backend,
            )
            return _pin(out), None

        if cfg.checkpoint_activations:
            block_fn = jax.checkpoint(block_fn, policy=remat_policy(cfg, tokens=b * n))
        h, _ = jax.lax.scan(block_fn, h, params["blocks"])

    if activation_constraint is not None:
        h = activation_constraint(h)
    if residual is not None:
        h = L.linear(params["long_skip"], jnp.concatenate([h, residual], axis=-1))

    if adaln_mods is not None:
        h = L.adaln_final_from_mod(adaln_mods[1].astype(h.dtype), h)
    else:
        h = L.adaln_final(params["norm_out"], h, t_emb)
    return L.linear(params["proj_out"], h)


def forward_with_text(
    params,
    cfg: DiTConfig,
    x,
    cond,
    text_ids,
    time,
    mask=None,
    lens=None,
    drop_audio_cond: bool = False,
    drop_text: bool = False,
    backend: str = "auto",
    block_scan=None,
    activation_constraint=None,
):
    """Training-path forward matching reference DiT.forward(x, cond, text, time)
    (dit.py:319-370): text encoder runs inline with drop flags."""
    seq_len = x.shape[1]
    te = text_embedding(params, cfg, text_ids, seq_len, lens=lens, drop_text=drop_text)
    te = te.astype(x.dtype)
    return forward(
        params, cfg, x, cond, te, time, mask=mask, drop_audio_cond=drop_audio_cond,
        backend=backend, block_scan=block_scan, activation_constraint=activation_constraint,
    )


def forward_cfg(
    params,
    cfg: DiTConfig,
    x,
    step_cond,
    text_emb_cond,
    text_emb_uncond,
    time,
    mask=None,
    backend: str = "auto",
    block_scan=None,
    activation_constraint=None,
    adaln_mods=None,
):
    """Fused classifier-free-guidance forward: cond+uncond packed as one 2B
    batch (reference cfg_infer, dit.py:337-346).  Returns (pred, null_pred)."""
    b = x.shape[0]
    x2 = jnp.concatenate([x, x], axis=0)
    cond2 = jnp.concatenate([step_cond, jnp.zeros_like(step_cond)], axis=0)
    te2 = jnp.concatenate([text_emb_cond, text_emb_uncond], axis=0)
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))
    t2 = jnp.concatenate([time, time], axis=0)
    mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
    if adaln_mods is not None and adaln_mods[0].ndim == 3:
        # per-row mods ([depth, rows, 6*dim], [rows, 2*dim]) must double with
        # the packed cond‖uncond rows (shared-t mods broadcast and need not)
        adaln_mods = (
            jnp.concatenate([adaln_mods[0], adaln_mods[0]], axis=1),
            jnp.concatenate([adaln_mods[1], adaln_mods[1]], axis=0),
        )
    out = forward(params, cfg, x2, cond2, te2, t2, mask=mask2, backend=backend,
                  block_scan=block_scan, activation_constraint=activation_constraint,
                  adaln_mods=adaln_mods)
    return out[:b], out[b:]


def fuse_for_inference(params):
    """Serving-time param transform: fuse per-block q/k/v projections into one
    matmul (models/layers.py fuse_qkv).  Canonical (unfused) params remain the
    checkpoint format; call this after loading for inference."""
    out = dict(params)
    blocks = dict(params["blocks"])
    blocks["attn"] = L.fuse_qkv(params["blocks"]["attn"])
    out["blocks"] = blocks
    return out

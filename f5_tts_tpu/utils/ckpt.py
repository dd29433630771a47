"""Checkpoint interop: released PyTorch F5-TTS / Vocos weights <-> JAX pytrees.

Handles the reference's released formats (reference trainer.py:150-263,
infer/utils_infer.py:190-232):
- training ``.pt`` dicts {model_state_dict, ema_model_state_dict, update, ...}
- EMA-only ``.safetensors`` (released weights), keys prefixed ``ema_model.``
- Vocos ``pytorch_model.bin`` from charactr/vocos-mel-24khz

Layout mapping (torch -> here):
- Linear   weight [out, in]      -> kernel [in, out]
- Conv1d   weight [out, in/g, k] -> kernel [k, in/g, out]
- GRN      gamma/beta [1, 1, d]  -> [d]
- transformer_blocks.{i}.*       -> blocks.* stacked on a leading depth axis
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.models.configs import DiTConfig


# ---------------------------------------------------------------------------
# raw state-dict loading


def load_torch_state(path: str, use_ema: bool = True) -> dict[str, np.ndarray]:
    """Load a reference checkpoint file into {name: np.ndarray}.

    Mirrors reference load_checkpoint (utils_infer.py:190-232): safetensors are
    EMA-only releases; .pt dicts hold both raw and EMA weights and ``use_ema``
    picks which to load; ``ema_model.`` prefixes are stripped; EMA bookkeeping
    keys (initted/step/update) are dropped.
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(path)
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(obj, dict) and "ema_model_state_dict" in obj and use_ema:
            state = obj["ema_model_state_dict"]
        elif isinstance(obj, dict) and "model_state_dict" in obj:
            state = obj["model_state_dict"]
        else:
            state = obj
        state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in state.items()}
    out = {}
    for k, v in state.items():
        if k in ("initted", "step", "update", "ema_model.initted", "ema_model.step", "ema_model.update"):
            continue
        if k.startswith("ema_model."):
            k = k[len("ema_model.") :]
        # dropped legacy mel buffers (reference trainer.py:227-229)
        if k.startswith("mel_spec.") or k.endswith("freqs_cis") or k.endswith("inv_freq"):
            continue
        out[k] = np.asarray(v)
    return out


def _lin(state, name):
    p = {"kernel": jnp.asarray(state[f"{name}.weight"].T)}
    if f"{name}.bias" in state:
        p["bias"] = jnp.asarray(state[f"{name}.bias"])
    return p


def _conv(state, name):
    p = {"kernel": jnp.asarray(np.transpose(state[f"{name}.weight"], (2, 1, 0)))}
    if f"{name}.bias" in state:
        p["bias"] = jnp.asarray(state[f"{name}.bias"])
    return p


def _ln(state, name):
    return {"weight": jnp.asarray(state[f"{name}.weight"]), "bias": jnp.asarray(state[f"{name}.bias"])}


def _convnext_v2(state, name):
    return {
        "dwconv": _conv(state, f"{name}.dwconv"),
        "norm": _ln(state, f"{name}.norm"),
        "pwconv1": _lin(state, f"{name}.pwconv1"),
        "grn": {
            "gamma": jnp.asarray(state[f"{name}.grn.gamma"].reshape(-1)),
            "beta": jnp.asarray(state[f"{name}.grn.beta"].reshape(-1)),
        },
        "pwconv2": _lin(state, f"{name}.pwconv2"),
    }


# ---------------------------------------------------------------------------
# DiT


def dit_params_from_state(state: dict[str, np.ndarray], cfg: DiTConfig):
    """Reference CFM state dict (keys ``transformer.*``) or bare DiT state dict
    -> models.dit param pytree."""
    if any(k.startswith("transformer.") for k in state):
        state = {k[len("transformer.") :]: v for k, v in state.items() if k.startswith("transformer.")}

    def block(i):
        b = f"transformer_blocks.{i}"
        p = {
            "attn_norm": {"linear": _lin(state, f"{b}.attn_norm.linear")},
            "attn": {
                "to_q": _lin(state, f"{b}.attn.to_q"),
                "to_k": _lin(state, f"{b}.attn.to_k"),
                "to_v": _lin(state, f"{b}.attn.to_v"),
                "to_out": _lin(state, f"{b}.attn.to_out.0"),
            },
            "ff": {"in": _lin(state, f"{b}.ff.ff.0.0"), "out": _lin(state, f"{b}.ff.ff.2")},
        }
        if f"{b}.attn.q_norm.weight" in state:
            p["attn"]["q_norm"] = {"weight": jnp.asarray(state[f"{b}.attn.q_norm.weight"])}
            p["attn"]["k_norm"] = {"weight": jnp.asarray(state[f"{b}.attn.k_norm.weight"])}
        return p

    blocks = [block(i) for i in range(cfg.depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    text_p = {"embed": {"weight": jnp.asarray(state["text_embed.text_embed.weight"])}}
    if cfg.conv_layers > 0:
        text_p["blocks"] = [
            _convnext_v2(state, f"text_embed.text_blocks.{i}") for i in range(cfg.conv_layers)
        ]

    params = {
        "time_embed": {
            "mlp1": _lin(state, "time_embed.time_mlp.0"),
            "mlp2": _lin(state, "time_embed.time_mlp.2"),
        },
        "text_embed": text_p,
        "input_embed": {
            "proj": _lin(state, "input_embed.proj"),
            "conv_pos": {
                "conv1": _conv(state, "input_embed.conv_pos_embed.conv1d.0"),
                "conv2": _conv(state, "input_embed.conv_pos_embed.conv1d.2"),
            },
        },
        "blocks": stacked,
        "norm_out": {"linear": _lin(state, "norm_out.linear")},
        "proj_out": _lin(state, "proj_out"),
    }
    if "long_skip_connection.weight" in state:
        params["long_skip"] = {"kernel": jnp.asarray(state["long_skip_connection.weight"].T)}
    return params


def dit_params_to_state(params, cfg: DiTConfig, prefix: str = "") -> dict[str, np.ndarray]:
    """Inverse mapping (for interop/testing): pytree -> reference-named state."""
    out = {}

    def put_lin(name, p):
        out[f"{prefix}{name}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            out[f"{prefix}{name}.bias"] = np.asarray(p["bias"])

    def put_conv(name, p):
        out[f"{prefix}{name}.weight"] = np.transpose(np.asarray(p["kernel"]), (2, 1, 0))
        if "bias" in p:
            out[f"{prefix}{name}.bias"] = np.asarray(p["bias"])

    def put_ln(name, p):
        out[f"{prefix}{name}.weight"] = np.asarray(p["weight"])
        out[f"{prefix}{name}.bias"] = np.asarray(p["bias"])

    def put_cnx(name, p):
        put_conv(f"{name}.dwconv", p["dwconv"])
        put_ln(f"{name}.norm", p["norm"])
        put_lin(f"{name}.pwconv1", p["pwconv1"])
        out[f"{prefix}{name}.grn.gamma"] = np.asarray(p["grn"]["gamma"]).reshape(1, 1, -1)
        out[f"{prefix}{name}.grn.beta"] = np.asarray(p["grn"]["beta"]).reshape(1, 1, -1)
        put_lin(f"{name}.pwconv2", p["pwconv2"])

    put_lin("time_embed.time_mlp.0", params["time_embed"]["mlp1"])
    put_lin("time_embed.time_mlp.2", params["time_embed"]["mlp2"])
    out[f"{prefix}text_embed.text_embed.weight"] = np.asarray(params["text_embed"]["embed"]["weight"])
    for i, bp in enumerate(params["text_embed"].get("blocks", [])):
        put_cnx(f"text_embed.text_blocks.{i}", bp)
    put_lin("input_embed.proj", params["input_embed"]["proj"])
    put_conv("input_embed.conv_pos_embed.conv1d.0", params["input_embed"]["conv_pos"]["conv1"])
    put_conv("input_embed.conv_pos_embed.conv1d.2", params["input_embed"]["conv_pos"]["conv2"])
    for i in range(cfg.depth):
        bp = jax.tree.map(lambda x, i=i: x[i], params["blocks"])
        b = f"transformer_blocks.{i}"
        put_lin(f"{b}.attn_norm.linear", bp["attn_norm"]["linear"])
        for nm in ("to_q", "to_k", "to_v"):
            put_lin(f"{b}.attn.{nm}", bp["attn"][nm])
        put_lin(f"{b}.attn.to_out.0", bp["attn"]["to_out"])
        if "q_norm" in bp["attn"]:
            out[f"{prefix}{b}.attn.q_norm.weight"] = np.asarray(bp["attn"]["q_norm"]["weight"])
            out[f"{prefix}{b}.attn.k_norm.weight"] = np.asarray(bp["attn"]["k_norm"]["weight"])
        put_lin(f"{b}.ff.ff.0.0", bp["ff"]["in"])
        put_lin(f"{b}.ff.ff.2", bp["ff"]["out"])
    put_lin("norm_out.linear", params["norm_out"]["linear"])
    put_lin("proj_out", params["proj_out"])
    if "long_skip" in params:
        out[f"{prefix}long_skip_connection.weight"] = np.asarray(params["long_skip"]["kernel"]).T
    return out


# ---------------------------------------------------------------------------
# UNetT (E2-TTS)


def unett_params_from_state(state: dict[str, np.ndarray], cfg):
    """Reference UNetT state dict -> models.unett pytree.  Torch layout:
    layers.{i}.[0 skip_proj, 1 attn_norm(g), 2 attn, 3 ff_norm(g), 4 ff]
    (reference backbones/unett.py:149-183)."""
    if any(k.startswith("transformer.") for k in state):
        state = {k[len("transformer.") :]: v for k, v in state.items() if k.startswith("transformer.")}

    def attn(prefix):
        p = {
            "to_q": _lin(state, f"{prefix}.to_q"),
            "to_k": _lin(state, f"{prefix}.to_k"),
            "to_v": _lin(state, f"{prefix}.to_v"),
            "to_out": _lin(state, f"{prefix}.to_out.0"),
        }
        if f"{prefix}.q_norm.weight" in state:
            p["q_norm"] = {"weight": jnp.asarray(state[f"{prefix}.q_norm.weight"])}
            p["k_norm"] = {"weight": jnp.asarray(state[f"{prefix}.k_norm.weight"])}
        return p

    def block(i, with_skip):
        b = f"layers.{i}"
        p = {
            "attn_norm": {"g": jnp.asarray(state[f"{b}.1.g"])},
            "attn": attn(f"{b}.2"),
            "ff_norm": {"g": jnp.asarray(state[f"{b}.3.g"])},
            "ff": {"in": _lin(state, f"{b}.4.ff.0.0"), "out": _lin(state, f"{b}.4.ff.2")},
        }
        if with_skip:
            p["skip_proj"] = {"kernel": jnp.asarray(state[f"{b}.0.weight"].T)}
        return p

    half = cfg.depth // 2
    with_skip = cfg.skip_connect_type == "concat"
    first = [block(i, False) for i in range(half)]
    second = [block(half + i, with_skip) for i in range(half)]

    text_dim = cfg.text_dim or cfg.mel_dim
    del text_dim
    text_p = {"embed": {"weight": jnp.asarray(state["text_embed.text_embed.weight"])}}
    if cfg.conv_layers > 0:
        text_p["blocks"] = [
            _convnext_v2(state, f"text_embed.text_blocks.{i}") for i in range(cfg.conv_layers)
        ]
    return {
        "time_embed": {
            "mlp1": _lin(state, "time_embed.time_mlp.0"),
            "mlp2": _lin(state, "time_embed.time_mlp.2"),
        },
        "text_embed": text_p,
        "input_embed": {
            "proj": _lin(state, "input_embed.proj"),
            "conv_pos": {
                "conv1": _conv(state, "input_embed.conv_pos_embed.conv1d.0"),
                "conv2": _conv(state, "input_embed.conv_pos_embed.conv1d.2"),
            },
        },
        "first": jax.tree.map(lambda *xs: jnp.stack(xs), *first),
        "second": jax.tree.map(lambda *xs: jnp.stack(xs), *second),
        "norm_out": {"g": jnp.asarray(state["norm_out.g"])},
        "proj_out": _lin(state, "proj_out"),
    }


def mmdit_params_from_state(state: dict[str, np.ndarray], cfg):
    """Reference MMDiT state dict -> models.mmdit pytree
    (backbones/mmdit.py module layout; joint-attention projections incl.
    to_q_c/to_k_c/to_v_c and to_out_c)."""
    if any(k.startswith("transformer.") for k in state):
        state = {k[len("transformer.") :]: v for k, v in state.items() if k.startswith("transformer.")}

    def attn(prefix, pre_only):
        p = {
            "to_q": _lin(state, f"{prefix}.to_q"),
            "to_k": _lin(state, f"{prefix}.to_k"),
            "to_v": _lin(state, f"{prefix}.to_v"),
            "to_q_c": _lin(state, f"{prefix}.to_q_c"),
            "to_k_c": _lin(state, f"{prefix}.to_k_c"),
            "to_v_c": _lin(state, f"{prefix}.to_v_c"),
            "to_out": _lin(state, f"{prefix}.to_out.0"),
        }
        if not pre_only:
            p["to_out_c"] = _lin(state, f"{prefix}.to_out_c")
        if f"{prefix}.q_norm.weight" in state:
            for nm in ("q_norm", "k_norm", "c_q_norm", "c_k_norm"):
                p[nm] = {"weight": jnp.asarray(state[f"{prefix}.{nm}.weight"])}
        return p

    def block(i):
        b = f"transformer_blocks.{i}"
        pre_only = i == cfg.depth - 1
        p = {
            "attn_norm_x": {"linear": _lin(state, f"{b}.attn_norm_x.linear")},
            "attn_norm_c": {"linear": _lin(state, f"{b}.attn_norm_c.linear")},
            "attn": attn(f"{b}.attn", pre_only),
            "ff_x": {"in": _lin(state, f"{b}.ff_x.ff.0.0"), "out": _lin(state, f"{b}.ff_x.ff.2")},
        }
        if not pre_only:
            p["ff_c"] = {"in": _lin(state, f"{b}.ff_c.ff.0.0"), "out": _lin(state, f"{b}.ff_c.ff.2")}
        return p

    mids = [block(i) for i in range(cfg.depth - 1)]
    return {
        "time_embed": {
            "mlp1": _lin(state, "time_embed.time_mlp.0"),
            "mlp2": _lin(state, "time_embed.time_mlp.2"),
        },
        "text_embed": {"embed": {"weight": jnp.asarray(state["text_embed.text_embed.weight"])}},
        "audio_embed": {
            "proj": _lin(state, "audio_embed.linear"),
            "conv_pos": {
                "conv1": _conv(state, "audio_embed.conv_pos_embed.conv1d.0"),
                "conv2": _conv(state, "audio_embed.conv_pos_embed.conv1d.2"),
            },
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *mids),
        "last_block": block(cfg.depth - 1),
        "norm_out": {"linear": _lin(state, "norm_out.linear")},
        "proj_out": _lin(state, "proj_out"),
    }


def params_from_state(state: dict[str, np.ndarray], arch_cfg):
    """Backbone-dispatching converter."""
    from f5_tts_tpu.models.configs import DiTConfig, MMDiTConfig, UNetTConfig

    if isinstance(arch_cfg, DiTConfig):
        return dit_params_from_state(state, arch_cfg)
    if isinstance(arch_cfg, UNetTConfig):
        return unett_params_from_state(state, arch_cfg)
    if isinstance(arch_cfg, MMDiTConfig):
        return mmdit_params_from_state(state, arch_cfg)
    raise ValueError(f"no converter for {type(arch_cfg)}")


# ---------------------------------------------------------------------------
# Vocos


def vocos_params_from_state(state: dict[str, np.ndarray], num_layers: int = 8):
    """charactr/vocos-mel-24khz state dict -> models.vocos param pytree.

    Only backbone/head keys are read; ``feature_extractor.*`` entries (absent
    from released mel bundles, present-but-partial in Encodec bundles — the
    case reference utils_infer.py:110-124 special-cases by back-filling
    ``feature_extractor.encodec.*`` before a strict load) are ignored by
    construction: the feature extractor is an encode-side module never used
    for mel->wav decoding."""
    blocks = []
    for i in range(num_layers):
        b = f"backbone.convnext.{i}"
        blocks.append(
            {
                "dwconv": _conv(state, f"{b}.dwconv"),
                "norm": _ln(state, f"{b}.norm"),
                "pwconv1": _lin(state, f"{b}.pwconv1"),
                "pwconv2": _lin(state, f"{b}.pwconv2"),
                "gamma": jnp.asarray(state[f"{b}.gamma"]),
            }
        )
    return {
        "embed": _conv(state, "backbone.embed"),
        "norm": _ln(state, "backbone.norm"),
        "blocks": blocks,
        "final_norm": _ln(state, "backbone.final_layer_norm"),
        "head": _lin(state, "head.out"),
    }


# ---------------------------------------------------------------------------
# BigVGAN


def _fused_weight(state: dict, name: str) -> np.ndarray:
    """Fuse torch weight_norm (weight_g/weight_v, dim=0) if present."""
    if f"{name}.weight" in state:
        return state[f"{name}.weight"]
    v = state[f"{name}.weight_v"]
    g = state[f"{name}.weight_g"]
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def bigvgan_params_from_state(state: dict[str, np.ndarray], cfg=None):
    """nvidia/bigvgan_v2_* generator state dict -> models.bigvgan pytree.
    Handles weight-norm (weight_g/weight_v) checkpoints (pre remove_weight_norm)."""
    from f5_tts_tpu.models.bigvgan import BigVGANConfig

    cfg = cfg or BigVGANConfig()

    def conv(name):
        w = _fused_weight(state, name)  # [out, in, k]
        p = {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0)))}
        if f"{name}.bias" in state:
            p["bias"] = jnp.asarray(state[f"{name}.bias"])
        return p

    def convT(name):
        w = _fused_weight(state, name)  # torch ConvTranspose1d: [in, out, k]
        p = {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0)))}  # [k, out, in]
        if f"{name}.bias" in state:
            p["bias"] = jnp.asarray(state[f"{name}.bias"])
        return p

    n_res = len(cfg.resblock_kernel_sizes)
    params = {"conv_pre": conv("conv_pre")}
    ups, resblocks = [], []
    for i in range(len(cfg.upsample_rates)):
        ups.append(convT(f"ups.{i}.0"))
        stage = []
        for j in range(n_res):
            r = f"resblocks.{i * n_res + j}"
            n_d = len(cfg.resblock_dilation_sizes[j])
            stage.append({
                "convs1": [conv(f"{r}.convs1.{m}") for m in range(n_d)],
                "convs2": [conv(f"{r}.convs2.{m}") for m in range(n_d)],
                "alpha": jnp.stack([
                    jnp.asarray(state[f"{r}.activations.{m}.act.alpha"]) for m in range(2 * n_d)
                ]),
                "beta": jnp.stack([
                    jnp.asarray(state[f"{r}.activations.{m}.act.beta"]) for m in range(2 * n_d)
                ]),
            })
        resblocks.append(stage)
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["post_alpha"] = jnp.asarray(state["activation_post.act.alpha"])
    params["post_beta"] = jnp.asarray(state["activation_post.act.beta"])
    params["conv_post"] = conv("conv_post")
    return params


def expand_text_embedding(params, new_vocab_size: int, seed: int = 0):
    """Grow the text embedding table for an extended vocab (reference
    finetune_gradio expand_model_embeddings:974-1012): existing rows are kept,
    new rows init N(0, 0.02).  new_vocab_size excludes the +1 filler row."""
    emb = params["text_embed"]["embed"]["weight"]
    target_rows = new_vocab_size + 1
    if emb.shape[0] >= target_rows:
        return params
    extra = jax.random.normal(
        jax.random.PRNGKey(seed), (target_rows - emb.shape[0], emb.shape[1]), emb.dtype
    ) * 0.02
    new_emb = jnp.concatenate([emb, extra], axis=0)
    out = dict(params)
    out["text_embed"] = dict(params["text_embed"])
    out["text_embed"]["embed"] = {"weight": new_emb}
    return out


# ---------------------------------------------------------------------------
# native (JAX-side) snapshots


def export_safetensors(params, arch_cfg, path: str, ema_prefix: bool = True) -> None:
    """Export a (DiT) pytree to a reference-format .safetensors release file —
    models finetuned here load back into the PyTorch ecosystem unchanged.
    Fused-qkv serving params are not exportable; pass canonical params."""
    from safetensors.numpy import save_file

    state = dit_params_to_state(params, arch_cfg, prefix="transformer.")
    if ema_prefix:
        state = {"ema_model." + k: np.ascontiguousarray(v) for k, v in state.items()}
    else:
        state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    save_file(state, path)


def save_pytree(params, path: str) -> None:
    """Flat .npz snapshot of a pytree (inference weights interchange)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_pytree(template, path: str):
    """Load a .npz snapshot back into the structure of ``template``."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [jnp.asarray(data[jax.tree_util.keystr(kp)]) for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def params_astype(params, dtype):
    """Cast floating leaves (fp32 master weights -> bf16 inference weights)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, params
    )

"""Device mesh + sharding rules.

Replaces the reference's NCCL DDP / TRT-LLM TP plumbing (SURVEY §2.7) with the
JAX-native recipe: one ``jax.sharding.Mesh`` with ``data`` and ``model`` axes;
parameters get Megatron-style PartitionSpecs (attention/FF column-row splits),
activations/batches shard on ``data``; XLA inserts the all-reduces over ICI.

Reference TP precedent being replaced: ColumnLinear/RowLinear + allreduce
workspace in runtime/triton_trtllm/patch/f5tts/modules.py:147-185 and the
q/k/v column, to_out row splits in scripts/convert_checkpoint.py:169-193.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"  # pipeline stages (parallel/pipeline.py)
SEQ_AXIS = "seq"  # sequence/context parallelism (parallel/sequence.py)


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Mesh over available devices: [data, model].  data defaults to
    n_devices // model."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} exceeds {n} devices"
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def make_train_mesh(
    data: int | None = None, model: int = 1, pipe: int = 1, seq: int = 1, devices=None
) -> Mesh:
    """General training mesh. Axis order outer->inner: data, pipe, seq, model
    — TP collectives (highest bandwidth) ride the innermost axis, pipeline
    ppermutes (point-to-point) sit outside. ``pipe``/``seq`` axes are only
    materialized when their degree > 1, so the common 2-axis case stays
    byte-identical to :func:`make_mesh`."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (model * pipe * seq)
    total = data * pipe * seq * model
    assert total <= n, f"mesh {data}x{pipe}x{seq}x{model} exceeds {n} devices"
    shape = [data]
    names = [DATA_AXIS]
    if pipe > 1:
        shape.append(pipe)
        names.append(PIPE_AXIS)
    if seq > 1:
        shape.append(seq)
        names.append(SEQ_AXIS)
    shape.append(model)
    names.append(MODEL_AXIS)
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(names))


# column-parallel projections (shard OUTPUT features): attention q/k/v — both
# the audio stream and MMDiT's text-stream *_c variants — and FF input layers
# (DiT/UNetT 'ff', MMDiT 'ff_x'/'ff_c')
_COL_KEYS = ("'to_q'", "'to_k'", "'to_v'", "'to_q_c'", "'to_k_c'", "'to_v_c'")
_FF_KEYS = ("'ff'", "'ff_x'", "'ff_c'")
# stacked-depth containers whose leaves carry a leading depth axis: DiT/MMDiT
# scan stacks ('blocks', excluding text_embed's ConvNeXt list) and UNetT's two
# scan-stacked halves
_STACKED_KEYS = ("'blocks'", "'first'", "'second'")


def _tp_param_spec(path: str) -> P:
    """Megatron-style tensor-parallel spec for a backbone param leaf.

    Column-parallel (shard output features): attn to_q/to_k/to_v(_c), ff.in.
    Row-parallel (shard input features): attn to_out(_c), ff.out.
    Everything else (embeddings, norms, AdaLN, projections) replicates —
    they are either tiny or feature-interleaved (AdaLN's 6*dim chunks).
    """
    is_ff = any(k in path for k in _FF_KEYS)
    if any(k in path for k in _COL_KEYS) or (is_ff and "'in'" in path):
        if "'kernel'" in path:
            return P(None, MODEL_AXIS)
        if "'bias'" in path:
            return P(MODEL_AXIS)
    if ("'to_out'" in path or "'to_out_c'" in path or (is_ff and "'out'" in path)) and "'kernel'" in path:
        return P(MODEL_AXIS, None)
    return P()


def backbone_param_specs(params) -> dict:
    """Pytree of PartitionSpecs for any backbone's params (DiT, UNetT, MMDiT);
    the leading stacked-depth axis on scan-stacked leaves is never sharded
    here (the pipeline axis shards it — parallel/pipeline.py)."""

    def spec_for(kp, leaf):
        path = jax.tree_util.keystr(kp)
        s = _tp_param_spec(path)
        if s != P() and any(k in path for k in _STACKED_KEYS) and "'text_embed'" not in path:
            # stacked depth axis in front
            return P(None, *s)
        return s

    return jax.tree_util.tree_map_with_path(spec_for, params)


# historical name (round-1 API); the specs were always path-pattern based and
# now cover all backbones
dit_param_specs = backbone_param_specs


def shard_params(params, mesh: Mesh, specs=None):
    """Place params on the mesh (replicated by default, TP if specs given)."""
    if specs is None:
        specs = jax.tree.map(lambda _: P(), params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def zero1_state_specs(opt_state, mesh: Mesh):
    """ZeRO-1: shard optimizer-state arrays (Adam m/v etc.) over the ``data``
    axis — each data-parallel worker owns 1/dp of the optimizer moments, XLA
    all-gathers the applied updates.  Arrays whose leading axis doesn't divide
    by dp (scalars, counts) replicate."""
    dp = mesh.shape[DATA_AXIS]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] % dp == 0 and shape[0] > 0:
            return P(DATA_AXIS, *([None] * (len(shape) - 1)))
        return P()

    return jax.tree.map(spec, opt_state)


def shard_opt_state(opt_state, mesh: Mesh):
    specs = zero1_state_specs(opt_state, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), opt_state, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

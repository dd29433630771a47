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


def _dit_param_spec(path: str) -> P:
    """Megatron-style tensor-parallel spec for a DiT param leaf.

    Column-parallel (shard output features): attn to_q/to_k/to_v, ff.in.
    Row-parallel (shard input features): attn to_out, ff.out.
    Everything else (embeddings, norms, AdaLN, projections) replicates —
    they are either tiny or feature-interleaved (AdaLN's 6*dim chunks).
    """
    if any(k in path for k in ("'to_q'", "'to_k'", "'to_v'")) or "'ff'" in path and "'in'" in path:
        if "'kernel'" in path:
            return P(None, MODEL_AXIS)
        if "'bias'" in path:
            return P(MODEL_AXIS)
    if ("'to_out'" in path or ("'ff'" in path and "'out'" in path)) and "'kernel'" in path:
        return P(MODEL_AXIS, None)
    return P()


def dit_param_specs(params) -> dict:
    """Pytree of PartitionSpecs for the DiT params (leading stacked-depth axis
    on block leaves is never sharded)."""

    def spec_for(kp, leaf):
        path = jax.tree_util.keystr(kp)
        s = _dit_param_spec(path)
        if "'blocks'" in path and s != P():
            # stacked depth axis in front
            return P(None, *s)
        return s

    return jax.tree_util.tree_map_with_path(spec_for, params)


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

"""Sequence (context) parallelism: shard the mel-frame axis over a ``seq``
mesh axis.

Unlike pipeline parallelism (parallel/pipeline.py, manual shard_map) this is
expressed the XLA-native way: activations get a
``jax.lax.with_sharding_constraint`` pinning [batch, frames, dim] to
``P(data, seq, None)`` and GSPMD propagates it through the position-wise ops
(linears, norms, FF, convs) for free, inserting the all-gather / reduce-scatter
pair only around attention's [n, n] contraction — exactly where communication
is mathematically required.

This is the long-context axis: a 4096-frame bucket's attention scores are
4096^2 * heads * batch; sequence-sharding divides both that memory and the QK/
AV FLOPs per chip. For attention itself use ``parallel/ring.py``'s ring
backend (KV chunks rotate over ICI with ppermute; flash block primitive on
TPU) — the plain SDPA backend also works under sp but GSPMD then all-gathers
full KV around the [n, n] contraction.

The reference has no sequence-parallel counterpart (its TRT engines are
single-GPU per replica); capability beyond the reference.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from f5_tts_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS  # noqa: F401


def make_sp_mesh(data: int = 1, seq: int = 2, model: int = 1, devices=None) -> Mesh:
    """3-axis mesh [data, seq, model]."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert data * seq * model <= n, f"mesh {data}x{seq}x{model} exceeds {n} devices"
    dev = np.asarray(devices[: data * seq * model]).reshape(data, seq, model)
    return Mesh(dev, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def activation_spec(mesh: Mesh) -> P:
    """PartitionSpec for [b, n, d] activations on this mesh: batch on data,
    frames on seq (when present), features replicated (TP lives in the
    weights; XLA reduce-scatters matmul outputs as needed)."""
    axes = mesh.axis_names
    return P(
        DATA_AXIS if DATA_AXIS in axes else None,
        SEQ_AXIS if SEQ_AXIS in axes else None,
        None,
    )


def make_seq_constraint(mesh: Mesh):
    """Build the ``activation_constraint`` hook for ``dit.forward``: pins
    hidden states to the data/seq sharding so GSPMD keeps the frame axis
    sharded through the block stack."""
    spec = activation_spec(mesh)
    sharding = jax.sharding.NamedSharding(mesh, spec)

    def constrain(h):
        return jax.lax.with_sharding_constraint(h, sharding)

    return constrain

"""Multi-host initialization (replaces the reference's `accelerate launch` /
NCCL process-group setup, reference trainer.py:57-68, benchmark.py:199-212).

On Cloud TPU pods, `jax.distributed.initialize()` picks up the TPU runtime's
coordinator automatically; on other clusters pass coordinator/num/id
explicitly.  After init, the global mesh spans all hosts' devices and data
loading shards by process (each host feeds its slice of the batch)."""

from __future__ import annotations

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> dict:
    """Initialize the multi-host runtime; returns topology info."""
    if num_processes is not None or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-host / already initialized
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this host's shard of a globally-sized batch — the
    data-loading counterpart of batch sharding on the ``data`` mesh axis."""
    per = global_batch // jax.process_count()
    return jax.process_index() * per, per

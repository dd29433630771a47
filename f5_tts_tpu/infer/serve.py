"""Batched multi-utterance serving: data-parallel sharding over the ICI mesh.

BASELINE config 5: the 26-prompt benchmark set sharded over ICI, batch >= 8.
The reference serves via Triton dynamic batching + per-GPU engines
(runtime/triton_trtllm/config.pbtxt, client_grpc.py); here one jitted graph
runs a [B, n, d] batch with B sharded on the mesh ``data`` axis — XLA splits
the batch across chips, no collectives needed in the forward (pure DP).

Also provides the RTF/latency report in the reference benchmark's format
(benchmark.py:454-468, client_grpc.py:425-447).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import numpy as np

from f5_tts_tpu.infer.engine import InferenceEngine, pick_bucket
from f5_tts_tpu.parallel.mesh import DATA_AXIS


@dataclass
class Request:
    ref_mel: np.ndarray  # [n_ref, d]
    text_ids: np.ndarray  # [nt]
    duration: int  # total frames
    seed: int = 0


class BatchServer:
    """Groups requests into fixed-size DP-sharded batches and runs the engine.

    Requests are bucketed by duration (like the reference eval's
    get_inference_prompt bucketing, utils_eval.py:72-205) so one graph serves
    each (batch, bucket) pair.

    ORDERING: construct the BatchServer BEFORE warming the engine.  With
    ``sequence_parallel=True`` the constructor replaces ``engine.options``
    and ``engine.parallel_hooks`` (ring-attention backend + seq sharding
    constraint); graphs compiled earlier via ``engine.warmup_all()`` used
    the non-parallel backend and would be silently discarded.  Use
    ``BatchServer.warmup_all(...)`` which compiles under the mesh with the
    installed hooks.
    """

    def __init__(self, engine: InferenceEngine, mesh=None, batch_size: int = 8,
                 tensor_parallel: bool = False, sequence_parallel: bool = False):
        self.engine = engine
        self.mesh = mesh
        self.batch_size = batch_size
        if mesh is not None:
            if sequence_parallel and "seq" in mesh.axis_names:
                # context-parallel serving: shard the mel-frame axis across
                # the 'seq' mesh axis (long-form buckets' O(n^2) attention
                # memory divides across chips; parallel/sequence.py)
                import dataclasses as _dc

                from f5_tts_tpu.parallel.sequence import make_seq_constraint

                from f5_tts_tpu.parallel.ring import make_ring_attention

                self.engine.parallel_hooks = (None, make_seq_constraint(mesh))
                # ring attention keeps each frame shard's KV resident and
                # rotates chunks over ICI (parallel/ring.py) — replaces the
                # earlier GSPMD-SDPA fallback that all-gathered full KV;
                # 'auto' uses the Pallas flash block primitive on TPU
                self.engine.options = _dc.replace(
                    self.engine.options,
                    backend=make_ring_attention(mesh, block_impl="auto"),
                )
            dp = mesh.shape[DATA_AXIS]
            assert batch_size % dp == 0, f"batch {batch_size} must divide over data axis {dp}"
            if dp > 1 and not self.engine.options.convpos_taps:
                # GSPMD runs grouped convs replicated at the full batch under
                # a data mesh (docs/parallelism.md caveat); the einsum-tap
                # impl shards.  Static in EngineOptions => its own jit cache
                # entry, thread-safe under overlap workers.
                import dataclasses as _dc2

                self.engine.options = _dc2.replace(
                    self.engine.options, convpos_taps=True
                )
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
            self._replicated = NamedSharding(mesh, P())
            if tensor_parallel and mesh.shape.get("model", 1) > 1:
                assert not getattr(engine, "fused_qkv", False), (
                    "tensor_parallel sharding needs separate q/k/v projections;"
                    " create the engine with fuse_qkv=False"
                )
                # Megatron-style weight sharding over the model axis; XLA
                # inserts the all-reduces (replaces TRT ColumnLinear/RowLinear)
                from f5_tts_tpu.parallel.mesh import dit_param_specs, shard_params

                specs = dit_param_specs(self.engine.dit_params)
                self.engine.dit_params = shard_params(self.engine.dit_params, mesh, specs)
            else:
                self.engine.dit_params = jax.device_put(self.engine.dit_params, self._replicated)
            if self.engine.vocoder_params is not None:
                self.engine.vocoder_params = jax.device_put(self.engine.vocoder_params, self._replicated)

    def _put(self, arr):
        if self.mesh is None:
            return arr
        return jax.device_put(arr, self._batch_sharding)

    def run(self, requests: list[Request], fetch_mel: bool = False, overlap: int = 2):
        """Processes all requests; returns (wavs, per_batch_latencies).

        ``overlap`` batches run concurrently (dispatch of batch i+1 overlaps
        the host fetch of batch i — the concurrency-2 serving pattern of the
        reference's headline benchmark, README.md:131-138)."""
        from concurrent.futures import ThreadPoolExecutor

        order = sorted(range(len(requests)), key=lambda i: requests[i].duration)
        wavs: dict[int, np.ndarray] = {}
        latencies = []
        eng = self.engine
        B = self.batch_size
        groups = [order[s : s + B] for s in range(0, len(order), B)]

        def run_group(grp):
            reqs = [requests[i] for i in grp]
            pad = B - len(reqs)
            reqs = reqs + [reqs[-1]] * pad  # pad batch with a repeat
            t0 = time.perf_counter()
            if self.mesh is not None:
                # the mesh context is THREAD-LOCAL: enter it per worker thread
                # so overlapped batches work under a mesh too (round-1 had to
                # disable overlap because the context lived on the caller)
                with self.mesh:
                    _, ws, _ = self._run_sharded(reqs)
            else:
                _, ws, _ = eng.generate_batch(
                    [r.ref_mel for r in reqs], [r.text_ids for r in reqs],
                    [r.duration for r in reqs], seeds=[r.seed for r in reqs],
                    fetch_mel=fetch_mel,
                )
            return grp, ws, time.perf_counter() - t0

        if overlap > 1 and len(groups) > 1:
            with ThreadPoolExecutor(max_workers=overlap) as ex:
                for grp, ws, lat in ex.map(run_group, groups):
                    latencies.append(lat)
                    for j, i in enumerate(grp):
                        wavs[i] = ws[j]
        else:
            for grp in groups:
                g, ws, lat = run_group(grp)
                latencies.append(lat)
                for j, i in enumerate(g):
                    wavs[i] = ws[j]
        return [wavs[i] for i in range(len(requests))], latencies

    def _run_sharded(self, reqs: list[Request]):
        """generate_batch with inputs placed on the mesh (batch on data axis)."""
        import jax.numpy as jnp

        from f5_tts_tpu.infer.engine import _sample_and_decode

        eng = self.engine
        d = eng.model_cfg.mel.n_mel_channels
        n = pick_bucket(max(r.duration for r in reqs), eng.buckets)
        b = len(reqs)
        cond = np.zeros((b, n, d), np.float32)
        lens = np.zeros((b,), np.int32)
        text_ids = np.full((b, n), -1, np.int32)
        for i, r in enumerate(reqs):
            cond[i, : len(r.ref_mel)] = r.ref_mel
            lens[i] = len(r.ref_mel)
            t = r.text_ids[: n]
            text_ids[i, : len(t)] = t
        from f5_tts_tpu.infer.engine import _clamp_duration

        duration = _clamp_duration(
            np.asarray([r.duration for r in reqs], np.int32), text_ids, lens, n
        )
        seeds = np.asarray([r.seed for r in reqs], np.int32)
        mel_out, wav = _sample_and_decode(
            eng.dit_params, eng.vocoder_params, eng.model_cfg, eng.options,
            self._put(jnp.asarray(cond, dtype=eng.dtype)),
            self._put(jnp.asarray(text_ids)),
            self._put(jnp.asarray(lens)),
            self._put(jnp.asarray(duration)),
            self._put(jnp.asarray(seeds)),
            decode=eng.vocoder_params is not None,
            vocoder_type=eng.vocoder_type,
            vocoder_cfg=eng.vocoder_cfg,
            hooks=eng.parallel_hooks,
        )
        wavs, gen_frames = eng._trim_wavs(wav, duration, lens)
        return None, wavs, gen_frames

    def warmup_all(self, buckets=None, warm_crops: bool = True) -> None:
        """Pre-compile the sharded serving graph for every bucket THROUGH this
        server (under the mesh, with the installed parallel hooks) — the
        ordering-safe counterpart of ``engine.warmup_all()``.

        ``warm_crops`` additionally compiles every 128-frame crop-slice
        executable of the fetch path (engine._trim_wavs) against the real
        production output array of each bucket, so short generations don't
        first-hit-compile at request time.  The per-slice programs are tiny
        and land in the persistent compile cache; skip with
        ``warm_crops=False`` for the fastest possible warmup."""
        eng = self.engine
        d = eng.model_cfg.mel.n_mel_channels
        for n in buckets or eng.buckets:
            req = Request(
                ref_mel=np.zeros((n // 4, d), np.float32),
                text_ids=np.zeros((min(64, n),), np.int32),
                duration=n - 1,
            )
            eng._stash_next_wav = warm_crops
            eng._stash_wav_dev = None
            try:
                self.run([req] * self.batch_size, overlap=1)
                arr = getattr(eng, "_stash_wav_dev", None)
                if warm_crops and arr is not None and arr.ndim == 2:
                    S = arr.shape[1]
                    crops = sorted({
                        min(f * eng.hop, S) for f in range(128, n + 1, 128)
                    })
                    for crop_s in crops:
                        if crop_s < S:  # same slice _trim_wavs takes
                            np.asarray(arr[:, :crop_s])
            finally:
                eng._stash_next_wav = False
                eng._stash_wav_dev = None


def rtf_report(wavs: list[np.ndarray], latencies: list[float], sample_rate: int = 24_000) -> dict:
    """Reference-format report: RTF = total wall / total audio seconds,
    latency mean + p50/90/95/99 (benchmark.py:454-468, client_grpc.py:425-447)."""
    total_audio = sum(len(w) for w in wavs) / sample_rate
    total_wall = sum(latencies)
    lat_ms = np.asarray(latencies) * 1000.0
    return {
        "total_audio_s": total_audio,
        "total_wall_s": total_wall,
        "rtf": total_wall / max(total_audio, 1e-9),
        "latency_ms_mean": float(lat_ms.mean()),
        "latency_ms_p50": float(np.percentile(lat_ms, 50)),
        "latency_ms_p90": float(np.percentile(lat_ms, 90)),
        "latency_ms_p95": float(np.percentile(lat_ms, 95)),
        "latency_ms_p99": float(np.percentile(lat_ms, 99)),
    }

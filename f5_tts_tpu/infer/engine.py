"""Inference engine: the bucketed, jit-compiled text->waveform graph.

This is the TPU replacement for the reference's TRT-LLM engine + Triton stack
(runtime/triton_trtllm/): ONE compiled XLA program per (bucket, NFE) contains
ref-mel extraction consumers, both CFG text-embed streams, the whole NFE Euler
loop, and the Vocos vocoder — no per-step dispatch, no separate vocoder engine.

Static-shape strategy: target durations are rounded up to a small set of frame
buckets; every dynamic length (ref frames, total duration) is masked in-graph.
Noise is drawn per-sample from a folded seed so results are batch-size
invariant (the property the reference gets via per-sample torch seeding,
cfm.py:194-201).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.models import cfm, vocos
from f5_tts_tpu.models.configs import ModelConfig
from f5_tts_tpu.ops.mel import MelConfig, log_mel_prepadded, num_frames, stft_pad_amount
from f5_tts_tpu.utils.ckpt import params_astype

SILENCE_FLOOR = float(np.log(1e-5))

DEFAULT_BUCKETS = (256, 512, 768, 1024, 1536, 2048, 3072, 4096)


def pick_bucket(n: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"duration {n} frames exceeds the largest bucket {buckets[-1]}")


@dataclass(frozen=True)
class EngineOptions:
    """Static knobs baked into each compiled graph."""

    nfe_step: int = 32
    cfg_strength: float = 2.0
    sway_sampling_coef: float | None = -1.0
    use_epss: bool = True
    ode_method: str = "euler"  # "euler" | "midpoint" (reference cfm.py:42)
    backend: str = "auto"  # attention backend
    # W8A8 int8 DiT block linears (Pallas kernel, ops/quant.py) — experimental
    # serving option, quality-gate with scripts/quant_ab.py before production
    quantize: bool = False
    # time-parallel (Picard) ODE integration: solve W Euler steps per sweep as
    # one W*b-row forward instead of W sequential model calls (models/cfm.py
    # _picard_integrate).  0 = sequential NFE scan (default).  A/B with
    # scripts/picard_ab.py before enabling — a latency lever for multi-chip
    # meshes (the window rows shard over `data`), not a single-chip win.
    time_parallel_window: int = 0
    picard_tol: float = 1e-3
    # ConvPositionEmbedding via the GSPMD-shardable einsum-tap formulation
    # (models/layers.py _grouped_conv1d_taps).  Enable for data-parallel mesh
    # serving: GSPMD runs grouped convolutions replicated at the FULL batch on
    # every device otherwise.  Single-chip default keeps the tuned
    # Pallas/grouped-conv path.  BatchServer turns this on automatically.
    convpos_taps: bool = False

    def sample_opts(self) -> cfm.SampleOptions:
        return cfm.SampleOptions(
            steps=self.nfe_step,
            cfg_strength=self.cfg_strength,
            sway_sampling_coef=self.sway_sampling_coef,
            use_epss=self.use_epss,
            ode_method=self.ode_method,
            time_parallel_window=self.time_parallel_window,
            picard_tol=self.picard_tol,
        )



def _clamp_duration(duration, text_ids, lens, n):
    """Mirror cfm.sample's host-visible duration rule (cfm.py:135-138):
    at least max(text_len, ref_len) + 1, at most the bucket."""
    text_len = np.sum(np.asarray(text_ids) != -1, axis=-1)
    duration = np.maximum(np.maximum(text_len, lens) + 1, duration)
    return np.minimum(duration, n).astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("model_cfg", "opts", "decode", "vocoder_type", "vocoder_cfg", "hooks"),
)
def _sample_and_decode(
    dit_params,
    voc_params,
    model_cfg: ModelConfig,
    opts: EngineOptions,
    cond,  # [b, n, d]
    text_ids,  # [b, n]
    lens,  # [b] ref frames
    duration,  # [b] total frames
    seeds,  # [b] int32
    decode: bool = True,
    vocoder_type: str = "vocos",
    vocoder_cfg=None,  # VocosConfig | BigVGANConfig | None (defaults)
    hooks=(None, None),  # (block_scan, activation_constraint) — pipeline /
    # sequence-parallel serving (parallel/{pipeline,sequence}.py); static
    # closures, hashed by identity into the graph cache key
):
    b, n, d = cond.shape

    def noise_one(seed):
        return jax.random.normal(jax.random.PRNGKey(seed), (n, d), dtype=jnp.float32)

    noise = jax.vmap(noise_one)(seeds).astype(cond.dtype)
    # the convpos impl switch is thread-local and read while THIS body traces;
    # opts is a static jit arg, so the choice is part of the cache key
    from f5_tts_tpu.models.layers import set_convpos_impl

    prev_impl = set_convpos_impl("taps" if opts.convpos_taps else "auto")
    try:
        mel_out = cfm.sample(
            dit_params,
            model_cfg.arch,
            cond,
            text_ids,
            duration,
            noise,
            lens=lens,
            opts=opts.sample_opts(),
            backend=opts.backend,
            block_scan=hooks[0],
            activation_constraint=hooks[1],
            time_parallel_mesh=hooks[2] if len(hooks) > 2 else None,
        )
    finally:
        set_convpos_impl(prev_impl)
    if not decode or voc_params is None:
        return mel_out, None
    # roll the generated region to the front per sample, pad tail with the
    # log-mel silence floor so the vocoder OLA tail stays silent
    gen_len = duration - lens

    def roll_one(m, shift):
        return jnp.roll(m, -shift, axis=0)

    gen_mel = jax.vmap(roll_one)(mel_out, lens)
    keep = jnp.arange(n)[None, :] < gen_len[:, None]
    gen_mel = jnp.where(keep[..., None], gen_mel, SILENCE_FLOOR)
    if vocoder_type == "bigvgan":
        from f5_tts_tpu.models import bigvgan

        wav = bigvgan.decode(voc_params, gen_mel.astype(jnp.float32),
                             vocoder_cfg or bigvgan.BigVGANConfig())
    else:
        # lens-masked decode == decoding each sample's exact-length mel
        wav = vocos.decode(voc_params, gen_mel.astype(jnp.float32),
                           vocoder_cfg or vocos.VocosConfig(), lens=gen_len)
    # int16 on the wire: the host<->device link is the serving bottleneck
    # (reference ships float32 over gRPC; we halve-and-halve the bytes)
    wav_i16 = (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    return mel_out, wav_i16


@functools.partial(jax.jit, static_argnames=("mel_cfg",))
def _ref_mel(wav_padded, mel_cfg: MelConfig):
    return log_mel_prepadded(wav_padded, mel_cfg)


@functools.partial(
    jax.jit,
    static_argnames=("model_cfg", "opts", "decode", "vocoder_type", "vocoder_cfg", "n", "hooks"),
)
def _sample_and_decode_from_wav(
    dit_params,
    voc_params,
    model_cfg: ModelConfig,
    opts: EngineOptions,
    wav_i16,  # [b, S_ref] int16 host-reflect-padded ref wavs (ref-length bucket)
    wav_scale,  # [b] f32: per-sample dequant scale (peak-normalized int16)
    lens,  # [b] ref frames
    text_ids,  # [b, n]
    duration,  # [b]
    seeds,  # [b]
    n: int,  # mel bucket (frames)
    decode: bool = True,
    vocoder_type: str = "vocos",
    vocoder_cfg=None,
    hooks=(None, None),
):
    """Fully fused path: ref-audio mel extraction + CFM sampling + vocoder in
    ONE graph call — one host<->device round trip per utterance batch (the
    split path costs two; the reference's Triton server does mel on the host,
    model.py:140-158).  The ref wav ships int16 at a REF-length bucket (not the
    generation bucket) to keep the host->device bytes minimal."""
    wav = wav_i16.astype(jnp.float32) * (wav_scale[:, None] / 32767.0)
    mel = log_mel_prepadded(wav, model_cfg.mel)  # [b, m_ref, d]
    m_ref = mel.shape[1]
    if m_ref < n:
        mel = jnp.pad(mel, ((0, 0), (0, n - m_ref), (0, 0)))
    else:
        mel = mel[:, :n, :]
    cond = jnp.where(jnp.arange(n)[None, :, None] < lens[:, None, None], mel, 0.0)
    compute_dtype = jax.tree.leaves(dit_params)[0].dtype
    return _sample_and_decode(
        dit_params, voc_params, model_cfg, opts, cond.astype(compute_dtype),
        text_ids, lens, duration, seeds, decode=decode, vocoder_type=vocoder_type,
        vocoder_cfg=vocoder_cfg, hooks=hooks,
    )


class InferenceEngine:
    """Holds weights + compiled graphs; exposes batch mel/waveform generation."""

    def __init__(
        self,
        dit_params,
        model_cfg: ModelConfig,
        vocoder_params=None,
        dtype=jnp.float32,
        buckets=DEFAULT_BUCKETS,
        options: EngineOptions = EngineOptions(),
        vocoder_type: str | None = None,
        vocoder_cfg=None,
        fuse_qkv: bool = True,  # serving micro-opt; disable for TP weight sharding
    ):
        self.model_cfg = model_cfg
        self.dtype = dtype
        self.buckets = buckets
        self.options = options
        from f5_tts_tpu.models.backbones import get_backbone

        backbone = get_backbone(model_cfg.arch)
        self.fused_qkv = bool(fuse_qkv and hasattr(backbone, "fuse_for_inference"))
        if self.fused_qkv:
            dit_params = backbone.fuse_for_inference(dit_params)
        self.dit_params = params_astype(dit_params, dtype)
        if options.quantize:
            from f5_tts_tpu.ops.quant import quantize_dit_blocks

            self.dit_params = quantize_dit_blocks(self.dit_params)
        self.vocoder_params = vocoder_params  # vocoder runs fp32 (cheap, quality-critical)
        self.vocoder_type = vocoder_type or model_cfg.mel.mel_spec_type
        self.vocoder_cfg = vocoder_cfg  # None -> backend defaults
        self.hop = model_cfg.mel.hop_length
        # (block_scan, activation_constraint) for multi-chip serving — set by
        # BatchServer (sequence/pipeline parallel); must stay a stable tuple of
        # callables (it keys the jit cache)
        self.parallel_hooks = (None, None)
        # device-resident ref-upload cache (see _ref_wav_device)
        from collections import OrderedDict

        self._ref_dev_cache: "OrderedDict[tuple, jax.Array]" = OrderedDict()

    def enable_time_parallel(self, mesh) -> None:
        """Low-latency multi-chip mode: with ``EngineOptions(
        time_parallel_window=W)``, the sampler's W-step window rows run
        jax.shard_map manual over ``mesh``'s data axis — W chips integrate W
        ODE timesteps of the same utterance concurrently (models/cfm.py
        _picard_integrate).  Call before warmup; the batch itself stays
        replicated (this mode targets batch-1 latency, not throughput)."""
        assert self.options.time_parallel_window > 0, (
            "set EngineOptions(time_parallel_window=W) to use time parallelism"
        )
        self.parallel_hooks = (None, None, mesh)

    # device-call seams: runtime/aot.AotEngine overrides these to dispatch to
    # pre-built jax.export artifacts instead of tracing + jit-compiling
    def _call_sample_and_decode(self, *args, **kw):
        return _sample_and_decode(*args, **kw)

    def _call_sample_and_decode_from_wav(self, *args, **kw):
        return _sample_and_decode_from_wav(*args, **kw)


    def _ref_wav_device(self, wav_i16: np.ndarray, b: int, S: int):
        """Device-resident LRU for the (broadcast) int16 ref upload.

        Streaming synthesizes chunk-by-chunk and the socket server reuses one
        reference across many requests, so the identical ~250 KB ref wav would
        otherwise re-cross the host->device link on EVERY chunk — a measurable
        slice of TTFB on slow links (DEVELOPMENT.md: ~10 MB/s axon tunnel).
        Keyed by exact bytes; skipped under mesh-serving hooks where input
        placement is the server's job."""
        def upload():
            return jnp.asarray(np.ascontiguousarray(np.broadcast_to(wav_i16, (b, S))))

        if self.parallel_hooks != (None, None):
            return upload()
        key = (wav_i16.tobytes(), b, S)
        dev = self._ref_dev_cache.pop(key, None)
        if dev is None:
            dev = upload()
        self._ref_dev_cache[key] = dev
        while len(self._ref_dev_cache) > 8:
            self._ref_dev_cache.popitem(last=False)
        return dev

    def _trim_wavs(self, wav, duration, lens):
        """Dequantize the int16 device waveform and trim each row to its
        generated length (vocos istft yields (n-1)*hop samples for n frames;
        bigvgan n*hop).

        Fetch-byte optimization: the generated region is rolled to the FRONT
        of each row in-graph, so before pulling the array across the (slow)
        host link we crop on-device to the batch's max generated length,
        rounded up to 128 frames to bound the number of tiny slice
        executables.  At typical bucket occupancy this cuts wire bytes
        30-60% and directly reduces per-request latency (the fetch is ~25%
        of serving p50 through the axon tunnel)."""
        gen_frames = [int(d - ln) for d, ln in zip(duration, lens)]
        wavs = []
        if wav is not None:
            if getattr(self, "_stash_next_wav", False) and isinstance(wav, jax.Array):
                # warmup hook: BatchServer.warmup_all grabs the pre-crop device
                # array to pre-compile every crop-slice executable for this
                # exact (shape, sharding) — otherwise each new 128-frame crop
                # length hits a first-use compile at request time
                self._stash_wav_dev = wav
            if isinstance(wav, jax.Array) and wav.ndim == 2 and gen_frames:
                crop_f = -(-max(max(gen_frames), 1) // 128) * 128
                crop_s = min(crop_f * self.hop, wav.shape[1])
                if crop_s < wav.shape[1]:
                    wav = wav[:, :crop_s]
            wav_np = np.asarray(wav).astype(np.float32) / 32767.0
            for i, gf in enumerate(gen_frames):
                n_samp = max(gf - 1, 0) * self.hop if self.vocoder_type == "vocos" else gf * self.hop
                wavs.append(wav_np[i, :n_samp])
        return wavs, gen_frames

    # ------------------------------------------------------------------ mel
    def ref_mel(self, wav: np.ndarray) -> np.ndarray:
        """Reference-audio log-mel [n_ref, d], exact parity with the reference
        center=True mel via host reflect-pad + bucketed frames."""
        mel_cfg = self.model_cfg.mel
        pad = stft_pad_amount(mel_cfg)
        n_ref = num_frames(len(wav), mel_cfg)
        padded = np.pad(np.asarray(wav, np.float32), pad, mode="reflect")
        need = (n_ref - 1) * self.hop + mel_cfg.n_fft
        bucket_samples = pick_bucket(n_ref, self.buckets) * self.hop + mel_cfg.n_fft
        padded = np.pad(padded, (0, max(0, bucket_samples - len(padded))))[:bucket_samples]
        assert len(padded) >= need
        mel = np.asarray(_ref_mel(jnp.asarray(padded[None]), mel_cfg))[0]
        return mel[:n_ref]

    # ------------------------------------------------------------- generate
    def generate_batch(
        self,
        ref_mels: list[np.ndarray],  # each [n_ref_i, d]
        text_ids_list: list[np.ndarray],  # each [nt_i]
        durations: list[int],  # total frames per sample
        seeds: list[int] | None = None,
        decode: bool = True,
        fetch_mel: bool = True,
    ):
        """Returns (mels [b, n, d] fp32, wavs list of np arrays trimmed to the
        generated region, gen_frames list)."""
        b = len(ref_mels)
        d = self.model_cfg.mel.n_mel_channels
        n = pick_bucket(max(durations), self.buckets)
        cond = np.zeros((b, n, d), np.float32)
        lens = np.zeros((b,), np.int32)
        text_ids = np.full((b, n), -1, np.int32)
        for i, (m, t) in enumerate(zip(ref_mels, text_ids_list)):
            cond[i, : len(m)] = m
            lens[i] = len(m)
            text_ids[i, : min(len(t), n)] = t[:n]
        duration = _clamp_duration(np.asarray(durations, np.int32), text_ids, lens, n)
        if seeds is None:
            seeds = list(np.random.randint(0, 2**31 - 1, size=b))
        mel_out, wav = self._call_sample_and_decode(
            self.dit_params,
            self.vocoder_params,
            self.model_cfg,
            self.options,
            jnp.asarray(cond, dtype=self.dtype),
            jnp.asarray(text_ids),
            jnp.asarray(lens),
            jnp.asarray(duration),
            jnp.asarray(np.asarray(seeds, np.int32)),
            decode=decode and self.vocoder_params is not None,
            vocoder_type=self.vocoder_type,
            vocoder_cfg=self.vocoder_cfg,
            hooks=self.parallel_hooks,
        )
        mel_np = np.asarray(mel_out, dtype=np.float32) if fetch_mel else None
        wavs, gen_frames = self._trim_wavs(wav, duration, lens)
        return mel_np, wavs, gen_frames

    def generate_batch_from_wav(
        self,
        ref_wav: np.ndarray,  # one reference waveform shared by all chunks
        text_ids_list: list[np.ndarray],
        durations: list[int],
        seeds: list[int] | None = None,
        decode: bool = True,
        fetch_mel: bool = True,
    ):
        """Fused single-call path (mel extraction in-graph): one device round
        trip for the whole utterance batch."""
        b = len(text_ids_list)
        mel_cfg = self.model_cfg.mel
        n = pick_bucket(max(durations), self.buckets)
        ref_frames = len(ref_wav) // self.hop  # reference frame count (pipeline.py)
        pad = stft_pad_amount(mel_cfg)
        # ref wav ships at a REF-length bucket, int16 — minimal upload bytes
        ref_bucket = pick_bucket(min(ref_frames + 1, n), self.buckets)
        S = ref_bucket * self.hop + mel_cfg.n_fft
        padded = np.pad(np.asarray(ref_wav, np.float32), pad, mode="reflect")
        padded = np.pad(padded, (0, max(0, S - len(padded))))[:S]
        peak = max(float(np.abs(padded).max()), 1e-6)
        scale = max(peak, 1.0)  # peak-normalize only if it would clip
        wav_i16 = np.round(padded / scale * 32767.0).astype(np.int16)
        wavs_in = self._ref_wav_device(wav_i16, b, S)
        wav_scale = np.full((b,), scale, np.float32)
        lens = np.full((b,), min(ref_frames, n), np.int32)
        text_ids = np.full((b, n), -1, np.int32)
        for i, t in enumerate(text_ids_list):
            text_ids[i, : min(len(t), n)] = t[:n]
        duration = _clamp_duration(np.asarray(durations, np.int32), text_ids, lens, n)
        if seeds is None:
            seeds = list(np.random.randint(0, 2**31 - 1, size=b))
        mel_out, wav = self._call_sample_and_decode_from_wav(
            self.dit_params,
            self.vocoder_params,
            self.model_cfg,
            self.options,
            jnp.asarray(wavs_in),
            jnp.asarray(wav_scale),
            jnp.asarray(lens),
            jnp.asarray(text_ids),
            jnp.asarray(duration),
            jnp.asarray(np.asarray(seeds, np.int32)),
            n,
            decode=decode and self.vocoder_params is not None,
            vocoder_type=self.vocoder_type,
            vocoder_cfg=self.vocoder_cfg,
            hooks=self.parallel_hooks,
        )
        mel_np = np.asarray(mel_out, dtype=np.float32) if fetch_mel else None
        wavs, gen_frames = self._trim_wavs(wav, duration, lens)
        return mel_np, wavs, gen_frames

    def generate_batch_from_wavs(
        self,
        ref_wavs: list[np.ndarray],  # per-row reference waveforms (dynamic batching)
        text_ids_list: list[np.ndarray],
        durations: list[int],
        seeds: list[int] | None = None,
        decode: bool = True,
        fetch_mel: bool = True,
    ):
        """Fused path with a DIFFERENT reference per row — the shape the online
        dynamic batcher needs when merging independent clients' requests
        (reference Triton batcher pads/concats per-request refs,
        runtime/triton_trtllm/model_repo_f5_tts/f5_tts/f5_tts_trtllm.py:412-445).
        Rows ship int16 at the ref-length bucket of the LONGEST ref."""
        b = len(ref_wavs)
        mel_cfg = self.model_cfg.mel
        n = pick_bucket(max(durations), self.buckets)
        pad = stft_pad_amount(mel_cfg)
        ref_frames = [len(w) // self.hop for w in ref_wavs]
        ref_bucket = pick_bucket(min(max(ref_frames) + 1, n), self.buckets)
        S = ref_bucket * self.hop + mel_cfg.n_fft
        wavs_in = np.zeros((b, S), np.int16)
        wav_scale = np.zeros((b,), np.float32)
        for i, w in enumerate(ref_wavs):
            padded = np.pad(np.asarray(w, np.float32), pad, mode="reflect")
            padded = np.pad(padded, (0, max(0, S - len(padded))))[:S]
            peak = max(float(np.abs(padded).max()), 1e-6)
            scale = max(peak, 1.0)
            wavs_in[i] = np.round(padded / scale * 32767.0).astype(np.int16)
            wav_scale[i] = scale
        lens = np.asarray([min(rf, n) for rf in ref_frames], np.int32)
        text_ids = np.full((b, n), -1, np.int32)
        for i, t in enumerate(text_ids_list):
            text_ids[i, : min(len(t), n)] = t[:n]
        duration = _clamp_duration(np.asarray(durations, np.int32), text_ids, lens, n)
        if seeds is None:
            seeds = list(np.random.randint(0, 2**31 - 1, size=b))
        mel_out, wav = self._call_sample_and_decode_from_wav(
            self.dit_params,
            self.vocoder_params,
            self.model_cfg,
            self.options,
            jnp.asarray(wavs_in),
            jnp.asarray(wav_scale),
            jnp.asarray(lens),
            jnp.asarray(text_ids),
            jnp.asarray(duration),
            jnp.asarray(np.asarray(seeds, np.int32)),
            n,
            decode=decode and self.vocoder_params is not None,
            vocoder_type=self.vocoder_type,
            vocoder_cfg=self.vocoder_cfg,
            hooks=self.parallel_hooks,
        )
        mel_np = np.asarray(mel_out, dtype=np.float32) if fetch_mel else None
        wavs, gen_frames = self._trim_wavs(wav, duration, lens)
        return mel_np, wavs, gen_frames

    def warmup(self, n_frames: int = 1024, text_len: int = 64) -> None:
        d = self.model_cfg.mel.n_mel_channels
        ref = np.zeros((n_frames // 4, d), np.float32)
        txt = np.zeros((text_len,), np.int32)
        self.generate_batch([ref], [txt], [n_frames - 1], seeds=[0])

    def warmup_all(
        self, buckets=None, batch_sizes=(1,), fused: bool = True, warm_crops: bool = True
    ) -> None:
        """Pre-compile graphs for every (bucket, batch) pair a server will see.
        Compiled executables persist via the jax compilation cache, so this is
        a one-time cost per deployment.  ``warm_crops`` also compiles the
        fetch-path crop-slice executables (see _trim_wavs) so short
        generations don't first-hit-compile at request time."""
        d = self.model_cfg.mel.n_mel_channels
        sr = self.model_cfg.mel.target_sample_rate
        for n in buckets or self.buckets:
            for b in batch_sizes:
                txts = [np.zeros((min(64, n),), np.int32)] * b
                durs = [n - 1] * b
                self._stash_next_wav = warm_crops
                self._stash_wav_dev = None
                try:
                    if fused:
                        wav = np.zeros(int(min(n // 4 * self.hop, 11 * sr)), np.float32)
                        self.generate_batch_from_wav(wav, txts, durs, seeds=[0] * b, fetch_mel=False)
                    else:
                        ref = np.zeros((n // 4, d), np.float32)
                        self.generate_batch([ref] * b, txts, durs, seeds=[0] * b, fetch_mel=False)
                    arr = getattr(self, "_stash_wav_dev", None)
                    if warm_crops and arr is not None and arr.ndim == 2:
                        S = arr.shape[1]
                        for crop_s in sorted({min(f * self.hop, S) for f in range(128, n + 1, 128)}):
                            if crop_s < S:
                                np.asarray(arr[:, :crop_s])
                finally:
                    self._stash_next_wav = False
                    self._stash_wav_dev = None

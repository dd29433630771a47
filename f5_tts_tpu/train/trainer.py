"""Trainer: the full training orchestration loop.

Rebuild of reference src/f5_tts/model/trainer.py:26-442 on the TPU stack:
- one jitted train step (loss+grad+AdamW+EMA) with buffer donation;
- data-parallel (and optional tensor-parallel) sharding over a Mesh — the
  Accelerate/NCCL DDP layer is replaced by XLA collectives;
- orbax checkpoints {params, opt_state, ema, step} with rotation and a
  separately-cadenced "last" checkpoint (reference :150-183);
- resume = restore + deterministic sampler fast-forward (reference :333-349);
- JSONL metrics log (+ wandb if importable).
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import time

import jax
import numpy as np

from f5_tts_tpu.train.dataset import DynamicBatchSampler, collate_batch
from f5_tts_tpu.train.step import OptimConfig, init_train_state, train_step


def resolve_remat_policy(model_cfg, batch_size_per_device: int, batch_size_type: str):
    """Pre-resolve ``remat_policy="auto"`` from the trainer's PER-DEVICE
    frame budget (exact under data parallelism, where the traced global
    shape that models/dit.py would otherwise fall back on over-counts).
    Frame-mode budgets map directly to b*n tokens; sample mode doesn't know
    frames ahead, so it takes the memory-safe large-shape winner ("flash").
    Measured matrix: DEVELOPMENT.md "Training remat-policy A/B"."""
    import dataclasses as _dc

    arch = model_cfg.arch
    if (not getattr(arch, "checkpoint_activations", False)
            or getattr(arch, "remat_policy", "nothing") != "auto"):
        return model_cfg
    if batch_size_type == "frame":
        from f5_tts_tpu.models.dit import AUTO_DOTS_FLASH_MAX_TOKENS

        pol = ("dots_flash" if batch_size_per_device <= AUTO_DOTS_FLASH_MAX_TOKENS
               else "flash")
    else:
        pol = "flash"
    return _dc.replace(model_cfg, arch=_dc.replace(arch, remat_policy=pol))


class Trainer:
    def __init__(
        self,
        model_cfg,  # ModelConfig
        vocab: dict | None,
        opt_cfg: OptimConfig = OptimConfig(),
        ckpt_dir: str = "ckpts/run",
        batch_size_per_device: int = 38_400,
        batch_size_type: str = "frame",
        max_samples: int = 64,
        grad_accumulation_steps: int = 1,
        save_per_updates: int = 50_000,
        keep_last_n_checkpoints: int = -1,
        last_per_updates: int = 5_000,
        log_file: str | None = None,
        logger: str | None = None,  # "wandb" | "tensorboard" | None (JSONL always on)
        mesh=None,
        seed: int = 666,
        log_samples_fn=None,  # callback(ema_params, update) -> None; called at each save
        zero1: bool = False,  # shard optimizer state over the data axis (ZeRO-1)
        tensor_parallel: bool = False,  # Megatron-split weights over mesh 'model' axis
        pipeline_microbatches: int = 0,  # >0 + mesh 'pipe' axis => GPipe block schedule
        sequence_parallel: bool = False,  # mesh 'seq' axis => frame-axis activation sharding
        convpos_taps: bool | None = None,  # ConvPositionEmbedding impl for the
        # step graph: None = auto (einsum-tap formulation when the mesh has a
        # data axis > 1 — XLA GSPMD refuses to batch-shard grouped
        # convolutions, so the default conv would run the FULL global batch
        # replicated on every chip; models/layers.py _grouped_conv1d_taps)
        mel_in_graph: bool = False,  # wav-in batches; log-mel extracted ON-DEVICE
        # inside the train step (collate_wav_batch + ops/mel.log_mel_prepadded);
        # host does only C++ threaded decode + pad — the input-pipeline mode
        # for raw-audio datasets on 1-CPU TPU hosts
        preemption_save: bool = True,  # SIGTERM (TPU preemption notice) =>
        # finish the in-flight step, write a durable model_last, exit cleanly
    ):
        if grad_accumulation_steps > 1 and opt_cfg.grad_accumulation_steps == 1:
            import dataclasses as _dc

            opt_cfg = _dc.replace(opt_cfg, grad_accumulation_steps=grad_accumulation_steps)
        model_cfg = resolve_remat_policy(model_cfg, batch_size_per_device, batch_size_type)
        self.model_cfg = model_cfg
        self.vocab = vocab
        self.opt_cfg = opt_cfg
        self.ckpt_dir = ckpt_dir
        self.batch_size_per_device = batch_size_per_device
        self.batch_size_type = batch_size_type
        self.max_samples = max_samples
        self.save_per_updates = save_per_updates
        self.keep_last_n_checkpoints = keep_last_n_checkpoints
        self.last_per_updates = last_per_updates
        self.seed = seed
        self.mesh = mesh
        self.log_samples_fn = log_samples_fn
        self._log_samples_wants_params = False
        if log_samples_fn is not None:
            import inspect

            try:
                n_pos = sum(
                    p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                               inspect.Parameter.POSITIONAL_OR_KEYWORD)
                    for p in inspect.signature(log_samples_fn).parameters.values())
                self._log_samples_wants_params = n_pos >= 3
            except (TypeError, ValueError):
                pass
        self.zero1 = zero1
        self.tensor_parallel = tensor_parallel
        self.mel_in_graph = mel_in_graph
        self.preemption_save = preemption_save
        self._ckptr = None
        mesh_axes = set(mesh.axis_names) if mesh is not None else set()
        self.pipeline_microbatches = pipeline_microbatches if "pipe" in mesh_axes else 0
        self.sequence_parallel = sequence_parallel and "seq" in mesh_axes
        if convpos_taps is None:
            convpos_taps = "data" in mesh_axes and mesh.shape["data"] > 1
        self.convpos_taps = bool(convpos_taps)
        os.makedirs(ckpt_dir, exist_ok=True)
        self.log_file = log_file or os.path.join(ckpt_dir, "train_log.jsonl")
        self.wandb = None
        self.tb_writer = None
        if logger == "wandb":
            try:
                import wandb

                self.wandb = wandb
            except ImportError:
                pass
        elif logger == "tensorboard":
            # reference trainer.py:97-102 writes TB events under
            # <ckpt_dir>/runs; tensorboardX keeps us torch/tf-agnostic
            try:
                from tensorboardX import SummaryWriter

                self.tb_writer = SummaryWriter(logdir=os.path.join(ckpt_dir, "runs"))
            except ImportError:
                pass

        activation_constraint = None
        step_backend = "train_auto"
        ring_in_pipe = None
        if self.sequence_parallel:
            from f5_tts_tpu.parallel.ring import make_ring_attention
            from f5_tts_tpu.parallel.sequence import make_seq_constraint

            activation_constraint = make_seq_constraint(mesh)
            if self.pipeline_microbatches:
                # pp x sp: a nested ring shard_map cannot re-bind the pipe
                # axis (Shardy), so the pipeline widens its own manual
                # region to {pipe, seq} and rotates KV inside every
                # microbatch tick (parallel/pipeline.py seq_shard;
                # tests/test_ring_attention test_train_step_pp_sp_ring)
                ring_in_pipe = "auto"
            else:
                # differentiable ring attention over the seq axis
                # (parallel/ring.py): KV chunks rotate over ICI instead of
                # GSPMD all-gathering full KV around an opaque flash kernel;
                # "auto" picks the Pallas flash block primitive (custom-VJP
                # fwd+bwd) on TPU, einsum on CPU
                step_backend = make_ring_attention(mesh, block_impl="auto")
        block_scan = None
        if self.pipeline_microbatches:
            from f5_tts_tpu.parallel.pipeline import make_dit_block_scan

            block_scan = make_dit_block_scan(
                model_cfg.arch, mesh, self.pipeline_microbatches,
                backend=step_backend, ring_sequence=ring_in_pipe,
            )
        self._step_extras = dict(
            backend=step_backend, block_scan=block_scan,
            activation_constraint=activation_constraint,
        )
        self._step_fn = self._build_step_fn(opt_cfg)

    def _build_step_fn(self, opt_cfg: OptimConfig):
        fn = functools.partial(
            train_step, arch_cfg=self.model_cfg.arch, opt_cfg=opt_cfg,
            mel_cfg=self.model_cfg.mel, **self._step_extras,
        )
        if self.convpos_taps:
            # the impl switch is read at TRACE time; scope it to this graph's
            # tracing so nothing else in the process is affected
            from f5_tts_tpu.models import layers as L

            inner = fn

            def fn(*a, **k):
                prev = L.set_convpos_impl("taps")
                try:
                    return inner(*a, **k)
                finally:
                    L.set_convpos_impl(prev)

        return jax.jit(fn, donate_argnums=(0, 1, 2, 3))

    # ------------------------------------------------------------------ ckpt
    def _ckpt_path(self, tag) -> str:
        return os.path.abspath(os.path.join(self.ckpt_dir, f"model_{tag}"))

    @property
    def checkpointer(self):
        """Persistent orbax StandardCheckpointer (an AsyncCheckpointer):
        ``save`` returns once the device->host snapshot is taken and commits
        to disk in a background thread, so checkpoint writes overlap the next
        train steps instead of stalling the device."""
        if self._ckptr is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def save_checkpoint(
        self, state: dict, update: int, last: bool = False, block: bool = False
    ) -> None:
        ckptr = self.checkpointer
        # the previous async save must be fully committed before anything at
        # its path is cleared or a new save starts
        ckptr.wait_until_finished()
        tag = "last" if last else str(update)
        path = self._ckpt_path(tag)
        if jax.process_count() > 1:
            # multi-host: orbax saves are collective; only process 0 clears
            # the target, everyone syncs before writing (shared filesystem)
            from jax.experimental import multihost_utils

            if jax.process_index() == 0 and os.path.exists(path):
                shutil.rmtree(path)
            multihost_utils.sync_global_devices("f5_ckpt_clear")
        elif os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(path, state)
        if block:
            ckptr.wait_until_finished()
        if not last and self.keep_last_n_checkpoints >= 0 and jax.process_index() == 0:
            # rotation only ever deletes OLDER committed model_N dirs; the
            # in-flight tmp dir is name-filtered out, so it's async-safe
            self._rotate()

    def _rotate(self) -> None:
        numbered = sorted(
            (d for d in os.listdir(self.ckpt_dir)
             if d.startswith("model_") and d.split("_")[1].isdigit()),
            key=lambda d: int(d.split("_")[1]),
        )
        if self.keep_last_n_checkpoints == 0:
            excess = numbered
        else:
            excess = numbered[: -self.keep_last_n_checkpoints] if len(numbered) > self.keep_last_n_checkpoints else []
        for d in excess:  # pretrained_* never rotates (reference :171-183)
            shutil.rmtree(os.path.join(self.ckpt_dir, d))

    def load_checkpoint(self, state_template: dict) -> dict | None:
        import orbax.checkpoint as ocp

        if self._ckptr is not None:  # don't restore under an in-flight save
            self._ckptr.wait_until_finished()
        path = self._ckpt_path("last")
        if not os.path.exists(path):
            numbered = sorted(
                (d for d in os.listdir(self.ckpt_dir)
                 if d.startswith("model_") and d.split("_")[1].isdigit()),
                key=lambda d: int(d.split("_")[1]),
            )
            if not numbered:
                return None
            path = os.path.abspath(os.path.join(self.ckpt_dir, numbered[-1]))
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path, abstract)

    # ------------------------------------------------------------------ log
    def _log(self, rec: dict) -> None:
        if jax.process_index() != 0:  # one metrics stream per run
            return
        with open(self.log_file, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.wandb is not None and getattr(self.wandb, "run", None):
            self.wandb.log(rec, step=rec.get("update"))
        if self.tb_writer is not None:
            step = rec.get("update", 0)
            for k, v in rec.items():
                if isinstance(v, (int, float)) and k != "update":
                    self.tb_writer.add_scalar(k, v, global_step=step)
            self.tb_writer.flush()

    # ---------------------------------------------------------------- train
    def train(self, params, dataset, epochs: int = 1, resume: bool = True, progress=None):
        """Runs the loop; returns (params, ema_params, update).

        Preemption safety: TPU pods get a SIGTERM ahead of eviction.  The
        handler is installed before ANY device work (compiles included) so
        the whole run is covered: on SIGTERM the in-flight step finishes, a
        durable model_last is written, and train() returns cleanly —
        ``resume=True`` continues from the exact micro-step.  Only the main
        thread can install signal handlers (gradio/server launches running
        train() on worker threads skip this).
        """
        import threading as _threading

        preempt = {"hit": False}
        old_sigterm = None
        if self.preemption_save and _threading.current_thread() is _threading.main_thread():
            import signal as _signal

            old_sigterm = _signal.signal(
                _signal.SIGTERM, lambda s, f: preempt.update(hit=True)
            )
        try:
            return self._train_impl(params, dataset, epochs, resume, progress, preempt)
        finally:
            if old_sigterm is not None:
                import signal as _signal

                _signal.signal(_signal.SIGTERM, old_sigterm)

    def _train_impl(self, params, dataset, epochs, resume, progress, preempt):
        if self.batch_size_type == "sample":
            from f5_tts_tpu.train.dataset import SampleBatchSampler

            sampler = SampleBatchSampler(
                dataset, batch_size=self.batch_size_per_device, random_seed=self.seed
            )
        else:
            sampler = DynamicBatchSampler(
                dataset,
                frames_threshold=self.batch_size_per_device,
                max_samples=self.max_samples,
                random_seed=self.seed,
            )
        if self.opt_cfg.total_updates is None:
            # derive the LR decay horizon from the actual run length, like the
            # reference (trainer.py:316-326: SequentialLR decays to zero over
            # ceil(batches/accum)*epochs - warmup).  A pinned total_updates
            # (every test, long pretrains with planned extensions) is used as-is.
            import dataclasses as _dc
            import math as _math

            k = max(self.opt_cfg.grad_accumulation_steps, 1)
            total = max(
                _math.ceil(len(sampler) / k) * max(epochs, 1),
                self.opt_cfg.num_warmup_updates + 1,
            )
            self.opt_cfg = _dc.replace(self.opt_cfg, total_updates=total)
            self._step_fn = self._build_step_fn(self.opt_cfg)
        if self.mesh is not None and (self.tensor_parallel or self.pipeline_microbatches):
            from f5_tts_tpu.parallel.mesh import backbone_param_specs, shard_params

            if self.tensor_parallel:
                specs = backbone_param_specs(params)
            else:
                from jax.sharding import PartitionSpec as _P

                specs = jax.tree.map(lambda _: _P(), params)
            if self.pipeline_microbatches:
                from f5_tts_tpu.parallel.pipeline import pp_param_specs

                specs = pp_param_specs(
                    specs, self.model_cfg.arch.depth, self.mesh.shape["pipe"]
                )
            params = shard_params(params, self.mesh, specs)
        opt_state, ema_params, step = init_train_state(params, self.opt_cfg)
        state = {"params": params, "opt_state": opt_state, "ema": ema_params, "step": step}
        start_update = 0
        if resume:
            restored = self.load_checkpoint(state)
            if restored is not None:
                state = restored
                start_update = int(np.asarray(state["step"]))  # micro-steps
                k_res = max(self.opt_cfg.grad_accumulation_steps, 1)
                print(f"resumed at micro-step {start_update} "
                      f"(update {start_update // k_res})")
        params, opt_state, ema_params, step = (
            state["params"], state["opt_state"], state["ema"], state["step"],
        )

        if self.mesh is not None:
            from f5_tts_tpu.parallel.mesh import batch_sharding, shard_opt_state

            bsh = batch_sharding(self.mesh)
            if self.zero1:
                opt_state = shard_opt_state(opt_state, self.mesh)
        else:
            bsh = None

        # fold the resume position into the stream: a resumed run must NOT
        # replay the same per-step randomness (time draws, span masks, CFG
        # drops) from the beginning — segment-resumed probe training measured
        # the damage (DEVELOPMENT.md round-5 speak probe: 13 replays of one
        # 162-step randomness block kept held-out CER at 0.83 where fresh
        # draws reach 0.0 by update ~1000)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                 int(np.asarray(state["step"])))
        # state["step"] counts MICRO-steps; "update" counts optimizer updates
        # (= micro // k under grad accumulation — reference trainer.py:63-68
        # counts per-accumulated update for warmup/save/resume bookkeeping)
        k_accum = max(self.opt_cfg.grad_accumulation_steps, 1)
        micro = start_update  # start_update holds restored micro-steps
        update = micro // k_accum
        batches_per_epoch = len(sampler)  # one batch == one micro-step
        skip = micro % max(batches_per_epoch, 1)
        start_epoch = micro // max(batches_per_epoch, 1)

        import queue as _queue
        import threading as _threading

        n_proc = jax.process_count()
        multihost = self.mesh is not None and n_proc > 1

        # Exceptions inside the producer/uploader daemon threads (decode
        # errors, device OOM on device_put, sharding mismatches) must surface
        # in the step loop instead of leaving it blocked on q2.get() forever:
        # each thread body is wrapped so a failure records the exception and
        # poisons its downstream queue with the None sentinel.
        pipeline_errors: list = []

        def _guarded(fn, down_q: "_queue.Queue"):
            def run(*args):
                try:
                    fn(*args)
                except BaseException as e:  # noqa: BLE001 — re-raised in the step loop
                    pipeline_errors.append(e)
                    down_q.put(None)
            return run

        def batch_producer(skip_n, out_q: "_queue.Queue"):
            """Host-side load+collate runs ahead of the device (the reference
            leans on DataLoader workers; here a producer thread + queue).

            Multi-host: every process iterates the SAME sampler order but
            loads/collates only ITS contiguous slice of each global batch
            (the per-rank dataloader-shard counterpart of reference
            trainer.py:327-329).  Global padded widths come from sampler
            metadata so all hosts agree on shapes without sharing rows."""
            import math

            from f5_tts_tpu.train.dataset import pad_frames_to

            for bi, batch_idx in enumerate(sampler):
                if bi < skip_n:
                    continue
                if multihost:
                    from f5_tts_tpu.parallel.distributed import process_batch_slice

                    # rows must divide over the data axis AND the GPipe
                    # microbatch count (train_step reshapes [M, b/M, ...])
                    dp = self.mesh.shape["data"] * max(1, self.pipeline_microbatches)
                    b_real = len(batch_idx)
                    idx = list(batch_idx)
                    if b_real % dp:
                        pad = dp - b_real % dp
                        idx += [idx[i % b_real] for i in range(pad)]
                    valid = np.concatenate(
                        [np.ones(b_real, np.float32), np.zeros(len(idx) - b_real, np.float32)]
                    )
                    n_global = pad_frames_to(
                        max(int(math.ceil(dataset.get_frame_len(i))) for i in idx), 256
                    )
                    start, size = process_batch_slice(len(idx))
                    if self.mel_in_graph:
                        from f5_tts_tpu.train.dataset import collate_wav_batch

                        local = collate_wav_batch(
                            dataset.wav_batch(idx[start : start + size]),
                            self.vocab, self.model_cfg.tokenizer, self.model_cfg.mel,
                            mel_len=n_global, text_len=n_global,
                        )
                    else:
                        items = [dataset[i] for i in idx[start : start + size]]
                        local = collate_batch(
                            items, self.vocab, self.model_cfg.tokenizer,
                            mel_len=n_global, text_len=n_global,
                        )
                    local["valid"] = valid[start : start + size]
                    local["_b_real"] = b_real  # global real rows, for metrics
                    out_q.put(local)
                elif self.mel_in_graph:
                    from f5_tts_tpu.train.dataset import collate_wav_batch

                    out_q.put(collate_wav_batch(
                        dataset.wav_batch(batch_idx), self.vocab,
                        self.model_cfg.tokenizer, self.model_cfg.mel,
                    ))
                else:
                    items = [dataset[i] for i in batch_idx]
                    out_q.put(collate_batch(items, self.vocab, self.model_cfg.tokenizer))
            out_q.put(None)

        def batch_uploader(q, q2):
            """Host->device stage: pad + device_put in a dedicated thread so
            the (possibly slow) H2D transfer of batch N+1 overlaps the device
            compute of batch N — double-buffered input pipeline (the torch
            analog is DataLoader pin_memory + non_blocking copies)."""
            while True:
                batch = q.get()
                if batch is None:
                    q2.put(None)
                    return
                data_key = "mel" if "mel" in batch else "wav"
                b_real = batch[data_key].shape[0]
                if multihost:
                    # producer already sliced/padded/marked validity; assemble
                    # the global array from this process's local shard
                    b_real = batch.pop("_b_real")
                    batch = {
                        k: jax.make_array_from_process_local_data(bsh, v)
                        for k, v in batch.items()
                    }
                elif bsh is not None:
                    # pad batch to a multiple of the data-parallel size (and
                    # of the GPipe microbatch count when pipelining); padded
                    # duplicate rows are marked invalid so they contribute zero
                    # loss/grad (the reference never pads — Accelerate shards
                    # exact per-rank batches)
                    dp = self.mesh.shape["data"] * max(1, self.pipeline_microbatches)
                    if b_real % dp:
                        pad = dp - b_real % dp
                        reps = -(-pad // b_real)  # repeat rows cyclically if batch < pad
                        for k in batch:
                            filler = np.concatenate([batch[k]] * reps, axis=0)[:pad]
                            batch[k] = np.concatenate([batch[k], filler], axis=0)
                        batch["valid"] = np.concatenate(
                            [np.ones(b_real, np.float32), np.zeros(pad, np.float32)]
                        )
                    else:
                        batch["valid"] = np.ones(b_real, np.float32)
                    batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
                else:
                    # single device: start the transfer HERE, off the step
                    # thread, instead of letting jit block on numpy->device
                    # conversion at dispatch time
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                if "mel" in batch:
                    n_frames = int(batch["mel"].shape[1])
                else:  # wav bucket S = (n-1)*hop + n_fft (collate_wav_batch)
                    mc = self.model_cfg.mel
                    n_frames = (batch["wav"].shape[1] - mc.n_fft) // mc.hop_length + 1
                q2.put((batch, b_real, n_frames))

        for epoch in range(start_epoch, epochs):
            sampler.set_epoch(epoch)
            q: "_queue.Queue" = _queue.Queue(maxsize=4)
            q2: "_queue.Queue" = _queue.Queue(maxsize=2)  # device-side prefetch depth
            skip_n = skip if epoch == start_epoch else 0
            producer = _threading.Thread(
                target=_guarded(batch_producer, q), args=(skip_n, q), daemon=True
            )
            producer.start()
            uploader = _threading.Thread(
                target=_guarded(batch_uploader, q2), args=(q, q2), daemon=True
            )
            uploader.start()
            while True:
                item = q2.get()
                if item is None:
                    if pipeline_errors:
                        raise pipeline_errors[0]
                    break
                batch, b_real, n_frames = item
                key, sub = jax.random.split(key)
                t0 = time.perf_counter()
                params, opt_state, ema_params, step, metrics = self._step_fn(
                    params, opt_state, ema_params, step, batch, sub
                )
                micro += 1
                did_update = micro % k_accum == 0
                if did_update:
                    update = micro // k_accum
                if did_update and (update % 10 == 0 or update == 1):
                    loss = float(metrics["loss"])
                    self._log({
                        "update": update, "micro_step": micro, "epoch": epoch, "loss": loss,
                        "grad_norm": float(metrics["grad_norm"]),
                        "step_time_s": time.perf_counter() - t0,
                        "frames": int(b_real * n_frames),
                    })
                state = {"params": params, "opt_state": opt_state, "ema": ema_params, "step": step}
                if did_update and update % self.save_per_updates == 0:
                    self.save_checkpoint(state, update)
                    if self.log_samples_fn is not None:  # reference log_samples (:408-438)
                        try:
                            # 3+-arg callbacks also get the ONLINE params: at
                            # early-training update counts the EMA is still
                            # ~the init snapshot (decay .9999 — see the probe
                            # notes), so eval callbacks need the live weights
                            if self._log_samples_wants_params:
                                self.log_samples_fn(ema_params, update, params)
                            else:
                                self.log_samples_fn(ema_params, update)
                        except Exception as e:  # noqa: BLE001 — sampling must not kill training
                            print(f"log_samples failed at update {update}: {e}")
                if did_update and update % self.last_per_updates == 0:
                    self.save_checkpoint(state, update, last=True)
                if preempt["hit"]:
                    self.save_checkpoint(state, update, last=True, block=True)
                    self._log({"preempted": True, "update": update, "micro_step": micro})
                    print(f"SIGTERM: durable model_last at micro-step {micro}; exiting")
                    return params, ema_params, update
            skip = 0
        self.save_checkpoint(state, update, last=True, block=True)
        return params, ema_params, update

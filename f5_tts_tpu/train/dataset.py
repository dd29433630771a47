"""Training datasets + frame-budget dynamic batching.

Rebuild of reference src/f5_tts/model/dataset.py: arrow-backed rows
{audio_path, text, duration}, on-the-fly (or preprocessed) mel, 0.3-30 s
duration filter, and the DynamicBatchSampler (sort by frame length, pack to a
frames-per-batch budget, epoch-seeded shuffle of BATCHES).

TPU-first addition: ``pad_frames_to`` buckets every batch's padded length to a
multiple (default 256 frames) so the jitted train step sees a small set of
static shapes instead of one shape per batch.
"""

from __future__ import annotations

import json
import os

import numpy as np

from f5_tts_tpu.audio.io import load_wav, resample
from f5_tts_tpu.ops.mel import MelConfig, log_mel_np


class CustomDataset:
    """Rows: dict(audio_path, text, duration[s]) or dict(mel_spec, text)."""

    def __init__(
        self,
        data,  # indexable rows
        durations: list[float] | None = None,
        mel_cfg: MelConfig = MelConfig(),
        preprocessed_mel: bool = False,
        duration_filter=(0.3, 30.0),
    ):
        self.data = data
        self.durations = durations
        self.mel_cfg = mel_cfg
        self.preprocessed_mel = preprocessed_mel
        self.duration_filter = duration_filter

    def get_frame_len(self, index: int) -> float:
        dur = self.durations[index] if self.durations is not None else self.data[index]["duration"]
        return dur * self.mel_cfg.target_sample_rate / self.mel_cfg.hop_length

    def __len__(self):
        return len(self.data)

    def _probe(self, index: int) -> int:
        """Duration-filter probing (reference dataset.py:129-140): skip to the
        next row inside the [0.3, 30] s window."""
        lo, hi = self.duration_filter
        while True:
            row = self.data[index]
            if self.preprocessed_mel or lo <= row["duration"] <= hi:
                return index
            index = (index + 1) % len(self.data)

    def __getitem__(self, index: int) -> dict:
        index = self._probe(index)
        row = self.data[index]
        if self.preprocessed_mel:
            mel = np.asarray(row["mel_spec"], dtype=np.float32)
            if mel.shape[0] == self.mel_cfg.n_mel_channels:  # [d, n] -> [n, d]
                mel = mel.T
        else:
            wav, sr = self._load(row["audio_path"])
            if sr != self.mel_cfg.target_sample_rate:
                wav = resample(wav, sr, self.mel_cfg.target_sample_rate)
            mel = log_mel_np(wav, self.mel_cfg)[0]  # [n, d]
        return {"mel": mel, "text": row["text"]}

    @staticmethod
    def _load(path: str):
        """Prefer the native C++ decoder (off-GIL, threaded-friendly)."""
        try:
            from f5_tts_tpu.audio.native_loader import load_wav_mono

            out = load_wav_mono(path)
            if out is not None:
                return out
        except Exception:
            pass
        return load_wav(path)

    def wav_batch(self, indices) -> list[dict]:
        """Raw-audio fast path for the in-graph-mel training pipeline: decode
        + resample a WHOLE batch through the native threaded loader
        (native/audioio.cpp load_batch_mono, off the GIL), skipping the
        per-item python mel.  The reference leans on multi-worker DataLoaders
        for this (model/dataset.py via Accelerate); on a TPU host the mel
        moves into the train graph instead (ops/mel.log_mel_prepadded).

        Returns ``[{"wav": float32 [S_i], "text": str}, ...]``.
        """
        if self.preprocessed_mel:
            raise ValueError(
                "wav_batch (Trainer(mel_in_graph=True)) needs raw-audio rows "
                "with 'audio_path'; this dataset has preprocessed 'mel_spec' "
                "rows — use the default host-mel pipeline instead"
            )
        idx = [self._probe(i) for i in indices]
        rows = [self.data[i] for i in idx]
        sr_t = self.mel_cfg.target_sample_rate
        if all("audio_path" in r for r in rows):
            try:
                from f5_tts_tpu.audio.native_loader import load_batch, native_available

                if native_available():
                    # decode cap follows the dataset's duration filter (don't
                    # silently truncate when a caller widens it)
                    cap = float(self.duration_filter[1]) + 5.0
                    max_s = min(max(float(r["duration"]) for r in rows) + 0.5, cap)
                    wavs, lens = load_batch(
                        [r["audio_path"] for r in rows], sr_t, max_seconds=max_s
                    )
                    if all(int(l) >= 0 for l in lens):
                        return [
                            {"wav": wavs[i, : int(lens[i])], "text": rows[i]["text"]}
                            for i in range(len(rows))
                        ]
            except Exception:
                pass
        out = []
        for r in rows:
            wav, sr = self._load(r["audio_path"])
            if sr != sr_t:
                wav = resample(wav, sr, sr_t)
            out.append({"wav": np.asarray(wav, np.float32), "text": r["text"]})
        return out


class HFDataset:
    """Wrapper for HuggingFace-hosted rows with in-row audio (reference
    dataset.py:17-79): each row has {"audio": {"array", "sampling_rate"},
    "text"} (or "transcript").  Mel computed on the fly."""

    def __init__(self, hf_dataset, mel_cfg: MelConfig = MelConfig()):
        self.data = hf_dataset
        self.mel_cfg = mel_cfg

    def get_frame_len(self, index: int) -> float:
        row = self.data[index]
        audio = row["audio"]
        return len(audio["array"]) / audio["sampling_rate"] * self.mel_cfg.target_sample_rate / self.mel_cfg.hop_length

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index: int) -> dict:
        row = self.data[index]
        audio = row["audio"]
        wav = np.asarray(audio["array"], dtype=np.float32)
        sr = int(audio["sampling_rate"])
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        if sr != self.mel_cfg.target_sample_rate:
            wav = resample(wav, sr, self.mel_cfg.target_sample_rate)
        mel = log_mel_np(wav, self.mel_cfg)[0]
        return {"mel": mel, "text": row.get("text") or row.get("transcript", "")}


class DynamicBatchSampler:
    """Reference dataset.py:170-241: sort all indices by frame length, pack
    greedily under ``frames_threshold`` (and ``max_samples``), shuffle the
    BATCH list with seed+epoch."""

    def __init__(
        self,
        dataset,
        frames_threshold: int,
        max_samples: int = 0,
        random_seed: int | None = None,
        drop_residual: bool = False,
    ):
        self.frames_threshold = frames_threshold
        self.max_samples = max_samples
        self.random_seed = random_seed
        self.epoch = 0

        indices = sorted(range(len(dataset)), key=lambda i: dataset.get_frame_len(i))
        batches, batch, batch_frames = [], [], 0.0
        for idx in indices:
            frame_len = dataset.get_frame_len(idx)
            if batch_frames + frame_len <= frames_threshold and (
                max_samples == 0 or len(batch) < max_samples
            ):
                batch.append(idx)
                batch_frames += frame_len
            else:
                if batch:
                    batches.append(batch)
                if frame_len <= frames_threshold:
                    batch, batch_frames = [idx], frame_len
                else:
                    batch, batch_frames = [], 0.0
        if not drop_residual and batch:
            batches.append(batch)
        self.batches = batches

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        if self.random_seed is not None:
            g = np.random.default_rng(self.random_seed + self.epoch)
            order = g.permutation(len(self.batches))
            return iter([self.batches[i] for i in order])
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


class SampleBatchSampler:
    """batch_size_type="sample": fixed number of sequences per batch, length-
    sorted to minimize padding, epoch-seeded batch shuffle (reference
    trainer.py:283-292 SequentialSampler + fixed batch_size path)."""

    def __init__(self, dataset, batch_size: int, random_seed: int | None = None, drop_residual: bool = False):
        order = sorted(range(len(dataset)), key=lambda i: dataset.get_frame_len(i))
        self.batches = [order[i : i + batch_size] for i in range(0, len(order), batch_size)]
        if drop_residual and self.batches and len(self.batches[-1]) < batch_size:
            self.batches.pop()
        self.random_seed = random_seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        if self.random_seed is not None:
            g = np.random.default_rng(self.random_seed + self.epoch)
            return iter([self.batches[i] for i in g.permutation(len(self.batches))])
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def pad_frames_to(n: int, multiple: int = 256) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def collate_batch(items: list[dict], vocab, tokenizer: str, frame_multiple: int = 256,
                  mel_len: int | None = None, text_len: int | None = None) -> dict:
    """Pad mels to a bucketed max length and tokenize texts.
    Returns {"mel" [b,n,d], "text_ids" [b,nt], "lens" [b]} as numpy.

    ``mel_len``/``text_len`` pin the padded widths — multi-host training needs
    every process to collate ITS slice to the same global shapes without
    seeing other hosts' rows (widths are derived from sampler metadata)."""
    from f5_tts_tpu.infer.pipeline import text_to_ids

    lens = np.asarray([it["mel"].shape[0] for it in items], np.int32)
    n = mel_len if mel_len is not None else pad_frames_to(int(lens.max()), frame_multiple)
    d = items[0]["mel"].shape[1]
    mel = np.zeros((len(items), n, d), np.float32)
    for i, it in enumerate(items):
        m = it["mel"][:n]
        mel[i, : len(m)] = m
    lens = np.minimum(lens, n)
    ids = text_to_ids([it["text"] for it in items], vocab, tokenizer)
    # pad text to a stable width too (text <= frames always holds downstream)
    nt = text_len if text_len is not None else pad_frames_to(ids.shape[1], 64)
    if ids.shape[1] < nt:
        ids = np.pad(ids, ((0, 0), (0, nt - ids.shape[1])), constant_values=-1)
    else:
        ids = ids[:, :nt]
    return {"mel": mel, "text_ids": ids, "lens": lens}


def collate_wav_batch(items: list[dict], vocab, tokenizer: str, mel_cfg: MelConfig,
                      frame_multiple: int = 256, mel_len: int | None = None,
                      text_len: int | None = None) -> dict:
    """Wav-in collate for the IN-GRAPH mel path: the host only reflect-pads
    and buckets the raw waveforms; the train step extracts log-mel on the
    accelerator (the reference likewise computes mel inside the model
    forward — modules.py MelSpec — not in the dataloader).

    Returns {"wav" [b, S] int16, "wav_scale" [b] f32, "text_ids" [b, nt],
    "lens" [b]} where S = (n-1)*hop + n_fft yields exactly ``n`` frames from
    ops/mel.log_mel_prepadded and lens match the mel-path collate.  The wav
    ships int16 + per-row dequant scale — half the host->device bytes (the
    sources are 16-bit PCM; requantization error ~3e-5 is far below bf16
    training noise), dequantized in-graph by train_step.
    """
    from f5_tts_tpu.infer.pipeline import text_to_ids
    from f5_tts_tpu.ops.mel import num_frames, stft_pad_amount

    hop = mel_cfg.hop_length
    frames = np.asarray([num_frames(len(it["wav"]), mel_cfg) for it in items], np.int32)
    n = mel_len if mel_len is not None else pad_frames_to(int(frames.max()), frame_multiple)
    pad = stft_pad_amount(mel_cfg)
    S = (n - 1) * hop + mel_cfg.n_fft
    wav = np.zeros((len(items), S), np.int16)
    scale = np.ones((len(items),), np.float32)
    for i, it in enumerate(items):
        w = np.asarray(it["wav"], np.float32)
        if len(w) <= pad:  # reflect-pad needs len > pad
            w = np.pad(w, (0, pad + 1 - len(w)))
        p = np.pad(w, pad, mode="reflect")[:S]
        sc = max(float(np.abs(p).max()), 1.0)  # normalize only if it would clip
        scale[i] = sc
        wav[i, : len(p)] = np.round(p / sc * 32767.0).astype(np.int16)
    lens = np.minimum(frames, n)
    ids = text_to_ids([it["text"] for it in items], vocab, tokenizer)
    nt = text_len if text_len is not None else pad_frames_to(ids.shape[1], 64)
    if ids.shape[1] < nt:
        ids = np.pad(ids, ((0, 0), (0, nt - ids.shape[1])), constant_values=-1)
    else:
        ids = ids[:, :nt]
    return {"wav": wav, "wav_scale": scale, "text_ids": ids, "lens": lens}


def load_dataset(
    dataset_name: str,
    tokenizer: str = "pinyin",
    dataset_type: str = "CustomDataset",
    audio_type: str = "raw",
    mel_cfg: MelConfig = MelConfig(),
    data_root: str = "data",
) -> CustomDataset:
    """Reference load_dataset (dataset.py:247-307): reads
    data/<name>_<tokenizer>/raw.arrow + duration.json."""
    from datasets import Dataset as ArrowDataset
    from datasets import load_from_disk

    if dataset_type == "CustomDataset":
        path = os.path.join(data_root, f"{dataset_name}_{tokenizer}")
    elif dataset_type == "CustomDatasetPath":
        path = dataset_name
    else:
        raise ValueError(f"unsupported dataset_type {dataset_type}")
    arrow = os.path.join(path, "mel.arrow" if audio_type == "mel" else "raw.arrow")
    if os.path.isfile(arrow):
        data = ArrowDataset.from_file(arrow)
    else:
        data = load_from_disk(os.path.join(path, "raw"))
    with open(os.path.join(path, "duration.json"), "r", encoding="utf-8") as f:
        durations = json.load(f)["duration"]
    return CustomDataset(
        data, durations=durations, mel_cfg=mel_cfg, preprocessed_mel=(audio_type == "mel")
    )

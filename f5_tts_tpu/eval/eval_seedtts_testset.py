"""Seed-TTS testset WER/SIM scoring (reference eval/eval_seedtts_testset.py) —
preset wrapper over eval_testset."""

from __future__ import annotations

import argparse

from f5_tts_tpu.eval import eval_testset


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--eval_task", default="wer", choices=["wer", "sim"])
    p.add_argument("-l", "--lang", default="en", choices=["en", "zh"])
    p.add_argument("-g", "--gen_wav_dir", required=True)
    p.add_argument("--metalst_root", default="data")
    p.add_argument("--ckpt_dir", default="checkpoints")
    p.add_argument("--sim_ckpt", default="checkpoints/wavlm_large_finetune.pth")
    a = p.parse_args(argv)
    return eval_testset.main([
        "-e", a.eval_task, "-l", a.lang, "-g", a.gen_wav_dir,
        "-t", f"seedtts_test_{a.lang}", "--metalst_root", a.metalst_root,
        "--ckpt_dir", a.ckpt_dir, "--sim_ckpt", a.sim_ckpt,
    ])


if __name__ == "__main__":
    main()

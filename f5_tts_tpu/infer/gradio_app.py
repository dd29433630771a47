"""Gradio web UI for inference (reference src/f5_tts/infer/infer_gradio.py).

Tabs: Basic TTS (ref audio + ref text -> gen text), Multi-Speech (``[voice]``
tags with per-voice refs), and a custom-model loader.  The voice-chat tab from
the reference requires a local LLM and is omitted in the zero-egress build.

gradio is an optional dependency — importing this module without it raises a
clear error; everything else in the package works without gradio.
"""

from __future__ import annotations

import re

import numpy as np


def build_app(tts=None):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed; `pip install gradio` to use the web UI"
        ) from e

    from f5_tts_tpu.audio.preprocess import preprocess_ref_audio_text
    from f5_tts_tpu.infer import pipeline as P
    from f5_tts_tpu.infer.api import F5TTS

    state = {"tts": tts}

    def ensure_model(model_name, ckpt_file, vocab_file):
        if state["tts"] is None or getattr(state["tts"], "_ui_key", None) != (model_name, ckpt_file):
            state["tts"] = F5TTS(model=model_name, ckpt_file=ckpt_file, vocab_file=vocab_file or "")
            state["tts"]._ui_key = (model_name, ckpt_file)
        return state["tts"]

    def basic_tts(ref_audio, ref_text, gen_text, model_name, ckpt_file, vocab_file,
                  remove_silence, cross_fade_duration, nfe_step, speed, seed):
        tts_obj = ensure_model(model_name, ckpt_file, vocab_file)
        wav, sr, spec = tts_obj.infer(
            ref_audio, ref_text, gen_text,
            cross_fade_duration=cross_fade_duration, nfe_step=int(nfe_step),
            speed=speed, remove_silence=remove_silence,
            seed=int(seed) if seed else None,
        )
        return (sr, (np.clip(wav, -1, 1) * 32767).astype(np.int16)), str(tts_obj.seed)

    def multi_tts(gen_text, main_audio, main_text, model_name, ckpt_file, vocab_file, nfe_step):
        tts_obj = ensure_model(model_name, ckpt_file, vocab_file)
        voices = {"main": {"ref_audio": main_audio, "ref_text": main_text}}
        segments = []
        for text in re.split(r"(?=\[\w+\])", gen_text):
            if not text.strip():
                continue
            m = re.match(r"\[(\w+)\]", text)
            voice = m[1] if m and m[1] in voices else "main"
            text = re.sub(r"\[(\w+)\]", "", text).strip()
            v = voices[voice]
            ref, rtext = preprocess_ref_audio_text(v["ref_audio"], v["ref_text"])
            wav, sr, _ = P.infer_process(
                tts_obj.engine, ref, rtext, text, tts_obj.vocab, tokenizer=tts_obj.tokenizer,
                opts=P.PipelineOptions(),
            )
            if wav is not None:
                segments.append(wav)
        if not segments:
            return None
        final = np.concatenate(segments)
        return (tts_obj.target_sample_rate, (np.clip(final, -1, 1) * 32767).astype(np.int16))

    with gr.Blocks(title="F5-TTS TPU") as app:
        gr.Markdown("# F5-TTS (TPU build)\nZero-shot voice cloning on TPU.")
        with gr.Row():
            model_name = gr.Dropdown(
                ["F5TTS_v1_Base", "F5TTS_Base", "E2TTS_Base", "F5TTS_v1_Small"],
                value="F5TTS_v1_Base", label="Model")
            ckpt_file = gr.Textbox(label="Checkpoint path (.safetensors/.pt/.npz)")
            vocab_file = gr.Textbox(label="Vocab path (optional)")
        with gr.Tab("Basic TTS"):
            ref_audio = gr.Audio(label="Reference audio", type="filepath")
            ref_text = gr.Textbox(label="Reference text (empty = needs local ASR)")
            gen_text = gr.Textbox(label="Text to generate", lines=4)
            with gr.Accordion("Advanced", open=False):
                remove_silence = gr.Checkbox(label="Remove silences", value=False)
                cross_fade = gr.Slider(0.0, 1.0, value=0.15, label="Cross-fade (s)")
                nfe = gr.Slider(4, 64, value=32, step=2, label="NFE steps")
                speed = gr.Slider(0.3, 2.0, value=1.0, label="Speed")
                seed = gr.Textbox(label="Seed (empty = random)")
            out_audio = gr.Audio(label="Synthesized audio")
            out_seed = gr.Textbox(label="Used seed")
            gr.Button("Synthesize").click(
                basic_tts,
                inputs=[ref_audio, ref_text, gen_text, model_name, ckpt_file, vocab_file,
                        remove_silence, cross_fade, nfe, speed, seed],
                outputs=[out_audio, out_seed],
            )
        with gr.Tab("Voice Chat"):
            gr.Markdown(
                "Conversational TTS (reference voice-chat tab): needs a local"
                " chat LLM snapshot via $F5_TTS_TPU_CHAT_MODEL (e.g."
                " Qwen2.5-3B-Instruct) and a local Whisper for speech input."
            )
            chat_ref = gr.Audio(label="Voice reference", type="filepath")
            chat_ref_text = gr.Textbox(label="Voice reference text")
            chat_in = gr.Textbox(label="Say something")
            chat_out_text = gr.Textbox(label="Assistant reply")
            chat_out_audio = gr.Audio(label="Spoken reply")

            def chat_turn(user_text, ref_audio_p, ref_text_p, model_name, ckpt_file, vocab_file):
                import os as _os

                model_path = _os.environ.get("F5_TTS_TPU_CHAT_MODEL")
                if not model_path:
                    return "(set $F5_TTS_TPU_CHAT_MODEL to a local chat model)", None
                from transformers import pipeline as hf_pipeline

                chat = hf_pipeline("text-generation", model=model_path, device="cpu")
                sys_prompt = (
                    "You are not an AI assistant, you are whoever the user says you are."
                    " Keep your answers under two sentences."
                )
                out = chat(
                    [{"role": "system", "content": sys_prompt},
                     {"role": "user", "content": user_text}],
                    max_new_tokens=120,
                )
                reply = out[0]["generated_text"][-1]["content"]
                tts_obj = ensure_model(model_name, ckpt_file, vocab_file)
                wav, sr, _ = tts_obj.infer(ref_audio_p, ref_text_p, reply)
                return reply, (sr, (np.clip(wav, -1, 1) * 32767).astype(np.int16))

            gr.Button("Send").click(
                chat_turn,
                inputs=[chat_in, chat_ref, chat_ref_text, model_name, ckpt_file, vocab_file],
                outputs=[chat_out_text, chat_out_audio],
            )
        with gr.Tab("Multi-Speech"):
            gr.Markdown("Use `[main]` voice tags in the text.")
            m_audio = gr.Audio(label="Main voice reference", type="filepath")
            m_text = gr.Textbox(label="Main voice reference text")
            m_gen = gr.Textbox(label="Script with [voice] tags", lines=6)
            m_nfe = gr.Slider(4, 64, value=32, step=2, label="NFE steps")
            m_out = gr.Audio(label="Synthesized audio")
            gr.Button("Synthesize").click(
                multi_tts,
                inputs=[m_gen, m_audio, m_text, model_name, ckpt_file, vocab_file, m_nfe],
                outputs=[m_out],
            )
    return app


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(prog="f5-tts_infer-gradio")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--share", action="store_true")
    args = p.parse_args(argv)
    app = build_app()
    app.queue().launch(server_name=args.host, server_port=args.port, share=args.share)


if __name__ == "__main__":
    main()

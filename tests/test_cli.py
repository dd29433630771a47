"""CLI + socket server end-to-end smoke tests (tiny random model, CPU)."""

import os
import socket
import threading
import time

import numpy as np
import pytest

from f5_tts_tpu.audio.io import load_wav, save_wav


@pytest.fixture(scope="module")
def ref_wav_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aud") / "ref.wav")
    sr = 24000
    t = np.arange(int(sr * 1.2)) / sr
    wav = (0.2 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    save_wav(path, wav, sr)
    return path


def test_infer_cli_end_to_end(ref_wav_path, tmp_path):
    from f5_tts_tpu.infer.cli import main

    out = main([
        "--model", "F5TTS_Tiny", "--init_random",
        "--ref_audio", ref_wav_path,
        "--ref_text", "a simple tone reference.",
        "--gen_text", "hello world, this is a generated sentence.",
        "--output_dir", str(tmp_path), "--output_file", "out.wav",
        "--nfe_step", "2",
    ])
    assert out is not None and os.path.isfile(out)
    wav, sr = load_wav(out)
    assert sr == 24000 and len(wav) > 1000


def test_infer_cli_toml_config(ref_wav_path, tmp_path):
    from f5_tts_tpu.infer.cli import main

    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        f'''
model = "F5TTS_Tiny"
init_random = true
ref_audio = "{ref_wav_path}"
ref_text = "a simple tone reference."
gen_text = "[main] config driven. [alt] with another voice."
output_dir = "{tmp_path}"
output_file = "toml_out.wav"
nfe_step = 2

[voices.alt]
ref_audio = "{ref_wav_path}"
ref_text = "a simple tone reference."
'''
    )
    out = main(["-c", str(cfg)])
    assert out is not None and os.path.isfile(out)


def test_socket_server_stream(ref_wav_path):
    from f5_tts_tpu.infer.api import F5TTS
    from f5_tts_tpu.infer.socket_server import TTSStreamingProcessor, start_server
    from f5_tts_tpu.infer.socket_client import listen_to_f5tts

    tts = F5TTS(model="F5TTS_Tiny", init_random=True, nfe_step=2, device="cpu")
    proc = TTSStreamingProcessor(tts, ref_wav_path, "a simple tone reference.")
    port = 29431
    th = threading.Thread(target=start_server, args=("127.0.0.1", port, proc), daemon=True)
    th.start()
    time.sleep(0.5)
    wav = listen_to_f5tts("stream me some audio please.", "127.0.0.1", port)
    assert len(wav) > 1000
    assert np.isfinite(wav).all()

"""gRPC serving stack: server + sync/async clients + concurrency benchmark
(reference runtime/triton_trtllm/client_grpc.py methodology)."""

import asyncio
import json

import numpy as np
import pytest

grpc = pytest.importorskip("grpc")

from f5_tts_tpu.runtime.grpc_api import f5tts_pb2 as pb
from f5_tts_tpu.runtime.grpc_api.stubs import F5TTSStub
from f5_tts_tpu.runtime import grpc_client as C
from f5_tts_tpu.runtime.grpc_server import make_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from f5_tts_tpu.audio.io import save_wav
    from f5_tts_tpu.infer.api import F5TTS

    tmp = tmp_path_factory.mktemp("grpc")
    sr = 24000
    t = np.arange(int(sr * 1.0)) / sr
    ref_path = str(tmp / "ref.wav")
    save_wav(ref_path, 0.2 * np.sin(2 * np.pi * 220 * t), sr)

    tts = F5TTS(model="F5TTS_Tiny", init_random=True, nfe_step=2, device="cpu")
    srv, port = make_server(tts, ref_path, "a simple tone reference.",
                            port=0, host="127.0.0.1", max_batch=4,
                            queue_delay_ms=100.0)
    srv.start()
    yield f"127.0.0.1:{port}", ref_path
    srv.stop(grace=None)


def test_health_and_synthesize(server):
    addr, _ = server
    with grpc.insecure_channel(addr) as ch:
        stub = F5TTSStub(ch)
        assert stub.Health(pb.HealthRequest()).status == "ok"
        resp = stub.Synthesize(pb.SynthesizeRequest(
            target_text="hello world.", seed=3, has_seed=True))
        assert resp.sample_rate == 24000
        pcm = np.frombuffer(resp.waveform, dtype="<i2")
        assert len(pcm) > 0 and abs(resp.duration_s - len(pcm) / 24000) < 1e-3

        # determinism: same seed -> same waveform
        resp2 = stub.Synthesize(pb.SynthesizeRequest(
            target_text="hello world.", seed=3, has_seed=True))
        assert resp.waveform == resp2.waveform


def test_streaming_chunks_concat_to_unary(server):
    addr, _ = server
    with grpc.insecure_channel(addr) as ch:
        stub = F5TTSStub(ch)
        req = pb.SynthesizeRequest(target_text="stream me please.", seed=5, has_seed=True)
        unary = stub.Synthesize(req).waveform
        chunks = [r.waveform for r in stub.SynthesizeStream(req)]
        assert len(chunks) >= 1
        assert b"".join(chunks) == unary


def test_request_supplied_reference(server, tmp_path):
    from f5_tts_tpu.audio.io import save_wav

    addr, _ = server
    sr = 24000
    t = np.arange(int(sr * 0.8)) / sr
    other = str(tmp_path / "other.wav")
    save_wav(other, 0.15 * np.sin(2 * np.pi * 330 * t), sr)
    with open(other, "rb") as f:
        wav_bytes = f.read()
    with grpc.insecure_channel(addr) as ch:
        stub = F5TTSStub(ch)
        resp = stub.Synthesize(pb.SynthesizeRequest(
            target_text="custom reference request.",
            reference_wav=wav_bytes, reference_text="another tone.",
            seed=1, has_seed=True))
        assert len(resp.waveform) > 0


def test_concurrent_benchmark_and_server_stats(server, tmp_path):
    addr, _ = server
    prompts = C.DEFAULT_PROMPTS[:6]
    res = asyncio.run(C.run_benchmark(
        addr, prompts, num_tasks=3, log_dir=str(tmp_path), name="test"))
    assert res["rtf"] > 0 and res["total_audio_s"] > 0
    assert res["latency_ms_p99"] >= res["latency_ms_p50"]
    # reference-format report file
    report = (tmp_path / "rtf-test.txt").read_text()
    assert report.startswith("RTF: ")
    assert "latency_99_percentile_ms" in report
    # the server's dynamic batcher must have merged concurrent RPCs
    stats = res["server_stats"]
    assert stats["requests"] >= 6
    assert stats["avg_batch_size"] > 1.0, stats


def test_split_data_matches_reference_semantics():
    assert C.split_data(list(range(5)), 2) == [[0, 1, 2], [3, 4]]
    assert C.split_data(list(range(4)), 4) == [[0], [1], [2], [3]]
    assert C.split_data(list(range(3)), 5) == [[0], [1], [2]]

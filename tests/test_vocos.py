"""Golden test: Vocos vocoder vs a fresh torch oracle (vocos-mel-24khz arch)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from f5_tts_tpu.models import vocos as V
from tests.oracles import torch_layers as O


def torch_vocos_decode(p, mel, cfg):
    """mel: [b, n, mels] -> wav, replicating vocos.models.VocosBackbone +
    heads.ISTFTHead with torch.istft."""
    x = O.conv1d_ncw(p["embed"], mel.transpose(1, 2)).transpose(1, 2)
    x = F.layer_norm(x, (cfg.dim,), O.t(p["norm"]["weight"]), O.t(p["norm"]["bias"]), eps=1e-6)
    for bp in p["blocks"]:
        res = x
        y = O.conv1d_ncw(bp["dwconv"], x.transpose(1, 2), groups=cfg.dim).transpose(1, 2)
        y = F.layer_norm(y, (cfg.dim,), O.t(bp["norm"]["weight"]), O.t(bp["norm"]["bias"]), eps=1e-6)
        y = O.linear(bp["pwconv1"], y)
        y = F.gelu(y)
        y = O.linear(bp["pwconv2"], y)
        x = res + O.t(bp["gamma"]) * y
    x = F.layer_norm(x, (cfg.dim,), O.t(p["final_norm"]["weight"]), O.t(p["final_norm"]["bias"]), eps=1e-6)
    x = O.linear(p["head"], x).transpose(1, 2)  # [b, n_fft+2, n]
    mag, phase = x.chunk(2, dim=1)
    mag = torch.exp(mag).clip(max=1e2)
    S = mag * (torch.cos(phase) + 1j * torch.sin(phase))
    wav = torch.istft(
        S, cfg.n_fft, hop_length=cfg.hop_length, win_length=cfg.n_fft,
        window=torch.hann_window(cfg.n_fft), center=True,
    )
    return wav


def test_vocos_decode_matches_torch():
    cfg = V.VocosConfig(input_channels=20, dim=64, intermediate_dim=128, num_layers=3)
    params = V.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((2, 17, 20)).astype(np.float32)
    got = np.asarray(V.decode(params, jnp.asarray(mel), cfg))
    want = torch_vocos_decode(params, torch.from_numpy(mel), cfg).numpy()
    assert got.shape == want.shape == (2, 16 * cfg.hop_length)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
    assert np.abs(got - want).mean() < 1e-4


def test_vocos_default_config_shapes():
    cfg = V.VocosConfig()
    params = V.init(jax.random.PRNGKey(1), cfg)
    mel = jnp.zeros((1, 11, 100))
    wav = V.decode(params, mel, cfg)
    assert wav.shape == (1, 10 * 256)


def test_padded_decode_matches_exact_length_decode():
    """The engine vocodes a bucket-padded mel (tail filled with the log-mel
    silence floor) and trims; verify the trimmed waveform matches decoding the
    exact-length mel (design check for engine.py's SILENCE_FLOOR padding)."""
    cfg = V.VocosConfig(input_channels=20, dim=64, intermediate_dim=128, num_layers=3)
    params = V.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(8)
    n_real, n_pad = 40, 64
    mel_real = rng.standard_normal((1, n_real, 20)).astype(np.float32)
    floor = float(np.log(1e-5))
    mel_padded = np.full((1, n_pad, 20), floor, np.float32)
    mel_padded[:, :n_real] = mel_real

    exact = np.asarray(V.decode(params, jnp.asarray(mel_real), cfg))[0]
    # lens-masked decode of the padded mel is numerically identical to exact
    lens = jnp.asarray(np.array([n_real], np.int32))
    masked = np.asarray(V.decode(params, jnp.asarray(mel_padded), cfg, lens=lens))[0][: len(exact)]
    np.testing.assert_allclose(masked, exact, atol=1e-5)
    # unmasked floor-padded decode only deviates in the conv-receptive-field
    # boundary region, at small amplitude
    padded = np.asarray(V.decode(params, jnp.asarray(mel_padded), cfg))[0][: len(exact)]
    rf_frames = 3 * (cfg.num_layers + 1) + cfg.n_fft // cfg.hop_length
    tail = rf_frames * cfg.hop_length
    np.testing.assert_allclose(padded[:-tail], exact[:-tail], atol=1e-4)

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


def test_vocos_converter_ignores_feature_extractor_keys():
    """Encodec-bundle edge case (reference utils_infer.py:110-124): Vocos
    checkpoints whose feature extractor is EncodecFeatures ship partial
    ``feature_extractor.*`` key sets, which the reference must back-fill
    before a strict ``load_state_dict``. Our converter reads only
    backbone/head keys, so any feature_extractor payload — partial, full, or
    absent — converts identically."""
    from f5_tts_tpu.utils import ckpt as C

    cfg = V.VocosConfig(input_channels=20, dim=64, intermediate_dim=128, num_layers=2)
    params = V.init(jax.random.PRNGKey(7), cfg)

    # fabricate the torch-layout state dict for these params
    state = {}

    def put_conv(name, p):
        state[f"{name}.weight"] = np.transpose(np.asarray(p["kernel"]), (2, 1, 0))
        if "bias" in p:
            state[f"{name}.bias"] = np.asarray(p["bias"])

    def put_lin(name, p):
        state[f"{name}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            state[f"{name}.bias"] = np.asarray(p["bias"])

    def put_ln(name, p):
        state[f"{name}.weight"] = np.asarray(p["weight"])
        state[f"{name}.bias"] = np.asarray(p["bias"])

    put_conv("backbone.embed", params["embed"])
    put_ln("backbone.norm", params["norm"])
    for i, bp in enumerate(params["blocks"]):
        b = f"backbone.convnext.{i}"
        put_conv(f"{b}.dwconv", bp["dwconv"])
        put_ln(f"{b}.norm", bp["norm"])
        put_lin(f"{b}.pwconv1", bp["pwconv1"])
        put_lin(f"{b}.pwconv2", bp["pwconv2"])
        state[f"{b}.gamma"] = np.asarray(bp["gamma"])
    put_ln("backbone.final_layer_norm", params["final_norm"])
    put_lin("head.out", params["head"])

    # extra encode-side keys, as in vocos-encodec bundles
    state["feature_extractor.encodec.encoder.layers.0.conv.conv.weight"] = np.zeros((4, 1, 7), np.float32)
    state["feature_extractor.encodec.quantizer.vq.layers.0._codebook.embed"] = np.zeros((16, 4), np.float32)

    got = C.vocos_params_from_state(state, num_layers=cfg.num_layers)
    mel = np.random.default_rng(11).standard_normal((1, 13, 20)).astype(np.float32)
    a = np.asarray(V.decode(params, jnp.asarray(mel), cfg))
    b = np.asarray(V.decode(got, jnp.asarray(mel), cfg))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_magnitude_clip_after_exp():
    """The 1e2 magnitude cap applies AFTER exp (vocos heads.py ISTFTHead
    ``exp(x).clip(max=1e2)``): a head producing huge log-magnitudes must
    yield a finite waveform with mag capped at 100, not exp(logmag)."""
    cfg = V.VocosConfig(input_channels=20, dim=64, intermediate_dim=128, num_layers=3)
    params = V.init(jax.random.PRNGKey(0), cfg)
    params["head"]["bias"] = params["head"]["bias"] + 50.0  # log-mag ~50 -> exp 5e21
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((1, 17, 20)).astype(np.float32)
    wav = np.asarray(V.decode(params, jnp.asarray(mel), cfg))
    assert np.isfinite(wav).all()
    # a frame of all-100 magnitudes bounds the waveform far below exp(50)
    assert np.abs(wav).max() < 1e5

"""Direct parity vs the REFERENCE'S OWN model code (loaded read-only from
/root/reference/src via tests/refimport/loader.py).

These close the oracle-author-correlation gap (VERDICT r2 weak #7): the
builder-written torch oracles in tests/oracles/ could in principle share a
misreading of the reference with the JAX code; here the comparator IS the
reference implementation (only x_transformers rope / torchdiffeq euler are
stubbed — see loader docstring).

Weight injection goes through utils/ckpt.dit_params_to_state — the same
converter used for released-checkpoint loading — so these tests also verify
that the exported key set matches the reference model's state_dict exactly.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from f5_tts_tpu.models import dit as D
from f5_tts_tpu.models.configs import DiTConfig
from f5_tts_tpu.utils import ckpt as C
from tests.refimport.loader import reference_models
from tests.test_dit import SMALL, make_params, _inputs

_ALLOWED_MISSING = {"rotary_embed.inv_freq"}  # constant rope buffer


def _load_into_ref(ref_model, state_np):
    state = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_np.items()}
    missing, unexpected = ref_model.load_state_dict(state, strict=False)
    missing = set(missing) - _ALLOWED_MISSING
    assert not missing, f"converter did not produce keys: {sorted(missing)[:10]}"
    assert not unexpected, f"converter produced unknown keys: {sorted(unexpected)[:10]}"


def _ref_dit(ref, cfg: DiTConfig, **over):
    kw = dict(
        dim=cfg.dim, depth=cfg.depth, heads=cfg.heads, dim_head=cfg.dim_head,
        ff_mult=cfg.ff_mult, mel_dim=cfg.mel_dim, text_num_embeds=cfg.text_num_embeds,
        text_dim=cfg.text_dim, text_mask_padding=cfg.text_mask_padding,
        text_embedding_average_upsampling=cfg.text_embedding_average_upsampling,
        qk_norm=cfg.qk_norm, conv_layers=cfg.conv_layers, pe_attn_head=cfg.pe_attn_head,
        long_skip_connection=cfg.long_skip_connection,
        attn_mask_enabled=True,
    )
    kw.update(over)
    m = ref.dit.DiT(**kw)
    m.eval()
    return m


@pytest.mark.parametrize("variant", ["base", "long_skip", "qk_norm", "pe_attn_head", "avg_upsample"])
def test_dit_forward_matches_reference_code(variant):
    cfg = SMALL
    if variant == "long_skip":
        cfg = dataclasses.replace(cfg, long_skip_connection=True)
    elif variant == "qk_norm":
        cfg = dataclasses.replace(cfg, qk_norm="rms_norm")
    elif variant == "pe_attn_head":
        cfg = dataclasses.replace(cfg, pe_attn_head=1)
    elif variant == "avg_upsample":
        cfg = dataclasses.replace(cfg, text_embedding_average_upsampling=True)
    params = make_params(cfg, seed=3)
    x, cond, text, time, mask = _inputs(cfg)
    lens = mask.sum(axis=1).astype(np.int32)

    got = np.asarray(D.forward_with_text(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
        jnp.asarray(time), mask=jnp.asarray(mask), lens=jnp.asarray(lens),
        backend="sdpa",
    ))

    with reference_models() as ref:
        m = _ref_dit(ref, cfg)
        _load_into_ref(m, C.dit_params_to_state(params, cfg))
        with torch.no_grad():
            want = m(
                torch.from_numpy(x), torch.from_numpy(cond),
                torch.from_numpy(text).long(), torch.from_numpy(time),
                mask=torch.from_numpy(mask),
            ).numpy()

    mm = mask[:, :, None]
    np.testing.assert_allclose(got * mm, want * mm, atol=2e-3, rtol=1e-3)
    assert np.abs((got - want) * mm).mean() < 1e-4


def test_dit_cfg_infer_matches_reference_code():
    """Fused-CFG packed forward (reference dit.py:337-347 cfg_infer path)."""
    cfg = SMALL
    params = make_params(cfg, seed=5)
    x, cond, text, time, mask = _inputs(cfg)
    lens = mask.sum(axis=1).astype(np.int32)

    te_c = D.text_embedding(params, cfg, jnp.asarray(text), x.shape[1], lens=jnp.asarray(lens))
    te_u = D.text_embedding(params, cfg, jnp.asarray(text), x.shape[1],
                            lens=jnp.asarray(lens), drop_text=True)
    pred, null = D.forward_cfg(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), te_c, te_u,
        jnp.asarray(time), mask=jnp.asarray(mask), backend="sdpa",
    )

    with reference_models() as ref:
        m = _ref_dit(ref, cfg)
        _load_into_ref(m, C.dit_params_to_state(params, cfg))
        with torch.no_grad():
            packed = m(
                torch.from_numpy(x), torch.from_numpy(cond),
                torch.from_numpy(text).long(), torch.from_numpy(time),
                mask=torch.from_numpy(mask), cfg_infer=True,
            ).numpy()
    b = x.shape[0]
    mm = mask[:, :, None]
    np.testing.assert_allclose(np.asarray(pred) * mm, packed[:b] * mm, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(null) * mm, packed[b:] * mm, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("use_epss", [True, False])
def test_cfm_sample_matches_reference_code(use_epss):
    """Full sampler parity: our CFM sample vs the reference CFM.sample running
    the reference's own ODE loop (euler via the torchdiffeq stub), EPSS or
    linspace timesteps, sway warp, fused-CFG, and cond overwrite (reference
    cfm.py:83-229).  Noise is matched by replaying the reference's per-row
    ``torch.manual_seed(seed); randn(dur, d)`` draw."""
    from f5_tts_tpu.models import cfm as CF

    cfg = SMALL
    params = make_params(cfg, seed=9)
    rng = np.random.default_rng(21)
    b, n_ref, n_tot, nt = 2, 24, 48, 12
    cond_mel = rng.standard_normal((b, n_ref, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(1, cfg.text_num_embeds, (b, nt)).astype(np.int64)
    text[1, 8:] = -1
    nfe, cfg_strength, sway = 8, 2.0, -1.0

    with reference_models() as ref:
        mref = _ref_dit(ref, cfg)
        _load_into_ref(mref, C.dit_params_to_state(params, cfg))
        cfm_ref = ref.cfm.CFM(
            transformer=mref,
            mel_spec_kwargs=dict(n_mel_channels=cfg.mel_dim),
            vocab_char_map=None,
        ).eval()
        with torch.no_grad():
            out_ref, _ = cfm_ref.sample(
                cond=torch.from_numpy(cond_mel),
                text=torch.from_numpy(text),
                duration=n_tot,
                steps=nfe,
                cfg_strength=cfg_strength,
                sway_sampling_coef=sway,
                seed=0,
                use_epss=use_epss,
            )

    # replay the reference's noise draw: re-seeded per batch row
    y0_rows = []
    for _ in range(b):
        torch.manual_seed(0)
        y0_rows.append(torch.randn(n_tot, cfg.mel_dim))
    noise = torch.stack(y0_rows).numpy()

    opts = CF.SampleOptions(steps=nfe, cfg_strength=cfg_strength,
                            sway_sampling_coef=sway, use_epss=use_epss,
                            precompute_adaln=False)
    cond_padded = np.zeros((b, n_tot, cfg.mel_dim), np.float32)
    cond_padded[:, :n_ref] = cond_mel
    got = np.asarray(CF.sample(
        params, cfg, jnp.asarray(cond_padded), jnp.asarray(text.astype(np.int32)),
        jnp.asarray(np.full((b,), n_tot, np.int32)), jnp.asarray(noise),
        lens=jnp.asarray(np.full((b,), n_ref, np.int32)), opts=opts,
        backend="sdpa",
    ))
    want = out_ref.numpy()
    gen = slice(n_ref, n_tot)
    np.testing.assert_allclose(got[:, gen], want[:, gen], atol=5e-3, rtol=1e-2)
    assert np.abs(got[:, gen] - want[:, gen]).mean() < 5e-4


@pytest.mark.parametrize("drops", [(False, False), (True, False), (False, True)],
                         ids=["no_drop", "drop_audio", "drop_both"])
def test_cfm_loss_matches_reference_code(drops):
    """Training-loss parity: our CFM loss vs the reference CFM.forward
    (reference cfm.py:230-302) running the reference's own span-mask,
    interpolation, CFG-drop, and masked-mean logic.  Randomness is matched by
    replaying the reference's torch global-RNG draw sequence (frac_lengths →
    span start → x0 → time, cfm.py:260-274 + utils.py:69-77) and injecting the
    replayed tensors into our loss via its ``inject`` hook; the python-level
    ``random()`` drop decisions (cfm.py:286-288) are pinned by patching the
    freshly-loaded reference module's ``random`` symbol."""
    from f5_tts_tpu.models import cfm as CF

    drop_audio, drop_both = drops
    cfg = SMALL
    params = make_params(cfg, seed=11)
    rng = np.random.default_rng(33)
    b, n, nt = 2, 32, 12
    mel = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(1, cfg.text_num_embeds, (b, nt)).astype(np.int64)
    text[1, 9:] = -1
    lens = np.array([n, n - 7], np.int32)
    lens_t = torch.from_numpy(lens).long()

    with reference_models() as ref:
        mref = _ref_dit(ref, cfg)
        _load_into_ref(mref, C.dit_params_to_state(params, cfg))
        cfm_ref = ref.cfm.CFM(
            transformer=mref,
            mel_spec_kwargs=dict(n_mel_channels=cfg.mel_dim),
            vocab_char_map=None,
        ).eval()  # dropout off: deterministic, matches our dropout-free loss

        # pin the python-random drop draws (first → audio, second → both)
        draws = iter([0.0 if drop_audio else 0.99, 0.0 if drop_both else 0.99])
        ref.cfm.random = lambda: next(draws)

        # replay the torch global-RNG draw sequence of CFM.forward
        torch.manual_seed(7)
        frac = torch.zeros(b).float().uniform_(0.7, 1.0)
        u_start = torch.rand_like(frac)
        x0 = torch.randn(b, n, cfg.mel_dim)
        time = torch.rand(b)
        span = (frac * lens_t).long()
        start = ((lens_t - span) * u_start).long().clamp(min=0)
        pos = torch.arange(n)[None, :]
        span_mask = (pos >= start[:, None]) & (pos < (start + span)[:, None])

        torch.manual_seed(7)
        with torch.no_grad():
            loss_ref, _, _ = cfm_ref(
                torch.from_numpy(mel), torch.from_numpy(text), lens=lens_t
            )
        want = float(loss_ref)

    got = float(CF.loss(
        params, cfg, jnp.asarray(mel), jnp.asarray(text.astype(np.int32)),
        jnp.asarray(lens), jax.random.PRNGKey(0), backend="sdpa",
        inject=dict(
            x0=jnp.asarray(x0.numpy()), time=jnp.asarray(time.numpy()),
            span_mask=jnp.asarray(span_mask.numpy()),
            drop_audio=drop_audio, drop_both=drop_both,
        ),
    ))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_unett_forward_matches_reference_code():
    """UNetT (E2-TTS) vs reference backbones/unett.py, load direction: the
    reference model's own random-initialized state dict converts through
    utils/ckpt.unett_params_from_state (the released-checkpoint loader) and
    both forwards must agree."""
    from f5_tts_tpu.models import unett as U
    from tests.test_unett import SMALL as U_SMALL, _inputs as u_inputs

    cfg = U_SMALL
    x, cond, text, time, mask = u_inputs(cfg)

    with reference_models() as ref:
        torch.manual_seed(3)
        m = ref.unett.UNetT(
            dim=cfg.dim, depth=cfg.depth, heads=cfg.heads, dim_head=cfg.dim_head,
            ff_mult=cfg.ff_mult, mel_dim=cfg.mel_dim,
            text_num_embeds=cfg.text_num_embeds, text_dim=cfg.text_dim,
            text_mask_padding=cfg.text_mask_padding, conv_layers=cfg.conv_layers,
            pe_attn_head=cfg.pe_attn_head, skip_connect_type=cfg.skip_connect_type,
            attn_mask_enabled=True,
        ).eval()
        state = {k: v.numpy() for k, v in m.state_dict().items()}
        with torch.no_grad():
            want = m(
                torch.from_numpy(x), torch.from_numpy(cond),
                torch.from_numpy(text).long(), torch.from_numpy(time),
                mask=torch.from_numpy(mask),
            ).numpy()

    params = C.unett_params_from_state(state, cfg)
    got = np.asarray(U.forward_with_text(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
        jnp.asarray(time), mask=jnp.asarray(mask), backend="sdpa",
    ))
    mm = mask[:, :, None]
    np.testing.assert_allclose(got * mm, want * mm, atol=2e-3, rtol=1e-3)
    assert np.abs((got - want) * mm).mean() < 1e-4


def test_mmdit_forward_matches_reference_code():
    """MMDiT vs reference backbones/mmdit.py (dual-stream joint attention),
    load direction via utils/ckpt.mmdit_params_from_state."""
    from f5_tts_tpu.models import mmdit as M
    from tests.test_mmdit import SMALL as M_SMALL

    cfg = M_SMALL
    rng = np.random.default_rng(17)
    b, n, nt = 2, 32, 12
    x = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    text[1, 7:] = -1
    time = np.array([0.4, 0.6], dtype=np.float32)
    mask = np.zeros((b, n), dtype=bool)
    mask[0, :] = True
    mask[1, : n - 9] = True

    with reference_models() as ref:
        torch.manual_seed(4)
        m = ref.mmdit.MMDiT(
            dim=cfg.dim, depth=cfg.depth, heads=cfg.heads, dim_head=cfg.dim_head,
            ff_mult=cfg.ff_mult, mel_dim=cfg.mel_dim,
            text_num_embeds=cfg.text_num_embeds,
            text_mask_padding=cfg.text_mask_padding,
            attn_mask_enabled=True,
        ).eval()
        state = {k: v.numpy() for k, v in m.state_dict().items()}
        with torch.no_grad():
            want = m(
                torch.from_numpy(x), torch.from_numpy(cond),
                torch.from_numpy(text).long(), torch.from_numpy(time),
                mask=torch.from_numpy(mask),
            ).numpy()

    params = C.mmdit_params_from_state(state, cfg)
    got = np.asarray(M.forward_with_text(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
        jnp.asarray(time), mask=jnp.asarray(mask), backend="sdpa",
        attn_mask_enabled=True,
    ))
    mm = mask[:, :, None]
    np.testing.assert_allclose(got * mm, want * mm, atol=2e-3, rtol=1e-3)
    assert np.abs((got - want) * mm).mean() < 1e-4


def test_tokenizer_utils_match_reference_code(tmp_path):
    """Vocab load + id mapping vs the reference's own get_tokenizer /
    list_str_to_idx / list_str_to_tensor (reference model/utils.py:92-142):
    custom vocab file round-trip, ragged -1 padding, unknown->0, byte mode."""
    from f5_tts_tpu.text import tokenizer as T

    with reference_models() as ref:
        U = ref.utils
        vocab_lines = [" ", "a", "b", "ni3", "hao3", "。"]
        vp = tmp_path / "vocab.txt"
        vp.write_text("\n".join(vocab_lines) + "\n", encoding="utf-8")
        vmap_ref, vsz_ref = U.get_tokenizer(str(vp), "custom")
        vmap, vsz = T.get_tokenizer(str(vp), "custom")
        assert vmap == vmap_ref and vsz == vsz_ref

        texts = [["a", "b", "x"], ["ni3", "hao3"]]  # ragged, 'x' is OOV
        want = U.list_str_to_idx(texts, vmap_ref).numpy()
        got = T.tokens_to_ids(texts, vmap)
        np.testing.assert_array_equal(got, want)

        texts2 = ["hello", "hi"]
        want2 = U.list_str_to_tensor(texts2).numpy()
        got2 = T.tokens_to_ids(texts2, None)
        np.testing.assert_array_equal(got2, want2)

        assert T.get_tokenizer(None, "byte") == (None, 256)


def test_cfm_sample_duplicate_test_matches_reference_code():
    """duplicate_test/t_inter corner (reference cfm.py:205-209): ODE restarts
    at t_start from a blended state with a REDUCED step count
    steps*(1-t_start); both trajectories must agree."""
    from f5_tts_tpu.models import cfm as CF

    cfg = SMALL
    params = make_params(cfg, seed=9)
    rng = np.random.default_rng(23)
    b, n_ref, n_tot, nt = 2, 16, 40, 10
    cond_mel = rng.standard_normal((b, n_ref, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(1, cfg.text_num_embeds, (b, nt)).astype(np.int64)
    nfe, t_inter = 8, 0.5

    with reference_models() as ref:
        mref = _ref_dit(ref, cfg)
        _load_into_ref(mref, C.dit_params_to_state(params, cfg))
        cfm_ref = ref.cfm.CFM(
            transformer=mref,
            mel_spec_kwargs=dict(n_mel_channels=cfg.mel_dim),
            vocab_char_map=None,
        ).eval()
        with torch.no_grad():
            out_ref, _ = cfm_ref.sample(
                cond=torch.from_numpy(cond_mel), text=torch.from_numpy(text),
                duration=n_tot, steps=nfe, cfg_strength=2.0,
                sway_sampling_coef=-1.0, seed=0,
                duplicate_test=True, t_inter=t_inter,
            )

    y0_rows = []
    for _ in range(b):
        torch.manual_seed(0)
        y0_rows.append(torch.randn(n_tot, cfg.mel_dim))
    noise = torch.stack(y0_rows).numpy()

    opts = CF.SampleOptions(steps=nfe, cfg_strength=2.0, sway_sampling_coef=-1.0,
                            t_start=t_inter, precompute_adaln=False)
    cond_padded = np.zeros((b, n_tot, cfg.mel_dim), np.float32)
    cond_padded[:, :n_ref] = cond_mel
    got = np.asarray(CF.sample(
        params, cfg, jnp.asarray(cond_padded), jnp.asarray(text.astype(np.int32)),
        jnp.asarray(np.full((b,), n_tot, np.int32)), jnp.asarray(noise),
        lens=jnp.asarray(np.full((b,), n_ref, np.int32)), opts=opts,
        duplicate_test=True, backend="sdpa",
    ))
    want = out_ref.numpy()
    gen = slice(n_ref, n_tot)
    np.testing.assert_allclose(got[:, gen], want[:, gen], atol=5e-3, rtol=1e-2)
    assert np.abs(got[:, gen] - want[:, gen]).mean() < 5e-4

"""Durable persistent-cache location (utils/compile_cache.py): the fused NFE
graph costs 45-450 s of cold XLA compile, so warmed entries must survive the
environments that recreate ~/.cache (round-3 weak #1: a wiped home cache cost
a 454 s driver cold start)."""

import os

import jax

from f5_tts_tpu.utils import compile_cache as cc


def test_default_prefers_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("F5TTS_COMPILE_CACHE", str(tmp_path / "vol"))
    assert cc.default_cache_dir() == str(tmp_path / "vol")


def test_default_honors_jax_env(monkeypatch, tmp_path):
    """docker-compose mounts a volume at JAX_COMPILATION_CACHE_DIR; the
    helper must not shadow it with the repo-local default."""
    monkeypatch.delenv("F5TTS_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "jvol"))
    assert cc.default_cache_dir() == str(tmp_path / "jvol")


def test_default_is_repo_local_in_checkout(monkeypatch):
    monkeypatch.delenv("F5TTS_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    d = cc.default_cache_dir()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert d == os.path.join(root, ".cache", "jax_comp")


def test_enable_merges_home_entries(monkeypatch, tmp_path):
    home = tmp_path / "home_cache"
    home.mkdir()
    (home / "jit_foo-abc-cache").write_bytes(b"x" * 16)
    target = tmp_path / "repo_cache"
    monkeypatch.setattr(cc, "_HOME_CACHE", str(home))
    saved = (jax.config.jax_compilation_cache_dir,
             jax.config.jax_persistent_cache_min_compile_time_secs)
    try:
        got = cc.enable_persistent_cache(str(target))
        assert got == str(target)
        assert (target / "jit_foo-abc-cache").read_bytes() == b"x" * 16
        assert jax.config.jax_compilation_cache_dir == str(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", saved[0])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", saved[1])

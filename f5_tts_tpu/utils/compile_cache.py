"""Persistent XLA compilation-cache location, chosen for durability.

The fused NFE serving graph costs 45-450 s of remote XLA compile on a cold
cache (DEVELOPMENT.md "Cold-start / compile-cache invariant"), so WHERE the
persistent cache lives decides cold-start behavior.  Preference order:

1. explicit ``path`` argument,
2. ``$F5TTS_COMPILE_CACHE`` (deployment override, e.g. a mounted volume —
   the role of the reference's pre-built TRT engine directory,
   runtime/triton_trtllm/run.sh:18-112),
3. ``<repo>/.cache/jax_comp`` when running from a source checkout — build
   VMs are often recreated with the checkout as the only persistent mount,
   in which case ``~/.cache`` silently resets and every "warmed" graph
   recompiles (observed: this exact wipe cost a 454 s cold bench in round 3),
4. ``~/.cache/jax_comp`` otherwise (installed-package default).

Entries already present in the OTHER candidate location are merged in
(copy-if-missing) so switching locations never discards prior warmups.
"""

from __future__ import annotations

import os
import shutil

_HOME_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "jax_comp")


def _repo_root() -> str | None:
    """Repo root when imported from a source checkout, else None."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return root if os.path.isfile(os.path.join(root, "pyproject.toml")) else None


def default_cache_dir() -> str:
    env = os.environ.get("F5TTS_COMPILE_CACHE") or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR")  # docker-compose mounts a volume here
    if env:
        return env
    root = _repo_root()
    if root is not None:
        return os.path.join(root, ".cache", "jax_comp")
    return _HOME_CACHE


def _merge_entries(src: str, dst: str) -> int:
    if not os.path.isdir(src) or os.path.abspath(src) == os.path.abspath(dst):
        return 0
    n = 0
    for name in os.listdir(src):
        target = os.path.join(dst, name)
        if not os.path.exists(target):
            try:
                shutil.copy(os.path.join(src, name), target)
                n += 1
            except OSError:
                pass  # concurrent writer/reader races are benign: cache misses
    return n


def enable_persistent_cache(path: str | None = None,
                            min_compile_time_secs: float = 2.0) -> str:
    """Point jax at the durable persistent cache location (see module doc)
    and merge entries from the home-cache fallback.  Returns the directory.
    """
    import jax

    cache_dir = path or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    _merge_entries(_HOME_CACHE, cache_dir)
    changed = jax.config.jax_compilation_cache_dir != cache_dir
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    if changed:
        # the cache singleton binds its directory at first use; re-bind so a
        # process that already compiled elsewhere honors the new location
        from jax.experimental.compilation_cache import compilation_cache as jcc

        jcc.reset_cache()
    return cache_dir

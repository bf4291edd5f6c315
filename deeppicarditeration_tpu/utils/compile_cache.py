"""Persistent XLA compilation cache (opt-out).

Compiles through the remote-TPU tunnel take 1-5 min per jit signature and
dominate short-recipe wall time (CLAUDE.md). JAX's persistent compilation
cache survives processes. Measured caveat on the tunneled backend: local
cache hits do not reliably avoid the remote compile (one warm run 3m35s
vs 7m49s cold, but a later local-hit run still took 7m28s — the fast
case was evidently the terminal's own server-side cache). On a directly
attached TPU host the local cache pays as usual; enabling it is free
either way.

Enabled by the CLI and the bench/recipe scripts. Precedence:
  - DPI_NO_COMPILE_CACHE=1        -> disabled
  - JAX_COMPILATION_CACHE_DIR set -> respected (JAX reads it natively)
  - otherwise                     -> ~/.cache/deeppicarditeration_tpu/jax

Safe: entries are keyed by HLO + jax/backend versions, so stale hits
cannot occur; the cache is shared across experiments on purpose.
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Returns the cache dir in use, or None when disabled. Call before the
    first compile (any time before is fine — the config flag is read at
    compile time)."""
    if os.environ.get("DPI_NO_COMPILE_CACHE"):
        return None
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    existing = jax.config.jax_compilation_cache_dir
    if existing:
        return existing
    path = path or os.path.expanduser(
        "~/.cache/deeppicarditeration_tpu/jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default threshold only persists >1 s compiles; every signature that
    # matters here (tunnel compiles are minutes) clears it comfortably
    return path

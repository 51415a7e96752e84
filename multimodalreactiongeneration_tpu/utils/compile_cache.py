"""Persistent XLA compilation cache for the production CLIs.

The bucketed loaders (data/dataset.py BatchLoader) emit a bounded set of
static (B, T) shapes, but each distinct bucket still compiles the full
train/eval step once per process — tens of seconds per shape on a small
host. JAX's persistent compilation cache makes every shape a one-time
cost across ALL runs (the test suite and the multichip dryrun already
rely on it; this wires the same thing into `mrgen-train` / `mrgen-eval`).

No reference analog: eager PyTorch pays no compile cost; this is the
TPU-side equivalent of "warm start". Disable with
``trainer.compile_cache_dir=""`` (or ``eval.compile_cache_dir`` on the
inference CLI).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "~/.cache/mrgen-jax-cache"


def enable_compile_cache(cache_dir: str | None = DEFAULT_CACHE_DIR) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Empty/None disables (leaves JAX defaults untouched). Safe to call
    before or after backend init; idempotent.
    """
    if not cache_dir:
        return
    import jax

    # first-wins: the test suite / multichip dryrun point the cache at
    # their own dirs before the CLI runs — don't redirect mid-process
    if jax.config.jax_compilation_cache_dir:
        return

    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

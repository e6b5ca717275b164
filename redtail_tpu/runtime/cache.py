"""Persistent compilation cache — the TPU counterpart of the reference's
TensorRT plan files.

The reference serialized built engines to `.plan` / `.cache` files to cut
model load from minutes to <1 s (`sample_app/main.cpp:198-276`,
`tensor_net.cpp:194-213`, `/root/reference/README.md:39`). JAX has the
same capability built in: the persistent compilation cache keyed by HLO.
This module turns it on with sane defaults and exposes an explicit AOT
path (`aot_compile`) for ahead-of-time engine building at deploy time.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Callable, Optional

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "REDTAIL_TPU_CACHE", str(Path.home() / ".cache" / "redtail_tpu" / "xla"))


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Enable the JAX persistent compilation cache (idempotent)."""
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir


def aot_compile(fn: Callable, *example_args: Any):
    """Ahead-of-time compile: returns the executable (the "engine").

    `jax.jit(fn).lower(...).compile()` — the explicit analogue of
    `builder->buildCudaEngine` + `engine->serialize()`; combined with the
    persistent cache the serialized executable is reused across processes.
    """
    return jax.jit(fn).lower(*example_args).compile()

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
    """Enable the JAX persistent compilation cache (idempotent).

    The directory is keyed by BACKEND, and for the CPU backend also by
    a host-CPU-feature fingerprint: XLA:CPU cache entries embed AOT
    machine code whose target features are NOT part of the cache key —
    entries written on a different host loaded as mis-targeted AVX-512
    code here (observed: cpu_aot_loader feature-mismatch warnings,
    zstd-corrupt entries, then heap corruption / 'exception not
    rethrown' crashes in the pipeline). TPU entries are safe to share
    (same chip target)."""
    base = Path(cache_dir or DEFAULT_CACHE_DIR)
    backend = jax.default_backend()
    sub = backend
    if backend == "cpu":
        import hashlib
        try:
            with open("/proc/cpuinfo") as f:
                flags = next(line for line in f
                             if line.startswith("flags"))
        except (OSError, StopIteration):
            import platform
            flags = platform.processor() or "unknown"
        sub = "cpu-" + hashlib.sha1(flags.encode()).hexdigest()[:12]
    cache_dir = str(base / sub)
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


def save_engine(path, fn: Callable, *example_args: Any,
                extras: Optional[dict] = None) -> None:
    """Compile ``fn`` for ``example_args`` and serialize the EXECUTABLE
    to ``path`` — the true TRT plan-file equivalent
    (`sample_app/main.cpp:198-276`: engine->serialize() to .plan, load
    in <1 s).  Like a TRT plan the artifact is device/backend-specific;
    `load_engine` refuses a backend mismatch.

    ``extras``: optional pickled sidecar dict (e.g. the param pytree as
    numpy arrays, so a fresh process needs neither checkpoint nor model
    code).

    PORTABILITY: call this from a process that has not already compiled
    other XLA programs — repeated compiles suffix internal function
    names and the serialized artifact then fails to execute after
    deserialization elsewhere. Production engine builds go through
    `runtime.engine_builder.build_stereo_engine`, which isolates the
    compile in a pristine subprocess (the reference's offline TRT
    builder pass, `main.cpp:222-276`)."""
    import pickle

    from jax.experimental import serialize_executable

    # Compile WITHOUT the persistent cache: serializing a cache-loaded
    # executable produces an incomplete payload that fails to
    # deserialize in a fresh process ("Buffer Definition Event:
    # Function ... not found" — reproduced whenever
    # enable_compilation_cache ran first in this process).
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        # Also drop in-memory executables: serializing one that was
        # compiled under different cache/process state produced
        # artifacts whose function names don't resolve on a fresh
        # process ("... transpose_copy_fusion.1 not found").
        jax.clear_caches()
        compiled = aot_compile(fn, *example_args)
        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
    devs = set()
    for s in jax.tree_util.tree_leaves(compiled.input_shardings):
        devs |= set(s.device_set)
    blob = {"version": 1, "backend": jax.default_backend(),
            "n_devices": max(1, len(devs)),
            "payload": payload, "in_tree": in_tree, "out_tree": out_tree,
            "extras": extras}
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_engine(path):
    """Deserialize a `save_engine` artifact into a ready executable:
    no Python tracing, no XLA compilation — returns (call, extras).

    The load path never imports the model code (the reference's
    `StereoDnnPluginFactory` deserialization needed the full plugin
    library; here the XLA executable is self-contained)."""
    import pickle

    from jax.experimental import serialize_executable

    with open(path, "rb") as f:
        blob = pickle.load(f)
    if blob["backend"] != jax.default_backend():
        raise ValueError(
            f"engine was built for backend {blob['backend']!r}, current "
            f"is {jax.default_backend()!r} (plan files are "
            "device-specific, like the reference's)")
    n = blob.get("n_devices", 1)
    call = serialize_executable.deserialize_and_load(
        blob["payload"], blob["in_tree"], blob["out_tree"],
        execution_devices=jax.devices()[:n])
    return call, blob.get("extras")

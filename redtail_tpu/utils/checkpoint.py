"""Parameter/train-state checkpointing.

The reference's persistence story was engine/calibration caches
(SURVEY.md §5); a full framework also needs model-state checkpoints.
Orbax handles the heavy lifting when available; a portable .npz fallback
keeps the format dependency-free (and doubles as the export format for
the conversion toolchain).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree, prefix="", out=None):
    out = {} if out is None else out
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{k}/", out)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def _encode_npz(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """npz stores ml_dtypes.bfloat16 as an opaque void dtype (|V2) that
    silently breaks on load — store such leaves as uint16 bit patterns
    under a `@bf16`-suffixed key instead (lossless)."""
    import ml_dtypes

    out = {}
    for k, v in flat.items():
        if v.dtype == ml_dtypes.bfloat16:
            out[k + "@bf16"] = v.view(np.uint16)
        else:
            out[k] = v
    return out


def _decode_npz(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    import ml_dtypes

    return {(k[:-5] if k.endswith("@bf16") else k):
            (v.view(ml_dtypes.bfloat16) if k.endswith("@bf16") else v)
            for k, v in flat.items()}


def save_params(params, path) -> Path:
    """Save a (possibly nested) param dict. `.npz` path -> portable
    numpy archive; directory path -> orbax checkpoint."""
    path = Path(path)
    if path.suffix == ".npz":
        flat = _encode_npz(_flatten(jax.device_get(params)))
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(path, **flat)
        return path
    import orbax.checkpoint as ocp

    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.resolve(), jax.device_get(params))
    ckptr.wait_until_finished()
    return path


def load_params(path):
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as data:
            return _unflatten(_decode_npz({k: data[k] for k in data.files}))
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path.resolve())

"""End-to-end stereo training: dataset -> sharded steps -> checkpoints -> D1/EPE.

The reference trained its stereo nets in external TensorFlow rigs and only
shipped the converted inference graphs (`/root/reference/stereoDNN/README.md`,
SURVEY.md §2.2) — the framework closes the lifecycle natively: the same
`stereo_forward` that serves is differentiated and trained here, data-parallel
over a `jax.sharding.Mesh` (gradients all-reduced over ICI by XLA), with
resumable checkpoints and periodic KITTI-metric evaluation
(`utils/metrics.py` D1/EPE — the metric the reference headlined,
`stereoDNN/README.md:28-31`).

CLI in `apps/train_app.py`; dataset side in `data/kitti.py`.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time
from pathlib import Path
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from redtail_tpu.models import (STEREO_SPECS, init_stereo_params,
                                stereo_forward)
from redtail_tpu.parallel.training import TrainState, make_train_step
from redtail_tpu.utils.metrics import disparity_errors


@dataclasses.dataclass
class StereoTrainConfig:
    """Typed config (the framework's config convention, SURVEY.md §5)."""

    model: str = "nvtiny"
    crop_hw: Tuple[int, int] = (160, 512)   # training crop (model input)
    max_disp: Optional[int] = None          # override spec (cv resolution)
    batch_size: int = 4
    steps: int = 1000
    lr: float = 1e-4
    warmup_steps: int = 100
    weight_decay: float = 0.0
    seed: int = 0
    eval_every: int = 0                     # 0 = only at the end
    ckpt_every: int = 0                     # 0 = only at the end
    ckpt_dir: Optional[str] = None
    resume: bool = False
    data_parallel: int = 1                  # devices on the mesh 'data' axis
    # Compute dtype for the forward/backward convs. Master weights and
    # optimizer moments are ALWAYS float32; 'bfloat16' runs mixed
    # precision (operands cast down, fp32 MXU accumulation; the conv
    # backward is the `ops.convolution._mixed_accum_conv` custom_vjp —
    # JAX's stock conv grad rule rejects the mixed-dtype form, which is
    # why this used to be fp32-only). bf16/w8/int8 SERVING rungs are
    # still produced from the fp32 master checkpoint.
    dtype: str = "float32"


def _make_spec(cfg: StereoTrainConfig):
    spec = STEREO_SPECS[cfg.model]
    kwargs = {"input_hw": tuple(cfg.crop_hw)}
    if cfg.max_disp is not None:
        kwargs["max_disp"] = cfg.max_disp
    return dataclasses.replace(spec, **kwargs)


def _make_optimizer(cfg: StereoTrainConfig):
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.lr,
        warmup_steps=max(1, cfg.warmup_steps),
        decay_steps=max(cfg.steps, cfg.warmup_steps + 1))
    if cfg.weight_decay > 0:
        return optax.adamw(sched, weight_decay=cfg.weight_decay)
    return optax.adam(sched)


# ------------------------------------------------------------- checkpoints


def save_train_state(state: TrainState, path) -> Path:
    """Full resumable state (params + optimizer moments + step) as one
    portable .npz (the framework's dependency-free checkpoint format,
    `utils/checkpoint.py`). Optimizer leaves are stored positionally, so
    loading requires the same optimizer configuration."""
    from redtail_tpu.utils.checkpoint import _encode_npz, _flatten

    state = jax.device_get(state)
    flat = {f"params/{k}": v for k, v in _flatten(state.params).items()}
    for i, leaf in enumerate(jax.tree_util.tree_leaves(state.opt_state)):
        flat[f"opt/{i:04d}"] = np.asarray(leaf)
    flat["step"] = np.asarray(state.step)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **_encode_npz(flat))
    return path


def load_train_state(path, template: TrainState) -> TrainState:
    """Restore a state saved by `save_train_state`. `template` (a freshly
    initialized TrainState for the same spec + optimizer) supplies the
    optimizer tree structure."""
    from redtail_tpu.utils.checkpoint import _decode_npz, _unflatten

    with np.load(Path(path)) as data:
        flat = _decode_npz({k: data[k] for k in data.files})
    params = _unflatten({k[len("params/"):]: v for k, v in flat.items()
                         if k.startswith("params/")})
    opt_leaves = [flat[k] for k in sorted(flat) if k.startswith("opt/")]
    treedef = jax.tree_util.tree_structure(template.opt_state)
    n_expected = len(jax.tree_util.tree_leaves(template.opt_state))
    if len(opt_leaves) != n_expected:
        raise ValueError(
            f"{path}: checkpoint has {len(opt_leaves)} optimizer leaves, "
            f"optimizer expects {n_expected} — optimizer config changed?")
    opt_state = jax.tree_util.tree_unflatten(treedef, opt_leaves)
    return TrainState(params, opt_state, jnp.asarray(flat["step"]))


# ------------------------------------------------------------------ eval


@functools.lru_cache(maxsize=8)
def _eval_forward(eval_spec):
    # Cached per (frozen, hashable) spec so periodic in-training evals
    # reuse one traced program instead of re-tracing each call.
    # Corr models emit sigmoid in [0,1]; scale by input width to px
    # (the reference's `main.cpp:325-327`), matching the train loss.
    scale = eval_spec.input_hw[1] if eval_spec.corr else 1.0
    return jax.jit(
        lambda p, l, r: stereo_forward(eval_spec, p, l, r) * scale)


def evaluate_stereo(spec, params, dataset, *, max_images: int = 0,
                    batch_hw: Optional[Tuple[int, int]] = None) -> dict:
    """D1/EPE over a dataset's center crops at the spec's input size.

    Evaluation runs the plain serving forward (no remat) on one device;
    crops (rather than full frames) keep one compiled shape, the
    framework-wide static-shape rule.
    """
    hw = batch_hw or spec.input_hw
    eval_spec = dataclasses.replace(spec, input_hw=tuple(hw))
    fwd = _eval_forward(eval_spec)
    in_dt = jax.tree_util.tree_leaves(params)[0].dtype  # match params
    n = len(dataset) if max_images == 0 else min(max_images, len(dataset))
    rng = np.random.RandomState(0)
    d1s, epes, n_px = [], [], 0
    for i in range(n):
        left, right, disp, valid = dataset.sample(i)
        left, right, disp, valid = dataset._crop(
            [left, right, disp, valid], hw, rng, random=False)
        if not (valid > 0).any():
            continue  # no GT in this crop (sparse KITTI / GT-less pair)
        pred = np.asarray(fwd(params, left[None].astype(in_dt),
                              right[None].astype(in_dt)), np.float32)[0]
        err = disparity_errors(pred, disp, valid=valid > 0)
        d1s.append(err["d1"] * err["n_valid"])
        epes.append(err["epe"] * err["n_valid"])
        n_px += err["n_valid"]
    n_px = max(n_px, 1)
    return {"d1": float(sum(d1s) / n_px), "epe": float(sum(epes) / n_px),
            "images": n}


# ------------------------------------------------------------------ train


def train_stereo(cfg: StereoTrainConfig, dataset,
                 eval_dataset=None,
                 log_fn: Callable[[dict], None] = None) -> TrainState:
    """Run the training loop; returns the final TrainState.

    `dataset` / `eval_dataset`: `data/kitti.py` KittiStereoDataset (or any
    object with the same `batches`/`sample`/`_crop` surface).
    """
    compute_dtype = jnp.zeros((), cfg.dtype).dtype
    if compute_dtype not in (jnp.float32, jnp.bfloat16):
        raise ValueError(
            f"training dtype must be float32 or bfloat16, got {cfg.dtype}")
    spec = _make_spec(cfg)
    optimizer = _make_optimizer(cfg)

    mesh = None
    if cfg.data_parallel > 1:
        from redtail_tpu.parallel.sharding import make_mesh
        devices = jax.devices()[:cfg.data_parallel]
        if len(devices) < cfg.data_parallel:
            raise RuntimeError(
                f"data_parallel={cfg.data_parallel} but only "
                f"{len(devices)} devices visible")
        mesh = make_mesh(devices, data=cfg.data_parallel, spatial=1)
        if cfg.batch_size % cfg.data_parallel:
            raise ValueError("data_parallel must divide batch_size")

    init_fn, step_fn = make_train_step(
        spec, optimizer, mesh=mesh,
        compute_dtype=(None if compute_dtype == jnp.float32
                       else compute_dtype))
    # Master weights are always fp32; cfg.dtype is the conv compute dtype.
    params = init_stereo_params(spec, key=jax.random.PRNGKey(cfg.seed),
                                dtype=jnp.float32)
    state = init_fn(params)

    ckpt_path = (Path(cfg.ckpt_dir) / f"{cfg.model}_train.npz"
                 if cfg.ckpt_dir else None)
    if cfg.resume and ckpt_path and ckpt_path.exists():
        state = load_train_state(ckpt_path, state)

    log = log_fn or (lambda rec: print(json.dumps(rec), flush=True))
    rng = np.random.RandomState(cfg.seed + 1)
    in_dt = jnp.zeros((), cfg.dtype).dtype  # images in the compute dtype
    start_step = int(jax.device_get(state.step))
    step_i = start_step
    last_ckpt = last_eval = -1
    t0 = time.perf_counter()
    while step_i < cfg.steps:
        for batch in dataset.batches(cfg.batch_size, cfg.crop_hw, rng=rng):
            if step_i >= cfg.steps:
                break
            left, right, disp, valid = batch
            state, metrics = step_fn(state, left.astype(in_dt),
                                     right.astype(in_dt), disp, valid)
            step_i += 1
            if step_i % 10 == 0 or step_i == cfg.steps:
                m = jax.device_get(metrics)
                log({"step": step_i, "loss": round(float(m["loss"]), 5),
                     "epe": round(float(m["epe"]), 4),
                     "sec": round(time.perf_counter() - t0, 2)})
            if ckpt_path and cfg.ckpt_every and step_i % cfg.ckpt_every == 0:
                save_train_state(state, ckpt_path)
                last_ckpt = step_i
            if (eval_dataset is not None and cfg.eval_every
                    and step_i % cfg.eval_every == 0):
                ev = evaluate_stereo(spec, state.params, eval_dataset)
                log({"step": step_i, "eval_d1": round(ev["d1"], 4),
                     "eval_epe": round(ev["epe"], 4)})
                last_eval = step_i

    if ckpt_path and last_ckpt != step_i:
        save_train_state(state, ckpt_path)
        log({"step": step_i, "checkpoint": str(ckpt_path)})
    if eval_dataset is not None and last_eval != step_i:
        ev = evaluate_stereo(spec, state.params, eval_dataset)
        log({"step": step_i, "eval_d1": round(ev["d1"], 4),
             "eval_epe": round(ev["epe"], 4)})
    return state

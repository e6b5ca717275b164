"""Training CLI: stereo disparity nets and TrailNet, natively in-framework.

The reference's training story was external (Caffe/DIGITS for TrailNet —
`/root/reference/models/nets/python-layers.py` — and unshipped TF rigs for
the stereo family); the converted graphs were all it published. This app
closes the loop: the exact forward functions the framework serves are the
ones trained here, so a trained checkpoint drops straight into
`stereo_app` / the pipeline with no conversion step.

Usage:
  python -m redtail_tpu.apps.train_app stereo --data <kitti_or_generic_dir> \
      --model nvtiny --steps 2000 --batch 4 --crop 160x512 --ckpt-dir ckpts
  python -m redtail_tpu.apps.train_app trailnet --data <trails_root> \
      --steps 500 --batch 16 --out trailnet.npz

Progress is emitted as JSON lines (the framework's telemetry convention).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _parse_hw(s: str):
    h, w = s.lower().split("x")
    return (int(h), int(w))


# ----------------------------------------------------------------- stereo


def _run_stereo(args) -> int:
    from redtail_tpu.data.kitti import KittiStereoDataset
    from redtail_tpu.training.stereo import (StereoTrainConfig,
                                             evaluate_stereo, train_stereo)

    cfg = StereoTrainConfig(
        model=args.model, crop_hw=_parse_hw(args.crop),
        max_disp=args.max_disp, batch_size=args.batch, steps=args.steps,
        lr=args.lr, warmup_steps=args.warmup, seed=args.seed,
        eval_every=args.eval_every, ckpt_every=args.ckpt_every,
        ckpt_dir=args.ckpt_dir, resume=args.resume,
        data_parallel=args.data_parallel, dtype=args.dtype)

    dataset = KittiStereoDataset(args.data)
    eval_ds = (KittiStereoDataset(args.eval_data) if args.eval_data
               else dataset)
    state = train_stereo(cfg, dataset, eval_dataset=eval_ds)

    if args.out:
        from redtail_tpu.utils.checkpoint import save_params
        save_params(state.params, args.out)
        print(json.dumps({"params": args.out}), flush=True)
    return 0


# --------------------------------------------------------------- trailnet


def _run_trailnet(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from redtail_tpu.data.trails import TrailsDataset, build_trail_lists
    from redtail_tpu.models.trailnet import init_trailnet_params
    from redtail_tpu.training.trailnet import make_trailnet_train_step

    splits = build_trail_lists(args.data)
    train_samples = splits.get("train") or sum(splits.values(), [])
    if not train_samples:
        print(f"no samples under {args.data}", file=sys.stderr)
        return 1
    dataset = TrailsDataset(train_samples, seed=args.seed)
    if len(dataset) < args.batch:
        print(f"{len(dataset)} samples < batch {args.batch} "
              "(drop_last yields no batches)", file=sys.stderr)
        return 1

    optimizer = optax.sgd(
        optax.warmup_cosine_decay_schedule(
            0.0, args.lr, max(1, args.warmup),
            max(args.steps, args.warmup + 1)),
        momentum=0.9)
    init_fn, step_fn = make_trailnet_train_step(
        optimizer, augment=not args.no_augment)
    state = init_fn(init_trailnet_params(jax.random.PRNGKey(args.seed)))

    key = jax.random.PRNGKey(args.seed + 1)
    step_i = 0
    while step_i < args.steps:
        for images, labels in dataset.batches(args.batch):
            if step_i >= args.steps:
                break
            key, sub = jax.random.split(key)
            # The IDSIA trail set labels orientation only
            # (`models/dataset/idsia_trails_dataset_digits.py`); the
            # lateral-offset head trains on the same 3-way labels when no
            # separate offset dataset is given (both heads share topology).
            labels = jnp.asarray(labels)
            state, metrics = step_fn(state, sub, jnp.asarray(images),
                                     labels, labels)
            step_i += 1
            if step_i % 10 == 0 or step_i == args.steps:
                m = jax.device_get(metrics)
                print(json.dumps({"step": step_i,
                                  "loss": round(float(m["loss"]), 5)}),
                      flush=True)

    if args.out:
        from redtail_tpu.utils.checkpoint import save_params
        save_params(jax.device_get(state.params), args.out)
        print(json.dumps({"params": args.out}), flush=True)
    if args.export_caffe:
        # Round-trips through the reference's own deploy format
        # (`models/pretrained/TrailNet_SResNet-18.prototxt`): prototxt +
        # binary caffemodel a Caffe/TensorRT consumer can load.
        from redtail_tpu.io.caffe import write_caffemodel
        from redtail_tpu.models.trailnet_proto import (
            emit_trailnet_prototxt, native_params_to_blobs)
        prefix = Path(args.export_caffe)
        prefix.parent.mkdir(parents=True, exist_ok=True)
        prefix.with_suffix(".prototxt").write_text(emit_trailnet_prototxt())
        blobs = native_params_to_blobs(jax.device_get(state.params))
        prefix.with_suffix(".caffemodel").write_bytes(
            write_caffemodel(blobs))
        print(json.dumps({"caffe": str(prefix)}), flush=True)
    return 0


# ------------------------------------------------------------------- main


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="train_app", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("stereo", help="train a stereo disparity model")
    s.add_argument("--model", default="nvtiny",
                   choices=["nvtiny", "nvsmall", "resnet18", "resnet18_2d"])
    s.add_argument("--data", required=True,
                   help="KITTI-2015 or left/right/disp directory")
    s.add_argument("--eval-data", default=None)
    s.add_argument("--crop", default="160x512", help="train crop HxW")
    s.add_argument("--max-disp", type=int, default=None,
                   help="override cost-volume max disparity")
    s.add_argument("--batch", type=int, default=4)
    s.add_argument("--steps", type=int, default=1000)
    s.add_argument("--lr", type=float, default=1e-4)
    s.add_argument("--warmup", type=int, default=100)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--eval-every", type=int, default=0)
    s.add_argument("--ckpt-every", type=int, default=0)
    s.add_argument("--ckpt-dir", default=None)
    s.add_argument("--resume", action="store_true")
    s.add_argument("--data-parallel", type=int, default=1,
                   help="devices on the mesh data axis")
    s.add_argument("--dtype", default="float32",
                   help="conv compute dtype: float32 or bfloat16 (mixed "
                        "precision, fp32 master weights); w8/int8 are "
                        "serving rungs cast from the trained checkpoint")
    s.add_argument("--out", default=None, help="final params .npz")
    s.set_defaults(fn=_run_stereo)

    t = sub.add_parser("trailnet", help="train TrailNet SResNet-18")
    t.add_argument("--data", required=True, help="trails dataset root")
    t.add_argument("--batch", type=int, default=16)
    t.add_argument("--steps", type=int, default=500)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--warmup", type=int, default=50)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--no-augment", action="store_true")
    t.add_argument("--out", default=None, help="final params .npz")
    t.add_argument("--export-caffe", default=None,
                   help="also export prototxt+caffemodel prefix")
    t.set_defaults(fn=_run_trailnet)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

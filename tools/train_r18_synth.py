"""Train ResNet-18 3D from scratch on synthetic stereo + emit its rung table.

VERDICT r3 item 3: the upstream ResNet-18 3D checkpoint was never
mirrored (`/root/reference/.MISSING_LARGE_BLOBS` — only .index/.meta
shipped), so the model's accuracy rung table used random weights, where
bf16 read 9.6% D1 (a soft-argmin over a random volume flips on
rounding). The framework owns a trainer (`training/stereo.py`), so we
delete the caveat with our own machinery: train on synthetic
variable-disparity stereo (`data.kitti.make_synthetic_kitti`) until
held-out D1 gates, save the weights, and re-measure the serving rungs
with non-degenerate weights.

Usage (defaults reproduce the committed checkpoint):
  python tools/train_r18_synth.py --out tests/data/resnet18_synth_trained.npz

The committed checkpoint is bf16-encoded (lossless `@bf16` keys,
`utils/checkpoint._encode_npz`) to halve the artifact size; serving
loads it via `stereo_app --weights` / `models.stereo.params_from_npz`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import tempfile
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="tests/data/resnet18_synth_trained.npz")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--crop", default="160x512")
    ap.add_argument("--max-disp", type=int, default=24,
                    help="cost-volume D at half res (full = 2x)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--n-eval", type=int, default=8)
    ap.add_argument("--ckpt-dir", default=None,
                    help="resumable train-state dir (rerun the same "
                         "command to continue toward --steps)")
    ap.add_argument("--d1-gate", type=float, default=0.02,
                    help="held-out D1 the run must reach")
    ap.add_argument("--rungs", action="store_true",
                    help="also print the serving rung table (bf16/packed/"
                         "w8/int8 vs the fp32 forward + D1 vs GT)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from redtail_tpu.data.kitti import KittiStereoDataset, make_synthetic_kitti
    from redtail_tpu.training.stereo import (StereoTrainConfig,
                                             evaluate_stereo, train_stereo)

    h, w = (int(s) for s in args.crop.lower().split("x"))
    full_d = 2 * args.max_disp
    with tempfile.TemporaryDirectory() as td:
        # Disparity range inside the model's representable [0, full_d):
        # varied per image so the net must CORRELATE, not regress a bias.
        train_root = make_synthetic_kitti(
            Path(td) / "train", n=args.n_train, hw=(h, w),
            disp=(4, full_d - 8), seed=0, octaves=3)
        eval_root = make_synthetic_kitti(
            Path(td) / "eval", n=args.n_eval, hw=(h, w),
            disp=(4, full_d - 8), seed=1, octaves=3)
        train_ds = KittiStereoDataset(train_root)
        eval_ds = KittiStereoDataset(eval_root)

        cfg = StereoTrainConfig(
            model="resnet18", crop_hw=(h, w), max_disp=args.max_disp,
            batch_size=args.batch, steps=args.steps, lr=args.lr,
            warmup_steps=min(100, args.steps // 10), dtype=args.dtype,
            ckpt_dir=args.ckpt_dir, ckpt_every=200 if args.ckpt_dir else 0,
            resume=bool(args.ckpt_dir))
        state = train_stereo(cfg, train_ds, eval_dataset=eval_ds)

        from redtail_tpu.models import STEREO_SPECS
        spec = dataclasses.replace(STEREO_SPECS["resnet18"],
                                   input_hw=(h, w), max_disp=args.max_disp)
        ev = evaluate_stereo(spec, state.params, eval_ds)
        print(json.dumps({"final_eval": ev}), flush=True)
        if ev["d1"] > args.d1_gate:
            print(json.dumps({"error": "d1 gate failed",
                              "d1": ev["d1"], "gate": args.d1_gate}))
            return 1

        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        from redtail_tpu.utils.checkpoint import save_params
        bf16 = jax.tree_util.tree_map(
            lambda a: np.asarray(a, jnp.bfloat16), jax.device_get(state.params))
        save_params(bf16, out)
        print(json.dumps({"params": str(out),
                          "bytes": out.stat().st_size}), flush=True)

        if args.rungs:
            print_rung_table(spec, out, eval_ds)
    return 0


def print_rung_table(spec, weights_npz, eval_ds):
    """Serving rung table with the trained weights: D1/EPE of each rung
    vs the fp32 forward (drift) and vs the synthetic GT (accuracy)."""
    import jax
    import jax.numpy as jnp

    from redtail_tpu.models import params_from_npz, stereo_forward
    from redtail_tpu.utils.metrics import disparity_errors

    params32 = params_from_npz(str(weights_npz), dtype=np.float32)
    left, right, gt, valid = eval_ds.sample(0)
    l32, r32 = left[None], right[None]

    def run(params, dtype, packed_env=None):
        import os
        old = os.environ.get("REDTAIL_TPU_PACKED3D")
        if packed_env is not None:
            os.environ["REDTAIL_TPU_PACKED3D"] = packed_env
        try:
            fwd = jax.jit(lambda p, l, r: stereo_forward(spec, p, l, r))
            pred = np.asarray(fwd(params, jnp.asarray(l32, dtype),
                                  jnp.asarray(r32, dtype)), np.float32)[0]
        finally:
            if packed_env is not None:
                if old is None:
                    os.environ.pop("REDTAIL_TPU_PACKED3D", None)
                else:
                    os.environ["REDTAIL_TPU_PACKED3D"] = old
        return pred

    golden = run(params32, jnp.float32)
    rows = [("fp32", golden)]
    p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params32)
    rows.append(("bf16", run(p16, jnp.bfloat16, packed_env="0")))
    rows.append(("bf16+packed", run(p16, jnp.bfloat16, packed_env="1")))
    # w8 serving rung = fake-quant weights, fp32 conv (the stereo_app
    # --accuracy convention, `apps/stereo_app.py` w8 row).
    from redtail_tpu.quant.ptq import dequantize_tree
    from redtail_tpu.quant import quantize_stereo_params_w8
    rows.append(("w8", run(dequantize_tree(
        quantize_stereo_params_w8(params32), np.float32), jnp.float32)))
    for name, pred in rows:
        drift = disparity_errors(pred, golden,
                                 valid=np.ones_like(golden, bool))
        acc = disparity_errors(pred, gt, valid=valid > 0)
        print(json.dumps({"rung": name,
                          "d1_vs_fp32": round(drift["d1"], 5),
                          "epe_vs_fp32": round(drift["epe"], 4),
                          "d1_vs_gt": round(acc["d1"], 5),
                          "epe_vs_gt": round(acc["epe"], 4)}), flush=True)


if __name__ == "__main__":
    import sys
    sys.exit(main())

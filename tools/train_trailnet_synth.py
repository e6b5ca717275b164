"""Train the real TrailNet SResNet-18 on rendered trail views.

VERDICT r3 item 8: the reference's SITL rig ran the actual perception
stack against rendered frames (`tools/simulation/docker/`); the upstream
TrailNet caffemodel was never mirrored, so the sim loop previously used
an analytic classifier. This tool closes the gap with the framework's
own machinery: `apps.sim_app.render_trail_view` renders labeled camera
views (pose sampled per class, same conventions as the controller law),
`training/trailnet.py` trains the real graph on them, a held-out
accuracy gate guards convergence, and the weights are committed as a
per-channel-int8 artifact (`models.trailnet.params_to_w8_npz`) that
`sim_app --real-dnn` loads to close the loop with the real network.

Usage (defaults reproduce the committed checkpoint):
  PYTHONPATH=.:$PYTHONPATH python tools/train_trailnet_synth.py \
      --out tests/data/trailnet_synth_trained.npz
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def render_batch(trail, rng, n, hw=(180, 320)):
    from redtail_tpu.apps.sim_app import sample_labeled_view

    imgs, views, sides = [], [], []
    for _ in range(n):
        img, v, s = sample_labeled_view(trail, rng, hw=hw)
        imgs.append(img)
        views.append(v)
        sides.append(s)
    return (np.stack(imgs), np.asarray(views, np.int32),
            np.asarray(sides, np.int32))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="tests/data/trailnet_synth_trained.npz")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-n", type=int, default=96)
    ap.add_argument("--acc-gate", type=float, default=0.9,
                    help="held-out per-head accuracy both heads must reach")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from redtail_tpu.apps.sim_app import Trail
    from redtail_tpu.models.trailnet import (init_trailnet_params,
                                             params_to_w8_npz,
                                             trailnet_forward)
    from redtail_tpu.training.trailnet import make_trailnet_train_step

    trail = Trail()
    rng = np.random.RandomState(args.seed)
    optimizer = optax.sgd(
        optax.warmup_cosine_decay_schedule(0.0, args.lr,
                                           max(1, args.steps // 10),
                                           args.steps),
        momentum=0.9)
    # augment=False: the renderer already varies pose/noise per sample,
    # and the geometric augs (rotate/crop) would blur the class-defining
    # yaw/offset geometry near thresholds.
    init_fn, step_fn = make_trailnet_train_step(optimizer, augment=False)
    state = init_fn(init_trailnet_params(jax.random.PRNGKey(args.seed)))

    key = jax.random.PRNGKey(args.seed + 1)
    for step_i in range(1, args.steps + 1):
        imgs, views, sides = render_batch(trail, rng, args.batch)
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub, jnp.asarray(imgs),
                                 jnp.asarray(views), jnp.asarray(sides))
        if step_i % 20 == 0 or step_i == args.steps:
            m = jax.device_get(metrics)
            print(json.dumps({"step": step_i,
                              "loss": round(float(m["loss"]), 5)}),
                  flush=True)

    # Held-out accuracy gate (fresh rng stream).
    eval_rng = np.random.RandomState(args.seed + 1000)
    fwd = jax.jit(trailnet_forward)
    hits_v = hits_s = 0
    for i in range(0, args.eval_n, args.batch):
        n = min(args.batch, args.eval_n - i)
        imgs, views, sides = render_batch(trail, eval_rng, n)
        probs = np.asarray(fwd(state.params, jnp.asarray(imgs)), np.float32)
        hits_v += int((probs[:, :3].argmax(-1) == views).sum())
        hits_s += int((probs[:, 3:].argmax(-1) == sides).sum())
    acc_v, acc_s = hits_v / args.eval_n, hits_s / args.eval_n
    print(json.dumps({"eval_view_acc": round(acc_v, 4),
                      "eval_side_acc": round(acc_s, 4)}), flush=True)
    if min(acc_v, acc_s) < args.acc_gate:
        print(json.dumps({"error": "accuracy gate failed",
                          "gate": args.acc_gate}))
        return 1

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    params_to_w8_npz(jax.device_get(state.params), out)
    print(json.dumps({"params": str(out), "bytes": out.stat().st_size}),
          flush=True)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())

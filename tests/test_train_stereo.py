"""End-to-end stereo training: dataset, loop, checkpoints, eval, CLI.

The reference shipped no trainable stereo path at all (external TF rigs,
SURVEY.md §2.2); these gates cover the framework's native lifecycle:
synthetic KITTI-format data -> sharded train steps -> resumable
checkpoint -> D1/EPE eval -> params usable by the serving forward.
"""

import dataclasses
import json

import jax
import numpy as np
import pytest

from redtail_tpu.data.kitti import KittiStereoDataset, make_synthetic_kitti
from redtail_tpu.training.stereo import (StereoTrainConfig, evaluate_stereo,
                                         load_train_state, save_train_state,
                                         train_stereo)

CROP = (32, 64)


def tiny_cfg(**kw):
    base = dict(model="nvtiny", crop_hw=CROP, max_disp=4, batch_size=2,
                steps=6, lr=1e-3, warmup_steps=2, eval_every=0,
                ckpt_every=0)
    base.update(kw)
    return StereoTrainConfig(**base)


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    return make_synthetic_kitti(root, n=3, hw=(40, 72), disp=3.0)


def test_synthetic_kitti_loads(kitti_dir):
    ds = KittiStereoDataset(kitti_dir)
    assert len(ds) == 3
    left, right, disp, valid = ds.sample(0)
    assert left.shape == (40, 72, 3) and right.shape == (40, 72, 3)
    assert left.dtype == np.float32 and 0 <= left.min() <= left.max() <= 1
    # GT: constant disparity 3, invalid in the occluded left band
    assert valid[:, :3].sum() == 0 and valid[:, 3:].all()
    assert np.allclose(disp[:, 3:], 3.0)
    # the shift itself: left[x] == right[x-3] (same quantized texture, so
    # exact equality after the PNG round-trip)
    np.testing.assert_array_equal(left[:, 3:], right[:, :-3])

    batch = next(ds.batches(2, CROP, rng=np.random.RandomState(0)))
    l, r, d, v = batch
    assert l.shape == (2,) + CROP + (3,)
    assert d.shape == (2,) + CROP and v.shape == (2,) + CROP


def test_kitti_layout_detection(tmp_path):
    """KITTI-2015 directory names (image_2/image_3/disp_occ_0, uint16*256
    PNGs) are detected, including the training/ descent."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path / "training"
    for sub in ("image_2", "image_3", "disp_occ_0"):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (16, 24, 3)).astype(np.uint8)
    cv2.imwrite(str(root / "image_2" / "000000_10.png"), img)
    cv2.imwrite(str(root / "image_3" / "000000_10.png"), img)
    gt = np.zeros((16, 24), np.uint16)
    gt[:, 4:] = int(2.5 * 256)  # 2.5 px, column 0-3 invalid
    cv2.imwrite(str(root / "disp_occ_0" / "000000_10.png"), gt)

    ds = KittiStereoDataset(tmp_path)  # descends into training/
    _, _, disp, valid = ds.sample(0)
    assert valid[:, :4].sum() == 0
    assert np.allclose(disp[:, 4:], 2.5)


def test_train_decreases_loss_and_checkpoints(kitti_dir, tmp_path):
    ds = KittiStereoDataset(kitti_dir)
    logs = []
    cfg = tiny_cfg(steps=12, ckpt_dir=str(tmp_path))
    state = train_stereo(cfg, ds, log_fn=logs.append)

    losses = [r["loss"] for r in logs if "loss" in r]
    assert len(losses) >= 1 and np.isfinite(losses).all()
    assert int(jax.device_get(state.step)) == 12

    ckpt = tmp_path / "nvtiny_train.npz"
    assert ckpt.exists()

    # Resume continues from step 12 and trains further; loss improves
    # over the first steps of the run (lr schedule + toy task).
    logs2 = []
    cfg2 = tiny_cfg(steps=30, ckpt_dir=str(tmp_path), resume=True)
    state2 = train_stereo(cfg2, ds, log_fn=logs2.append)
    assert int(jax.device_get(state2.step)) == 30
    losses2 = [r["loss"] for r in logs2 if "loss" in r]
    assert min(losses2) < losses[0]  # net progress across the two runs


def test_train_state_roundtrip(tmp_path):
    import optax

    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.parallel.training import make_train_step

    spec = dataclasses.replace(STEREO_SPECS["nvtiny"], input_hw=CROP,
                               max_disp=4)
    init_fn, _ = make_train_step(spec, optax.adam(1e-3))
    state = init_fn(init_stereo_params(spec))
    path = save_train_state(state, tmp_path / "s.npz")

    restored = load_train_state(path, init_fn(init_stereo_params(
        spec, key=jax.random.PRNGKey(7))))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 0

    # optimizer-config mismatch is detected, not silently mis-zipped
    init2, _ = make_train_step(spec, optax.sgd(1e-3, momentum=0.9))
    with pytest.raises(ValueError, match="optimizer"):
        load_train_state(path, init2(init_stereo_params(spec)))


def test_evaluate_stereo_metrics(kitti_dir):
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params

    spec = dataclasses.replace(STEREO_SPECS["nvtiny"], input_hw=CROP,
                               max_disp=4)
    params = init_stereo_params(spec)
    ev = evaluate_stereo(spec, params, KittiStereoDataset(kitti_dir),
                         max_images=2)
    assert ev["images"] == 2
    assert np.isfinite(ev["d1"]) and 0 <= ev["d1"] <= 1
    assert np.isfinite(ev["epe"]) and ev["epe"] >= 0


def test_train_app_cli_stereo(kitti_dir, tmp_path, capsys):
    from redtail_tpu.apps.train_app import main

    out = tmp_path / "params.npz"
    rc = main(["stereo", "--data", str(kitti_dir), "--model", "nvtiny",
               "--crop", "32x64", "--max-disp", "4", "--batch", "2",
               "--steps", "2", "--warmup", "1", "--out", str(out)])
    assert rc == 0
    assert out.exists()
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert any("eval_d1" in r for r in lines)
    assert any("params" in r for r in lines)

    # the trained params serve through the same forward the app uses
    from redtail_tpu.models import STEREO_SPECS, stereo_forward
    from redtail_tpu.utils.checkpoint import load_params

    spec = dataclasses.replace(STEREO_SPECS["nvtiny"], input_hw=CROP,
                               max_disp=4)
    params = load_params(out)
    ds = KittiStereoDataset(kitti_dir)
    l, r, _, _ = next(ds.batches(1, CROP, shuffle=False, drop_last=False))
    disp = stereo_forward(spec, params, l, r)
    assert np.isfinite(np.asarray(disp)).all()


def test_train_app_cli_trailnet(tmp_path, capsys):
    """TrailNet branch: synthetic class-dir dataset -> steps -> params +
    Caffe export that re-parses through the framework's own reader."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    for cls in ("lc", "sc", "rc"):
        d = tmp_path / "vid0" / cls
        d.mkdir(parents=True)
        for i in range(2):
            cv2.imwrite(str(d / f"{i}.png"),
                        rng.randint(0, 255, (180, 320, 3)).astype(np.uint8))

    from redtail_tpu.apps.train_app import main

    out = tmp_path / "trail.npz"
    caffe_prefix = tmp_path / "trail_export"
    rc = main(["trailnet", "--data", str(tmp_path), "--batch", "2",
               "--steps", "1", "--no-augment", "--out", str(out),
               "--export-caffe", str(caffe_prefix)])
    assert rc == 0
    assert out.exists()
    records = [json.loads(l) for l in
               capsys.readouterr().out.strip().splitlines()]
    assert any("loss" in r for r in records)

    # the exported prototxt+caffemodel round-trips through io/caffe
    from redtail_tpu.io.caffe import parse_caffemodel, parse_prototxt
    net = parse_prototxt(caffe_prefix.with_suffix(".prototxt").read_text())
    blobs = parse_caffemodel(
        caffe_prefix.with_suffix(".caffemodel").read_bytes())
    assert "conv1" in blobs and len(net.get_all("layer")) > 10


def test_batches_smaller_than_batch_size_raises(kitti_dir):
    ds = KittiStereoDataset(kitti_dir)  # 3 samples
    with pytest.raises(ValueError, match="batch_size"):
        next(ds.batches(8, CROP))


def test_crop_pads_valid_with_zeros(kitti_dir):
    """Frames smaller than the crop edge-pad images but ZERO-pad the
    validity mask — fabricated pixels must not supervise the loss."""
    ds = KittiStereoDataset(kitti_dir)  # frames are 40x72
    left, right, disp, valid = ds.sample(0)
    (lc, rc, dc, vc) = ds._crop([left, right, disp, valid], (48, 80),
                                np.random.RandomState(0), random=False)
    assert lc.shape == (48, 80, 3) and vc.shape == (48, 80)
    assert vc[40:, :].sum() == 0 and vc[:, 72:].sum() == 0
    assert vc[:40, 3:72].all()


def test_trained_npz_serves_via_stereo_app_loader(kitti_dir, tmp_path):
    """Both trainer outputs — the final params .npz and the full
    train-state checkpoint — load through `params_from_npz`, i.e.
    `stereo_app --weights <trained>` serves what train_app produced."""
    from redtail_tpu.models import STEREO_SPECS, stereo_forward
    from redtail_tpu.models.stereo import params_from_npz
    from redtail_tpu.utils.checkpoint import save_params

    ds = KittiStereoDataset(kitti_dir)
    cfg = tiny_cfg(steps=1, ckpt_dir=str(tmp_path))
    state = train_stereo(cfg, ds, log_fn=lambda r: None)
    save_params(state.params, tmp_path / "final.npz")

    spec = dataclasses.replace(STEREO_SPECS["nvtiny"], input_hw=CROP,
                               max_disp=4)
    l, r, _, _ = next(ds.batches(1, CROP, shuffle=False, drop_last=False))
    want = np.asarray(stereo_forward(spec, state.params, l, r))

    for path in (tmp_path / "final.npz", tmp_path / "nvtiny_train.npz"):
        params = params_from_npz(path)
        got = np.asarray(stereo_forward(spec, params, l, r))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_corr_model_trains_in_pixel_units():
    """resnet18_2d's sigmoid head is scaled to px inside the train step
    (pred * width) — the loss sees pixel units, not [0,1] (review fix)."""
    import optax

    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.parallel.training import make_train_step

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"], input_hw=CROP,
                               max_disp=4)
    init_fn, step = make_train_step(spec, optax.adam(1e-3))
    state = init_fn(init_stereo_params(spec))
    rs = np.random.RandomState(0)
    l = rs.rand(1, *CROP, 3).astype(np.float32)
    r = rs.rand(1, *CROP, 3).astype(np.float32)
    target = np.full((1,) + CROP, 5.0, np.float32)
    valid = np.ones_like(target)
    state, metrics = step(state, l, r, target, valid)
    epe = float(jax.device_get(metrics["epe"]))
    # sigmoid(random init) ~ 0.5 -> pred ~ width/2 = 32 px -> EPE ~ 27.
    # The broken ([0,1] vs px) version would read ~4.5.
    assert np.isfinite(epe) and epe > 10.0


def test_bf16_training_mixed_precision(kitti_dir, tmp_path):
    """bf16 training (VERDICT r3 item 4): the conv backward is the
    `ops.convolution._mixed_accum_conv` custom_vjp (JAX's stock conv
    grad rule rejects bf16 operands + fp32 accumulation). Master weights
    stay fp32, loss decreases, and bf16 EVAL of bf16-cast params works
    (the serving rung)."""
    import jax.numpy as jnp

    ds = KittiStereoDataset(kitti_dir)
    losses = []
    st = train_stereo(tiny_cfg(steps=20, lr=3e-4, dtype="bfloat16"), ds,
                      log_fn=lambda r: losses.append(r))
    assert jax.tree_util.tree_leaves(st.params)[0].dtype == np.float32
    ls = [r["loss"] for r in losses if "loss" in r]
    assert np.isfinite(ls).all()
    assert ls[-1] < ls[0], ls

    with pytest.raises(ValueError, match="float32 or bfloat16"):
        train_stereo(tiny_cfg(steps=1, dtype="float16"), ds,
                     log_fn=lambda r: None)

    from redtail_tpu.models import STEREO_SPECS, init_stereo_params

    spec = dataclasses.replace(STEREO_SPECS["nvtiny"], input_hw=CROP,
                               max_disp=4)
    params = init_stereo_params(spec, dtype=jnp.bfloat16)
    ev = evaluate_stereo(spec, params, ds, max_images=1)
    assert np.isfinite(ev["epe"])


def test_mixed_dtype_conv_grads_match_fp32():
    """The custom_vjp backward of the mixed bf16/f32 convs matches the
    all-fp32 gradients within bf16 rounding (conv2d, conv3d, and the
    lhs-dilated transposed conv all route through `dilated_conv`)."""
    import jax.numpy as jnp
    from redtail_tpu.ops import conv2d, conv3d, conv3d_transpose

    k = jax.random.PRNGKey(0)
    x32 = jax.random.normal(k, (2, 8, 10, 4), jnp.float32)
    w32 = jax.random.normal(jax.random.fold_in(k, 1),
                            (3, 3, 4, 8), jnp.float32) * 0.2

    def loss2(x, w):
        return (conv2d(x, w, strides=(2, 2)).astype(jnp.float32) ** 2).sum()

    g32 = jax.grad(loss2, argnums=(0, 1))(x32, w32)
    g16 = jax.grad(loss2, argnums=(0, 1))(x32.astype(jnp.bfloat16),
                                          w32.astype(jnp.bfloat16))
    for a, b in zip(g32, g16):
        assert b.dtype == jnp.bfloat16
        rel = np.abs(np.float32(b) - a).max() / np.abs(a).max()
        assert rel < 0.05, rel

    x = jax.random.normal(k, (1, 6, 8, 10, 4), jnp.bfloat16)
    w = jax.random.normal(k, (3, 3, 3, 4, 6), jnp.bfloat16) * 0.2
    wt = jax.random.normal(k, (3, 3, 3, 2, 6), jnp.bfloat16) * 0.2

    def loss3(x, w, wt):
        y = conv3d(x, w, strides=(2, 2, 2))
        z = conv3d_transpose(y, wt, out_spatial=(6, 8, 10),
                             strides=(2, 2, 2))
        return (z.astype(jnp.float32) ** 2).sum()

    for g in jax.grad(loss3, argnums=(0, 1, 2))(x, w, wt):
        assert g.dtype == jnp.bfloat16
        assert np.isfinite(np.float32(g)).all()


def test_plain_lowering_gates():
    """`plain_lowering` turns off every packed/fused serving restructure
    while active (the training forward traces under it)."""
    from redtail_tpu.models.stereo import (use_fused_towers, use_hpack2d,
                                           use_hpack_corr, use_packed3d)
    from redtail_tpu.ops.convolution import plain_lowering
    import os

    env = {k: os.environ.pop(k, None)
           for k in ("REDTAIL_TPU_PACKED3D", "REDTAIL_TPU_HPACK2D",
                     "REDTAIL_TPU_FUSED_TOWERS", "REDTAIL_TPU_HPACK_CORR")}
    try:
        os.environ["REDTAIL_TPU_PACKED3D"] = "1"
        os.environ["REDTAIL_TPU_HPACK2D"] = "1"
        os.environ["REDTAIL_TPU_FUSED_TOWERS"] = "1"
        os.environ["REDTAIL_TPU_HPACK_CORR"] = "1"
        assert use_packed3d() and use_hpack2d()
        assert use_fused_towers() and use_hpack_corr()
        with plain_lowering():
            assert not use_packed3d() and not use_hpack2d()
            assert not use_fused_towers() and not use_hpack_corr()
        assert use_packed3d()
    finally:
        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_random_crop_decoupled_from_shuffle(kitti_dir):
    ds = KittiStereoDataset(kitti_dir)
    rng = np.random.RandomState(3)
    a = next(ds.batches(2, (24, 48), rng=rng, shuffle=False,
                        random_crop=True))
    b = next(ds.batches(2, (24, 48), rng=rng, shuffle=False,
                        random_crop=True))
    assert not np.array_equal(a[0], b[0])  # same order, different crops
    c = next(ds.batches(2, (24, 48), shuffle=False))
    d = next(ds.batches(2, (24, 48), shuffle=False))
    np.testing.assert_array_equal(c[0], d[0])  # default: deterministic


def test_disp_npy_preferred_over_png(tmp_path):
    """A visualization .png next to the float .npy GT must not shadow it."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    for sub in ("left", "right", "disp"):
        (tmp_path / sub).mkdir()
    img = rng.randint(0, 255, (8, 12, 3)).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "left" / "000.png"), img)
    cv2.imwrite(str(tmp_path / "right" / "000.png"), img)
    np.save(tmp_path / "disp" / "000.npy",
            np.full((8, 12), 7.0, np.float32))
    cv2.imwrite(str(tmp_path / "disp" / "000.png"),
                np.full((8, 12), 200, np.uint8))  # decoy visualization
    ds = KittiStereoDataset(tmp_path)
    _, _, disp, valid = ds.sample(0)
    assert valid.all() and np.allclose(disp, 7.0)


def test_evaluate_skips_gt_less_images(kitti_dir, tmp_path):
    """Images with no valid GT don't crash the periodic eval (review fix)."""
    import shutil

    from redtail_tpu.models import STEREO_SPECS, init_stereo_params

    root = tmp_path / "mixed"
    shutil.copytree(kitti_dir, root)
    # drop GT for sample 0 -> all-invalid mask under require_gt=False
    (root / "disp" / "000.npy").unlink()
    ds = KittiStereoDataset(root, require_gt=False)
    assert len(ds) == 3
    spec = dataclasses.replace(STEREO_SPECS["nvtiny"], input_hw=CROP,
                               max_disp=4)
    ev = evaluate_stereo(spec, init_stereo_params(spec), ds)
    assert np.isfinite(ev["epe"])  # computed over the 2 GT-bearing images


def test_resnet18_trained_checkpoint_converged(tmp_path):
    """VERDICT r3 item 3: the committed ResNet-18 3D checkpoint (trained
    from scratch by `tools/train_r18_synth.py` — the upstream weights
    were never mirrored) reaches the gated D1 on a regenerated held-out
    synthetic eval set. Driver-runnable convergence evidence without
    training in CI."""
    import dataclasses as dc
    from pathlib import Path

    import jax.numpy as jnp

    from redtail_tpu.data.kitti import make_synthetic_kitti
    from redtail_tpu.models import STEREO_SPECS, params_from_npz

    ckpt = Path(__file__).parent / "data" / "resnet18_synth_trained.npz"
    if not ckpt.exists():
        pytest.skip("trained r18 checkpoint not committed yet")
    # Must mirror tools/train_r18_synth.py defaults: held-out seed 1,
    # octaves 3, crop 160x512, max_disp 24 (full 48), disp in [4, 40].
    root = make_synthetic_kitti(tmp_path / "eval", n=2, hw=(160, 512),
                                disp=(4, 40), seed=1, octaves=3)
    ds = KittiStereoDataset(root)
    spec = dataclasses.replace(STEREO_SPECS["resnet18"],
                               input_hw=(160, 512), max_disp=24)
    params = params_from_npz(str(ckpt), dtype=np.float32)
    ev = evaluate_stereo(spec, params, ds)
    assert ev["d1"] < 0.05, ev

    # bf16 serving rung with TRAINED weights: the drift vs fp32 that the
    # random-weight table could not demonstrate (~0%, not 9.6%).
    p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    ev16 = evaluate_stereo(spec, p16, ds)
    assert abs(ev16["d1"] - ev["d1"]) < 0.01, (ev, ev16)

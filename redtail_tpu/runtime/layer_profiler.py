"""Per-layer cost profiler for the stereo model zoo.

The reference printed a per-layer ms table from TensorRT's `IProfiler`
(`sample_app/main.cpp:52-81,302-312`, `tensor_net.cpp:34-52`). XLA
compiles the whole network into one fused program, so layer times cannot
be observed from inside a run; instead each spec layer is re-jitted in
isolation on its *real* input activations and timed on-device.

Timing method (same as bench.py): a `lax.scan` whose carry threads an
epsilon of each layer output back into the inputs forces strict
iteration-by-iteration execution (host-side timing over the device
tunnel is meaningless), and two loop lengths cancel the host round-trip.

Because isolated layers lose XLA's cross-layer fusion, the per-layer sum
is an upper bound of the fused end-to-end time; both are reported.
`stereo_layer_plan` rebuilds the forward pass layer by layer and the
profiler asserts its composed output matches `stereo_forward` exactly,
so the table cannot silently drift from the real model.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class LayerTime(NamedTuple):
    name: str
    ms: float
    out_shape: Tuple[int, ...]
    gflop: Optional[float] = None   # post-fusion FLOPs (XLA cost model)
    gbytes: Optional[float] = None  # post-fusion HBM bytes accessed


# device_kind substring -> (peak dense bf16 TFLOP/s, HBM GB/s). Public
# figures; used only for the MFU / roofline columns. Matched in order,
# most-specific first.
_TPU_PEAKS = (
    ("v5 lite", (197.0, 819.0)),  # v5e ("TPU v5 lite")
    ("v5litepod", (197.0, 819.0)),
    ("v5e", (197.0, 819.0)),
    ("v5p", (459.0, 2765.0)),
    ("v6", (918.0, 1640.0)),      # Trillium
    ("v4", (275.0, 1228.0)),
    ("v3", (123.0, 900.0)),
    ("v2", (46.0, 700.0)),
)


def device_peaks() -> Optional[Tuple[float, float]]:
    """(peak bf16 TFLOP/s, HBM GB/s) of device 0, or None off-TPU."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for key, peaks in _TPU_PEAKS:
        if key in kind:
            return peaks
    return None


def layer_cost_analysis(fn, args):
    """(GFLOP, GB accessed) of ``fn(*args)`` from XLA's own post-fusion
    cost model (`compiled.cost_analysis()`), so the MFU / roofline
    columns are reproducible compiler output rather than hand math.
    Returns (None, None) where the backend doesn't expose the model."""
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):  # older JAX: one dict per device
            c = c[0] if c else {}
        return (float(c.get("flops", 0.0)) / 1e9,
                float(c.get("bytes accessed", 0.0)) / 1e9)
    except Exception:
        return (None, None)


def stereo_layer_plan(spec, params, left, right):
    """Execute the network layer by layer, returning
    ``(entries, output)`` where ``entries`` is an ordered list of
    ``(name, fn, args)`` — running ``fn(*args)`` for each reproduces
    `stereo_forward(spec, params, left, right)` exactly.
    """
    from redtail_tpu.models import stereo as S
    from redtail_tpu.ops import (conv2d_transpose, conv3d, conv3d_transpose,
                                 cost_volume, elu, sigmoid, softargmax,
                                 softargmin)
    from redtail_tpu.ops.cost_volume import corr_cost_volume_dlast
    from redtail_tpu.ops.fused_cost_volume_conv import cost_volume_conv3d

    entries: List[Tuple[str, Callable, tuple]] = []

    def run(name, fn, *args):
        out = fn(*args)
        entries.append((name, fn, args, tuple(out.shape)))
        return out

    enc = params["encoder2D"]
    s2d_in = left.shape[-1] == 12
    full_hw = spec.input_hw if s2d_in else tuple(left.shape[1:3])
    hp_feats = False  # features left H-packed for the corr head

    def tower(tag, img):
        x = run(f"{tag}_conv1",
                lambda a: S._conv1(enc["conv1"], a, full_hw, act="elu"),
                img)
        conv1 = x
        if spec.encoder2d == "plain":
            for l in ("conv2", "conv3", "conv4"):
                x = run(f"{tag}_{l}",
                        lambda a, l=l: S._c2d(enc[l], a, act="elu"), x)
            x = run(f"{tag}_conv5", lambda a: S._c2d(enc["conv5"], a), x)
            return x, conv1
        for i in range(1, 9):
            blk = enc[f"resblock{i}"]

            def block(a, blk=blk):
                y = S._c2d(blk["res_conv1"], a, act="elu")
                y = S._c2d(blk["res_conv2"], y)
                return elu(y + a)

            x = run(f"{tag}_resblock{i}", block, x)
        x = run(f"{tag}_encoder2D_out",
                lambda a: S._c2d(enc["encoder2D_out"], a), x)
        return x, conv1

    if spec.encoder2d == "resnet18" and S.use_fused_towers() \
            and S._conv_tap is None \
            and not S._has_quantized(params["encoder2D"]):
        from redtail_tpu.models.stereo import _blockdiag

        if s2d_in and S.use_hpack2d():
            # mirror `_hpacked_resnet_towers` (the TPU serving path)
            from redtail_tpu.ops import packed2d as P2
            from redtail_tpu.ops.space_to_depth import conv5s2_kernel_to_s2d
            h_half = -(-full_hw[0] // 2)
            f = enc["conv1"]["weights"].shape[3]
            k3 = conv5s2_kernel_to_s2d(enc["conv1"]["weights"], full_hw)
            x = run("towers_conv1[hp]",
                    lambda a, b2: P2.conv1_s2d_hpacked(
                        jnp.concatenate([a, b2], -1), _blockdiag(k3),
                        jnp.tile(enc["conv1"]["biases"], (2,)),
                        h_half=h_half, act=elu), left, right)
            conv1 = jnp.concatenate([x[..., :f], x[..., 2 * f:3 * f]],
                                    -1)  # left tower, still packed
            for i in range(1, 9):
                blk = enc[f"resblock{i}"]

                def block(a, blk=blk):
                    y = P2.conv2d_hpacked(
                        a, _blockdiag(blk["res_conv1"]["weights"]),
                        jnp.tile(blk["res_conv1"]["biases"], (2,)),
                        h=h_half, in_shifted=False, act=elu)
                    y = P2.conv2d_hpacked(
                        y, _blockdiag(blk["res_conv2"]["weights"]),
                        jnp.tile(blk["res_conv2"]["biases"], (2,)),
                        h=h_half, in_shifted=True)
                    return elu(y + a)

                x = run(f"towers_resblock{i}[hp]", block, x)
            x = run("towers_out[hp]", lambda a: P2.conv2d_hpacked_keep(
                a, _blockdiag(enc["encoder2D_out"]["weights"]),
                jnp.tile(enc["encoder2D_out"]["biases"], (2,)),
                h=h_half), x)
            if spec.corr and S.use_hpack_corr():
                # features STAY packed: the corr head consumes them
                hp_feats = True
                fl = jnp.concatenate([x[..., :f], x[..., 2 * f:3 * f]],
                                     -1)
                fr = jnp.concatenate([x[..., f:2 * f], x[..., 3 * f:]],
                                     -1)
            else:
                conv1 = run("conv1_left_unpack[hp]",
                            lambda a: P2.unpack_h2d(a, h_half), conv1)
                x = run("towers_unpack[hp]",
                        lambda a: P2.unpack_h2d(a, h_half), x)
                fl = x[..., :x.shape[-1] // 2]
                fr = x[..., x.shape[-1] // 2:]
        else:
            def fused_c2d(p, a, *, stride=1, act=None):
                out = S.conv2d(a, _blockdiag(p["weights"]),
                               jnp.tile(p["biases"], (2,)),
                               strides=(stride, stride))
                return elu(out) if act == "elu" else out

            def conv1_stage(a, b2):
                pair = jnp.concatenate([a, b2], axis=-1)
                if s2d_in:
                    from redtail_tpu.ops.space_to_depth import (
                        conv5s2_kernel_to_s2d)
                    k3 = conv5s2_kernel_to_s2d(enc["conv1"]["weights"],
                                               full_hw)
                    return elu(S.conv2d(
                        pair, _blockdiag(k3),
                        jnp.tile(enc["conv1"]["biases"], (2,)),
                        strides=(1, 1)))
                return fused_c2d(enc["conv1"], pair, stride=2, act="elu")

            x = run("towers_conv1[bd]", conv1_stage, left, right)
            conv1 = x[..., :x.shape[-1] // 2]
            for i in range(1, 9):
                blk = enc[f"resblock{i}"]

                def block(a, blk=blk):
                    y = fused_c2d(blk["res_conv1"], a, act="elu")
                    y = fused_c2d(blk["res_conv2"], y)
                    return elu(y + a)

                x = run(f"towers_resblock{i}[bd]", block, x)
            x = run("towers_out[bd]",
                    lambda a: fused_c2d(enc["encoder2D_out"], a), x)
            fl, fr = x[..., :x.shape[-1] // 2], x[..., x.shape[-1] // 2:]
    else:
        fl, conv1 = tower("left", left)
        fr, _ = tower("right", right)

    if spec.corr:
        acts = {}
        benc = params["bneck_encoder2D"]
        if hp_feats:
            # mirror `_bneck_head_hpacked` (packed corr serving path)
            from redtail_tpu.ops import packed2d as P2
            h2 = -(-full_hw[0] // 2)
            vol = run("corr_cost_volume[hp]",
                      lambda a, b: P2.corr_cost_volume_hpacked(
                          a, b, spec.max_disp), fl, fr)
            d = run("softargmax[hp]",
                    lambda v: P2.softargmax_hpacked(v, h2), vol)
            fq = conv1.shape[-1] // 2
            x = run("concat_conv1[hp]",
                    lambda c, dd: jnp.concatenate(
                        [c[..., :fq], dd.astype(c.dtype)[..., :1],
                         c[..., fq:], dd.astype(c.dtype)[..., 1:]], -1),
                    conv1, d)
            layers = list(spec.bneck_channels)
            n_lead = S.bneck_lead_count(spec)
            for i in range(n_lead):
                name = layers[i][0]
                x = run(f"{name}[hp]",
                        lambda a, name=name, i=i: P2.conv2d_hpacked(
                            a, benc[name]["weights"],
                            benc[name]["biases"], h=h2,
                            in_shifted=(i % 2 == 1), act=elu), x)
            x = run("bneck_unpack[hp]",
                    lambda a: P2.unpack_h2d(a, h2), x)
            if n_lead:
                acts[layers[n_lead - 1][0]] = x
            rest = layers[n_lead:]
        else:
            vol = run("corr_cost_volume",
                      lambda a, b: corr_cost_volume_dlast(
                          a, b, spec.max_disp), fl, fr)
            d = run("softargmax",
                    lambda v: softargmax(v, axis=-1)[..., None], vol)
            x = run("concat_conv1",
                    lambda c, dd: jnp.concatenate(
                        [c, dd.astype(c.dtype)], -1), conv1, d)
            rest = list(spec.bneck_channels)
        for name, _oc, stride in rest:
            x = run(name, lambda a, name=name, stride=stride:
                    S._c2d(benc[name], a, stride=stride, act="elu"), x)
            acts[name] = x
        bdec = params["bneck_decoder2D"]
        for name, _oc, skip in spec.bneck_dec:
            p = bdec[name]
            if skip is not None:
                target = tuple(acts[skip].shape[1:3])
                x = run(name, lambda a, sk, p=p, target=target:
                        elu(conv2d_transpose(
                            a, p["weights"], p["biases"],
                            out_spatial=target, strides=(2, 2)) + sk),
                        x, acts[skip])
            else:
                x = run(name, lambda a, p=p, target=full_hw:
                        conv2d_transpose(a, p["weights"], p["biases"],
                                         out_spatial=target, strides=(2, 2)),
                        x)
        out = run("sigmoid", lambda a: sigmoid(a)[..., 0], x)
        return entries, out

    if S.use_packed3d() and spec.enc3d and spec.enc3d[0].stride == 1:
        return _packed_plan(spec, params, fl, fr, full_hw, run, entries)

    enc3 = params["encoder3D"]
    layers = spec.enc3d
    acts = {}
    first = layers[0]
    if first.stride == 1:
        p1 = enc3[first.name]
        x = run(f"cost_volume+{first.name}",
                lambda a, b: elu(cost_volume_conv3d(
                    a, b, p1["weights"], p1["biases"], spec.max_disp)),
                fl, fr)
        acts[first.name] = x
        layers = layers[1:]
    else:
        x = run("cost_volume",
                lambda a, b: cost_volume(a, b, spec.max_disp), fl, fr)
    for layer in layers:
        s = (layer.stride,) * 3
        x = run(layer.name, lambda a, layer=layer, s=s:
                elu(conv3d(a, enc3[layer.name]["weights"],
                           enc3[layer.name]["biases"], strides=s)), x)
        acts[layer.name] = x
    dec3 = params["decoder3D"]
    for name, _oc, skip in spec.dec3d:
        p = dec3[name]
        if skip is not None:
            target = tuple(acts[skip].shape[1:4])
            x = run(name, lambda a, sk, p=p, target=target:
                    elu(conv3d_transpose(a, p["weights"], p["biases"],
                                         out_spatial=target,
                                         strides=(2, 2, 2)) + sk),
                    x, acts[skip])
        else:
            target = (spec.full_max_disp,) + full_hw
            x = run(name, lambda a, p=p, target=target:
                    conv3d_transpose(a, p["weights"], p["biases"],
                                     out_spatial=target, strides=(2, 2, 2)),
                    x)
    out = run("softargmin", lambda a: softargmin(a, axis=1)[..., 0], x)
    return entries, out


def _packed_plan(spec, params, fl, fr, full_hw, run, entries):
    """Layer plan following the channel-packed TPU pipeline
    (`models/stereo.py:_volume_head_packed`) so the table reflects the
    layers that actually execute when packed mode is on."""
    from redtail_tpu.ops import conv3d, conv3d_transpose, elu, softargmin
    from redtail_tpu.ops import packed3d as P
    from redtail_tpu.ops.fused_cost_volume_conv import cost_volume_conv3d

    enc3 = params["encoder3D"]
    p1 = enc3[spec.enc3d[0].name]
    x = run(f"cost_volume+{spec.enc3d[0].name}[pk]",
            lambda a, b: cost_volume_conv3d(
                a, b, p1["weights"], p1["biases"], spec.max_disp,
                act=elu, emit="dh_shifted"), fl, fr)
    layout, shift = "dh", True
    spatial = (spec.max_disp,) + tuple(fl.shape[1:3])
    acts = {spec.enc3d[0].name: (x, layout, shift, spatial)}
    for layer in spec.enc3d[1:]:
        p = enc3[layer.name]
        w_, b_ = p["weights"], p["biases"]
        c_out = w_.shape[4]
        if layer.stride == 1:
            if layout == "none":
                x = run(layer.name, lambda a, w_=w_, b_=b_:
                        elu(conv3d(a, w_, b_)), x)
            else:
                x = run(f"{layer.name}[pk]",
                        lambda a, w_=w_, b_=b_, sp=spatial, lay=layout,
                        sh=shift: elu(P.conv3d_packed(
                            a, w_, b_, full_spatial=sp,
                            packed_h=(lay == "dh"), in_shifted=sh)), x)
                shift = not shift
        else:
            if layout == "dh" or (layout == "d" and 2 * c_out <= 128):
                x = run(f"{layer.name}[pk]",
                        lambda a, w_=w_, b_=b_, sp=spatial, lay=layout:
                        elu(P.conv3d_packed_down(
                            a, w_, b_, full_spatial=sp,
                            packed_h=(lay == "dh"))), x)
                layout = "d"
            elif layout == "d":
                x = run(f"{layer.name}[pk]",
                        lambda a, w_=w_, b_=b_, sp=spatial:
                        elu(P.conv3d_packed_down_unpack(
                            a, w_, b_, full_spatial=sp)), x)
                layout = "none"
            else:
                x = run(layer.name, lambda a, w_=w_, b_=b_:
                        elu(conv3d(a, w_, b_, strides=(2, 2, 2))), x)
            spatial = tuple(-(-s // 2) for s in spatial)
        acts[layer.name] = (x, layout, shift, spatial)
    dec3 = params["decoder3D"]
    h_full, w_full = full_hw
    for name, _oc, skip in spec.dec3d:
        p = dec3[name]
        if skip is not None:
            sk, sk_layout, _sk_shift, sk_spatial = acts[skip]
            x = run(f"{name}[pk]",
                    lambda a, s_, p=p, tgt=sk_spatial, lay=layout,
                    sl=sk_layout: elu(P.deconv3d_packed(
                        a, p["weights"], p["biases"], out_spatial=tgt,
                        in_packed_d=(lay == "d"),
                        pack_h=(sl == "dh")) + s_), x, sk)
            layout, spatial = sk_layout, sk_spatial
        else:
            import os as _os

            import jax as _jax

            from redtail_tpu.ops.convolution import conv3d_transpose_dfold
            target = (spec.full_max_disp, h_full, w_full)
            c_out = p["weights"].shape[3]
            use_dfold = ((_jax.default_backend() == "tpu"
                          or _os.environ.get("REDTAIL_TPU_DFOLD") == "1")
                         and c_out == 1
                         and p["weights"].shape[:3] == (3, 3, 3)
                         and layout in ("d", "dh"))
            if use_dfold:
                # serving fuses the soft-argmin into the deconv's parity
                # maps (reduce=), so the profiler times them as ONE layer
                out = run(f"{name}+softargmin[pk]",
                          lambda a, p=p, target=target, lay=layout:
                          conv3d_transpose_dfold(
                              a, p["weights"], p["biases"],
                              out_spatial=target, d_packed=True,
                              h_packed=(lay == "dh"), layout="dlast",
                              reduce=lambda t: softargmin(t[..., 0],
                                                          axis=-1)), x)
                return entries, out
            else:
                if layout != "none":
                    x = run("unpack[pk]",
                            lambda a, sp=spatial, lay=layout:
                            P.unpack_conv(a, sp,
                                          packed_h=(lay == "dh")), x)
                x = run(name, lambda a, p=p, target=target:
                        conv3d_transpose(a, p["weights"], p["biases"],
                                         out_spatial=target,
                                         strides=(2, 2, 2)), x)
            layout = "none"
    out = run("softargmin", lambda a: softargmin(a, axis=1)[..., 0], x)
    return entries, out


def device_time_fn(fn, args, *, n_lo=5, n_hi=35, reps=3) -> float:
    """Sustained per-call seconds of ``fn(*args)`` on-device, measured by
    the chained-scan / two-length method (see module docstring).

    Adaptive: if the first estimate is below ~0.5 ms/call the loop
    lengths no longer dominate the host RTT noise (sub-0.1 ms layers
    measured NEGATIVE at flagship speed), so re-measure with loop
    lengths sized for ~60 ms of device time."""

    @partial(jax.jit, static_argnums=1)
    def loop(args, n):
        def body(carry, _):
            out = fn(*carry)
            eps = jnp.mean(out) * 1e-30

            def bump(a):  # thread the dependency through float leaves only
                if jnp.issubdtype(a.dtype, jnp.floating):
                    return a + eps.astype(a.dtype)
                return a
            return jax.tree_util.tree_map(bump, carry), jnp.mean(out)
        _, ms = lax.scan(body, args, None, length=n)
        return ms.sum()

    def timed(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(lo, hi):
        for n in (lo, hi):
            float(loop(args, n))  # compile + warm
        return (timed(hi) - timed(lo)) / (hi - lo)

    est = measure(n_lo, n_hi)
    if est < 0.5e-3:
        per = max(est, 2e-6)
        hi2 = min(4000, max(n_hi * 2, int(0.06 / per)))
        est = measure(max(n_lo, hi2 // 12), hi2)
    return est


def profile_stereo_layers(spec, params, left, right, *, n_lo=5, n_hi=35,
                          reps=3, check=True):
    """Time every spec layer in isolation on its real activations.

    Returns ``(rows, e2e_seconds)`` — rows are `LayerTime`, unsorted
    (network order); ``e2e_seconds`` is the fused full-model time by the
    same method.
    """
    from redtail_tpu.models import stereo_forward

    entries, out = stereo_layer_plan(spec, params, left, right)
    if check:
        want = np.asarray(stereo_forward(spec, params, left, right),
                          np.float32)
        got = np.asarray(out, np.float32)
        err = float(np.max(np.abs(want - got)))
        tol = 1e-2 if left.dtype == jnp.bfloat16 else 1e-4
        assert err <= tol, (
            f"layer plan diverged from stereo_forward (max err {err})")

    rows = []
    for name, fn, args, out_shape in entries:
        sec = device_time_fn(fn, args, n_lo=n_lo, n_hi=n_hi, reps=reps)
        gflop, gbytes = layer_cost_analysis(fn, args)
        rows.append(LayerTime(name, sec * 1e3, out_shape, gflop, gbytes))

    e2e = device_time_fn(
        lambda l, r: stereo_forward(spec, params, l, r), (left, right),
        n_lo=n_lo, n_hi=n_hi, reps=reps)
    return rows, e2e


def format_layer_table(rows: List[LayerTime], e2e_seconds: float,
                       peaks: Optional[Tuple[float, float]] = None) -> str:
    """The reference's layer-time table (`main.cpp:52-81`), descending —
    plus, when XLA's cost model and the device peaks are known, the
    roofline columns VERDICT r3 asked for: per-layer GFLOP, achieved
    TFLOP/s, %MFU (vs peak dense bf16), GB moved, and xRL = measured
    time over the roofline bound max(flops/peak, bytes/bandwidth) —
    so closure claims like "the head is N x off roofline" are
    reproducible output, not notes."""
    if peaks is None:
        peaks = device_peaks()
    total = sum(r.ms for r in rows)
    cols = peaks is not None and any(r.gflop is not None for r in rows)
    head = f"{'layer':<28s} {'ms':>9s} {'%':>6s}"
    if cols:
        head += (f" {'GFLOP':>8s} {'TFLOP/s':>8s} {'MFU%':>6s}"
                 f" {'GB':>7s} {'xRL':>6s}")
    lines = [head + "  output"]
    for r in sorted(rows, key=lambda r: -r.ms):
        line = f"{r.name:<28s} {r.ms:9.3f} {100 * r.ms / total:6.1f}"
        if cols:
            if r.gflop is not None and r.ms > 0:
                peak_tf, peak_gbs = peaks
                tflops = r.gflop / r.ms  # GFLOP/ms == TFLOP/s
                mfu = 100.0 * tflops / peak_tf
                roofline_ms = max(r.gflop / peak_tf,
                                  (r.gbytes or 0.0) / peak_gbs)
                xrl = r.ms / roofline_ms if roofline_ms > 0 else float("inf")
                line += (f" {r.gflop:8.2f} {tflops:8.2f} {mfu:6.1f}"
                         f" {(r.gbytes or 0.0):7.3f} {xrl:6.1f}")
            else:
                line += f" {'-':>8s} {'-':>8s} {'-':>6s} {'-':>7s} {'-':>6s}"
        lines.append(line + f"  {r.out_shape}")
    lines.append(f"{'sum of layers':<28s} {total:9.3f}")
    if cols:
        gf = sum(r.gflop or 0.0 for r in rows)
        gb = sum(r.gbytes or 0.0 for r in rows)
        peak_tf, peak_gbs = peaks
        lines.append(
            f"{'totals':<28s} {gf:9.2f} GFLOP {gb:8.3f} GB; peaks "
            f"{peak_tf:.0f} TFLOP/s (bf16) / {peak_gbs:.0f} GB/s; "
            "xRL = time / max(compute, bandwidth) bound")
    lines.append(f"{'end-to-end (fused)':<28s} {e2e_seconds * 1e3:9.3f}"
                 "   (XLA cross-layer fusion: e2e <= sum)")
    return "\n".join(lines)

"""Exactness gates for the channel-packed conv3d reformulations (v3).

Every packed op must reproduce its native counterpart in fp32 across
odd/even D/H/W (both TF-SAME lo parities), including the pair-convention
flip of stride-1 convs (shifted <-> aligned) and the lhs-dilated packed
transposed convs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from redtail_tpu.ops import conv3d, conv3d_transpose
from redtail_tpu.ops.packed3d import (
    conv3d_packed,
    conv3d_packed_down,
    conv3d_packed_down_unpack,
    deconv3d_packed,
    pack,
    unpack_conv,
    unpack_ref,
)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape),
                       jnp.float32)


def _randomize_biases(params, seed=7):
    """init_stereo_params zeros biases; real checkpoints don't. The
    packed emission once wrote elu(bias) into its zero boundary slots —
    caught only with nonzero biases, so parity gates must use them."""
    rs = np.random.RandomState(seed)

    def walk(node):
        return {k: (jnp.asarray(rs.randn(*v.shape) * 0.1, v.dtype)
                    if k == "biases" else
                    walk(v) if isinstance(v, dict) else v)
                for k, v in node.items()}

    return walk(params)


@pytest.mark.parametrize("dhw", [(8, 10, 12), (7, 9, 11), (6, 9, 12),
                                 (5, 6, 7)])
@pytest.mark.parametrize("packed_h", [True, False])
@pytest.mark.parametrize("shifted", [True, False])
def test_pack_unpack_roundtrip(dhw, packed_h, shifted):
    x = _rand((2, *dhw, 3))
    xp = pack(x, d=True, h=packed_h, shifted=shifted)
    assert xp.shape[-1] == (4 if packed_h else 2) * 3
    got = unpack_ref(xp, dhw, d=True, h=packed_h, shifted=shifted)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))


@pytest.mark.parametrize("dhw", [(8, 10, 12), (7, 9, 11), (6, 9, 12)])
@pytest.mark.parametrize("packed_h", [True, False])
def test_unpack_conv_matches_ref(dhw, packed_h):
    x = _rand((2, *dhw, 4))
    xp = pack(x, d=True, h=packed_h)
    got = unpack_conv(xp, dhw, packed_h=packed_h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               atol=1e-5)


@pytest.mark.parametrize("dhw", [(8, 10, 12), (7, 9, 11), (6, 9, 12)])
def test_unpack_h_conv_matches_ref(dhw):
    from redtail_tpu.ops.packed3d import unpack_h_conv

    x = _rand((2, *dhw, 4))
    xp = pack(x, d=True, h=True)
    got = unpack_h_conv(xp, dhw)         # -> D-packed only
    want = pack(x, d=True, h=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("out_spatial,in_d", [((96, 7, 9), 48),
                                              ((67, 6, 8), 34),
                                              ((12, 9, 11), 6)])
def test_dfold_d_packed_matches_unpacked(out_spatial, in_d):
    """dfold consuming the packed3d D-packed layout directly == dfold on
    the unpacked tensor (its transpose's d-major channel order is the
    packed (d2, pd, c) order)."""
    from redtail_tpu.ops.convolution import conv3d_transpose_dfold

    in_dhw = (in_d, -(-out_spatial[1] // 2), -(-out_spatial[2] // 2))
    x = _rand((2, *in_dhw, 3))
    w = _rand((3, 3, 3, 1, 3), 1) * 0.2
    b = _rand((1,), 2)
    want = conv3d_transpose_dfold(x, w, b, out_spatial=out_spatial)
    xp = pack(x, d=True, h=False)
    got = conv3d_transpose_dfold(xp, w, b, out_spatial=out_spatial,
                                 d_packed=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    # disparity-LAST emission: same values, (N, H, W, D, c) layout (the
    # soft-argmin consumer reduces D on the lane axis, skipping the
    # full-volume transpose)
    dlast = conv3d_transpose_dfold(xp, w, b, out_spatial=out_spatial,
                                   d_packed=True, layout="dlast")
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(dlast, (0, 3, 1, 2, 4))),
        np.asarray(want), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("out_spatial,in_d", [((96, 7, 9), 48),
                                              ((96, 8, 10), 48),
                                              ((67, 6, 8), 34),
                                              ((12, 9, 11), 6),
                                              ((11, 10, 13), 6)])
def test_dfold_h_packed_matches_unpacked(out_spatial, in_d):
    """dfold consuming the FULL 'dh' packed layout (D and H pairs in
    channels) == dfold on the unpacked tensor — the H window
    re-expression a_h = 2*a_s + qh - pp plus one output weave; deletes
    the unpack_h identity conv from the 3D heads."""
    from redtail_tpu.ops.convolution import conv3d_transpose_dfold

    in_dhw = (in_d, -(-out_spatial[1] // 2), -(-out_spatial[2] // 2))
    x = _rand((2, *in_dhw, 3))
    w = _rand((3, 3, 3, 1, 3), 1) * 0.2
    b = _rand((1,), 2)
    want = conv3d_transpose_dfold(x, w, b, out_spatial=out_spatial)
    xp = pack(x, d=True, h=True)
    for layout in ("ndhwc", "dlast"):
        got = conv3d_transpose_dfold(xp, w, b, out_spatial=out_spatial,
                                     d_packed=True, h_packed=True,
                                     layout=layout)
        if layout == "dlast":
            got = jnp.transpose(got, (0, 3, 1, 2, 4))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dhw", [(8, 10, 12), (7, 9, 11), (6, 9, 13),
                                 (5, 8, 7)])
@pytest.mark.parametrize("packed_h", [True, False])
@pytest.mark.parametrize("in_shifted", [True, False])
def test_conv3d_packed_matches_native(dhw, packed_h, in_shifted):
    cin, cout = 4, 5
    x = _rand((2, *dhw, cin))
    w = _rand((3, 3, 3, cin, cout), 1) * 0.2
    b = _rand((cout,), 2)
    want = conv3d(x, w, b)
    xp = pack(x, d=True, h=packed_h, shifted=in_shifted)
    yp = conv3d_packed(xp, w, b, full_spatial=dhw, packed_h=packed_h,
                       in_shifted=in_shifted)
    got = unpack_ref(yp, dhw, d=True, h=packed_h,
                     shifted=not in_shifted)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3d_packed_chain_alternates():
    """shifted -> conv -> aligned -> conv -> shifted == two native convs
    (checks the convention flip and the boundary/pad-slot masks)."""
    dhw = (7, 9, 11)
    x = _rand((1, *dhw, 4))
    w1 = _rand((3, 3, 3, 4, 6), 1) * 0.2
    w2 = _rand((3, 3, 3, 6, 4), 2) * 0.2
    want = conv3d(conv3d(x, w1), w2)
    xp = pack(x, d=True, h=True, shifted=True)
    y1 = conv3d_packed(xp, w1, full_spatial=dhw, in_shifted=True)
    y2 = conv3d_packed(y1, w2, full_spatial=dhw, in_shifted=False)
    got = unpack_ref(y2, dhw, d=True, h=True, shifted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dhw", [(8, 10, 12), (7, 9, 11), (6, 9, 13),
                                 (17, 21, 15)])
@pytest.mark.parametrize("packed_h", [True, False])
def test_conv3d_packed_down_matches_native(dhw, packed_h):
    cin, cout = 4, 5
    x = _rand((2, *dhw, cin))
    w = _rand((3, 3, 3, cin, cout), 1) * 0.2
    b = _rand((cout,), 2)
    want = conv3d(x, w, b, strides=(2, 2, 2))
    xp = pack(x, d=True, h=packed_h)
    yp = conv3d_packed_down(xp, w, b, full_spatial=dhw, packed_h=packed_h)
    out_dhw = tuple(-(-s // 2) for s in dhw)
    got = unpack_ref(yp, out_dhw, d=True, h=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dhw", [(8, 10, 12), (7, 9, 11), (17, 21, 15),
                                 (12, 9, 13)])
def test_conv3d_packed_down_unpack_matches_native(dhw):
    cin, cout = 4, 6
    x = _rand((2, *dhw, cin))
    w = _rand((3, 3, 3, cin, cout), 1) * 0.2
    b = _rand((cout,), 2)
    want = conv3d(x, w, b, strides=(2, 2, 2))
    xp = pack(x, d=True, h=False)
    got = conv3d_packed_down_unpack(xp, w, b, full_spatial=dhw)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("in_dhw,out_dhw", [
    ((4, 5, 6), (8, 10, 12)),
    ((4, 5, 6), (7, 9, 11)),
    ((5, 3, 7), (9, 6, 13)),
])
@pytest.mark.parametrize("pack_h", [True, False])
@pytest.mark.parametrize("in_packed_d", [True, False])
def test_deconv3d_packed_matches_native(in_dhw, out_dhw, pack_h,
                                        in_packed_d):
    cin, cout = 5, 4
    x = _rand((2, *in_dhw, cin))
    w = _rand((3, 3, 3, cout, cin), 1) * 0.2
    b = _rand((cout,), 2)
    want = conv3d_transpose(x, w, b, out_spatial=out_dhw,
                            strides=(2, 2, 2), impl="dilated")
    xin = pack(x, d=True, h=False) if in_packed_d else x
    yp = deconv3d_packed(xin, w, b, out_spatial=out_dhw,
                         in_packed_d=in_packed_d, pack_h=pack_h)
    got = unpack_ref(yp, out_dhw, d=True, h=pack_h)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_towers_match_per_tower(monkeypatch):
    """Block-diagonal siamese towers == two independent towers, for the
    2D flagship (incl. conv1 skip tap) and a 3D resnet18 encoder."""
    import dataclasses

    from redtail_tpu.models import (STEREO_SPECS, init_stereo_params,
                                    stereo_forward)

    for model in ("resnet18_2d", "resnet18"):
        spec = dataclasses.replace(STEREO_SPECS[model], input_hw=(34, 66),
                                   max_disp=8)
        params = _randomize_biases(init_stereo_params(spec))
        left = _rand((1, 34, 66, 3), 3) * 0.5 + 0.5
        right = _rand((1, 34, 66, 3), 4) * 0.5 + 0.5
        monkeypatch.setenv("REDTAIL_TPU_FUSED_TOWERS", "0")
        want = np.asarray(stereo_forward(spec, params, left, right))
        monkeypatch.setenv("REDTAIL_TPU_FUSED_TOWERS", "1")
        got = np.asarray(stereo_forward(spec, params, left, right))
        # identical sums, different fp32 accumulation order in the
        # 64-wide contraction; amplified by soft-argmax near ties
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_fused_towers_fall_back_for_quantized_params(monkeypatch):
    """INT8 leaves need per-layer boundaries: _encode_pair must take the
    per-tower branch (never the block-diagonal one) when any encoder
    leaf is quantized, even with fused towers forced on."""
    import dataclasses

    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.models import stereo as S
    from redtail_tpu.quant.stereo_int8 import (calibrate_stereo,
                                               quantize_stereo_params_int8)

    monkeypatch.setenv("REDTAIL_TPU_FUSED_TOWERS", "1")
    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(34, 66), max_disp=8)
    params = init_stereo_params(spec)
    left = np.asarray(_rand((34, 66, 3), 3) * 0.5 + 0.5)
    right = np.asarray(_rand((34, 66, 3), 4) * 0.5 + 0.5)
    scales = calibrate_stereo(spec, params, [(left, right)])
    qparams = quantize_stereo_params_int8(params, scales)
    assert S._has_quantized(qparams["encoder2D"])

    def boom(*a, **k):
        raise AssertionError("fused towers must not run on int8 leaves")
    monkeypatch.setattr(S, "_fused_resnet_towers", boom)
    out = S.stereo_forward(spec, qparams, jnp.asarray(left)[None],
                           jnp.asarray(right)[None])
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("model", ["nvtiny", "nvsmall", "resnet18"])
def test_full_tpu_configuration_on_cpu(model, monkeypatch):
    """Patch the backend name so EVERY TPU default engages at once
    (packed 3D stack, fused towers, dfold-from-packed final deconv) and
    gate the whole TPU-configured forward against the plain path on CPU
    — covers branch combinations the env-flag tests can't reach."""
    import dataclasses

    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.models import stereo as S

    spec = dataclasses.replace(STEREO_SPECS[model], input_hw=(34, 66),
                               max_disp=8)
    params = _randomize_biases(init_stereo_params(spec))
    left = _rand((1, 34, 66, 3), 3) * 0.5 + 0.5
    right = _rand((1, 34, 66, 3), 4) * 0.5 + 0.5
    want = np.asarray(S.stereo_forward(spec, params, left, right))
    monkeypatch.setattr(S.jax, "default_backend", lambda: "tpu")
    got = np.asarray(S.stereo_forward(spec, params, left, right))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_packed_layer_plan_matches_forward(monkeypatch):
    """The profiler's packed layer plan reproduces the packed forward
    exactly (so the per-layer table cannot drift from the real model)."""
    import dataclasses

    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.models import stereo_forward
    from redtail_tpu.runtime.layer_profiler import stereo_layer_plan

    monkeypatch.setenv("REDTAIL_TPU_PACKED3D", "1")
    spec = dataclasses.replace(STEREO_SPECS["nvsmall"], input_hw=(34, 66),
                               max_disp=8)
    params = _randomize_biases(init_stereo_params(spec))
    left = _rand((1, 34, 66, 3), 3) * 0.5 + 0.5
    right = _rand((1, 34, 66, 3), 4) * 0.5 + 0.5
    entries, out = stereo_layer_plan(spec, params, left, right)
    want = np.asarray(stereo_forward(spec, params, left, right))
    assert any("[pk]" in name for name, *_ in entries)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)

    # flagship with fused towers: plan must follow the block-diag path
    monkeypatch.setenv("REDTAIL_TPU_FUSED_TOWERS", "1")
    spec2 = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                                input_hw=(34, 66), max_disp=8)
    params2 = _randomize_biases(init_stereo_params(spec2))
    entries2, out2 = stereo_layer_plan(spec2, params2, left, right)
    want2 = np.asarray(stereo_forward(spec2, params2, left, right))
    assert any("[bd]" in name for name, *_ in entries2)
    np.testing.assert_allclose(np.asarray(out2), want2, atol=1e-5)

    # full TPU serving config: s2d-packed inputs + H-packed towers —
    # the plan must follow the [hp] path and agree with the forward
    from redtail_tpu.ops.space_to_depth import space_to_depth2_np

    monkeypatch.setenv("REDTAIL_TPU_HPACK2D", "1")
    pl = jnp.asarray(space_to_depth2_np(np.asarray(left)))
    pr = jnp.asarray(space_to_depth2_np(np.asarray(right)))
    entries3, out3 = stereo_layer_plan(spec2, params2, pl, pr)
    want3 = np.asarray(stereo_forward(spec2, params2, pl, pr))
    assert any("[hp]" in name for name, *_ in entries3)
    np.testing.assert_allclose(np.asarray(out3), want3, atol=1e-5)


@pytest.mark.parametrize("model", ["nvtiny", "nvsmall", "resnet18"])
def test_packed_head_matches_native_forward(model, monkeypatch):
    """Full packed 3D pipeline == the native volume head, small shapes
    (exercises every layout transition of all three 3D specs)."""
    import dataclasses

    from redtail_tpu.models import (STEREO_SPECS, init_stereo_params,
                                    stereo_forward)

    spec = dataclasses.replace(STEREO_SPECS[model], input_hw=(34, 66),
                               max_disp=8)
    params = _randomize_biases(init_stereo_params(spec))
    left = _rand((1, 34, 66, 3), 3) * 0.5 + 0.5
    right = _rand((1, 34, 66, 3), 4) * 0.5 + 0.5

    monkeypatch.setenv("REDTAIL_TPU_PACKED3D", "0")
    want = np.asarray(stereo_forward(spec, params, left, right))
    monkeypatch.setenv("REDTAIL_TPU_PACKED3D", "1")
    got = np.asarray(stereo_forward(spec, params, left, right))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)

    # the constant-multiply mask form (per-layer perf knob) is exact:
    # flipping EVERY layer to 'mul' must reproduce the where-form head
    all_layers = ",".join([ly.name for ly in spec.enc3d]
                          + [n for n, _, _ in spec.dec3d])
    monkeypatch.setenv("REDTAIL_TPU_MASK_MUL", all_layers)
    got_mul = np.asarray(stereo_forward(spec, params, left, right))
    np.testing.assert_array_equal(got_mul, got)


@pytest.mark.parametrize("out_spatial,in_d,h_packed",
                         [((96, 7, 9), 48, True), ((96, 8, 10), 48, False),
                          ((11, 10, 13), 6, True)])
def test_dfold_reduce_commutes_with_weaves(out_spatial, in_d, h_packed):
    """reduce= (the models' fused soft-argmin) applied per parity map
    BEFORE the full-res weaves == soft-argmin of the woven dlast volume:
    the weaves are pure spatial interleaves/slices, so any per-pixel
    reduction commutes exactly."""
    from redtail_tpu.ops.convolution import conv3d_transpose_dfold
    from redtail_tpu.ops.softargmax import softargmin

    in_dhw = (in_d, -(-out_spatial[1] // 2), -(-out_spatial[2] // 2))
    x = _rand((2, *in_dhw, 3))
    w = _rand((3, 3, 3, 1, 3), 1) * 0.2
    b = _rand((1,), 2)
    xp = pack(x, d=True, h=h_packed)
    dlast = conv3d_transpose_dfold(xp, w, b, out_spatial=out_spatial,
                                   d_packed=True, h_packed=h_packed,
                                   layout="dlast")
    want = softargmin(dlast[..., 0], axis=-1)
    got = conv3d_transpose_dfold(
        xp, w, b, out_spatial=out_spatial, d_packed=True,
        h_packed=h_packed, layout="dlast",
        reduce=lambda t: softargmin(t[..., 0], axis=-1))
    assert got.shape == want.shape == (2, *out_spatial[1:])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=0)


@pytest.mark.parametrize("dhw", [(8, 17, 12), (7, 18, 16)])
def test_conv3d_packed_pallas_matches_xla(monkeypatch, dhw):
    """The Mosaic stride-1 conv path (interpret mode off-TPU) == the XLA
    dense-conv path, full packed semantics (bias, masks, parities)."""
    cin = cout = 4
    x = _rand((1, *dhw, cin))
    w = _rand((3, 3, 3, cin, cout), 1) * 0.2
    b = _rand((cout,), 2)
    xp = pack(x, d=True, h=True, shifted=True)
    monkeypatch.delenv("REDTAIL_TPU_PALLAS_CONV3D", raising=False)
    want = conv3d_packed(xp, w, b, full_spatial=dhw, packed_h=True,
                         in_shifted=True)
    monkeypatch.setenv("REDTAIL_TPU_PALLAS_CONV3D", "1")
    from redtail_tpu.ops.packed3d import _pallas_bh
    assert _pallas_bh(xp, np.zeros((2, 2, 3, 4 * cin, 4 * cout))) \
        is not None, "gate must take the Mosaic path (else test is vacuous)"
    got = conv3d_packed(xp, w, b, full_spatial=dhw, packed_h=True,
                        in_shifted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

"""The stereo-disparity model zoo, TPU-native.

Four networks matching the reference's generated TensorRT graphs
(`stereoDNN/sample_app/{nvtiny_513x161,nvsmall_1025x321,resnet18_1025x321,
resnet18_2D_513x257}_net.cpp`, topologies in `stereoDNN/scripts/
model_{nvsmall,resnet18,resnet18_2D}.py`):

- **NVTiny** 513x161 and **NVSmall** 1025x321: siamese 2D conv encoder ->
  concat cost volume -> 3D conv encoder/decoder with skip connections ->
  soft-argmin over the full-resolution disparity axis.
- **ResNet-18 (3D)** 1025x321: siamese ResNet-18 encoder (8 residual
  blocks) -> concat cost volume -> deeper 3D encoder/decoder -> soft-argmin.
- **ResNet18-2D** 513x257: siamese ResNet-18 encoder -> correlation cost
  volume -> soft-argmax -> concat with left conv1 features -> 2D bottleneck
  encoder/decoder -> sigmoid (disparity normalized to [0,1]; multiply by
  image width for pixels, `sample_app/main.cpp:325-327`).

Each is a pure function ``stereo_forward(spec, params, left, right)`` over a
nested param dict whose structure mirrors the TF checkpoint
(``encoder2D/conv1/{weights,biases}`` ...). One `jax.jit` compiles the whole
network into a single XLA program — the reference's plugin graph,
engine-builder and layer scheduler have no runtime counterpart here.

Every TRT graph in the reference was generated per input size; here shapes
are derived at trace time, so any input size works per spec.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from redtail_tpu.ops import (
    conv2d,
    conv2d_transpose,
    conv3d,
    conv3d_transpose,
    cost_volume,
    elu,
    sigmoid,
    softargmax,
    softargmin,
)
from redtail_tpu.ops.cost_volume import corr_cost_volume_dlast
from redtail_tpu.ops.convolution import use_plain_lowering

Params = Dict[str, Dict]


# ------------------------------------------------------------------ specs


@dataclass(frozen=True)
class Conv3dLayer:
    name: str
    out_ch: int
    stride: int = 1  # applied to all of (D, H, W)


@dataclass(frozen=True)
class StereoSpec:
    """Static description of one stereo network."""

    name: str
    input_hw: Tuple[int, int]          # (H, W) the reference shipped; any works
    max_disp: int                      # at cost-volume (half) resolution
    encoder2d: str                     # 'plain' (conv1..5) | 'resnet18'
    enc2d_channels: Tuple[int, ...]    # plain encoder channel progression
    enc3d: Tuple[Conv3dLayer, ...] = ()
    dec3d: Tuple[Tuple[str, int, Optional[str]], ...] = ()  # (name, out_ch, skip)
    corr: bool = False
    bneck_channels: Tuple[Tuple[str, int, int], ...] = ()   # (name, out_ch, stride)
    bneck_dec: Tuple[Tuple[str, int, Optional[str]], ...] = ()

    @property
    def full_max_disp(self) -> int:
        return 2 * self.max_disp


_NVSMALL_ENC3D = lambda f: (  # noqa: E731 — shared NVTiny/NVSmall shape, base width f
    Conv3dLayer("conv3D_1", f),
    Conv3dLayer("conv3D_2", f),
    Conv3dLayer("conv3D_3ds", 2 * f, stride=2),
    Conv3dLayer("conv3D_4", 2 * f),
    Conv3dLayer("conv3D_5", 2 * f),
    Conv3dLayer("conv3D_6ds", 4 * f, stride=2),
    Conv3dLayer("conv3D_7", 4 * f),
    Conv3dLayer("conv3D_8", 4 * f),
)

_RESNET18_ENC3D = (
    Conv3dLayer("conv3D_1a", 32),
    Conv3dLayer("conv3D_1b", 32),
    Conv3dLayer("conv3D_1ds", 64, stride=2),
    Conv3dLayer("conv3D_2a", 64),
    Conv3dLayer("conv3D_2b", 64),
    Conv3dLayer("conv3D_2ds", 64, stride=2),
    Conv3dLayer("conv3D_3a", 64),
    Conv3dLayer("conv3D_3b", 64),
    Conv3dLayer("conv3D_3ds", 64, stride=2),
    Conv3dLayer("conv3D_4a", 64),
    Conv3dLayer("conv3D_4b", 64),
    Conv3dLayer("conv3D_4ds", 128, stride=2),
    Conv3dLayer("conv3D_5a", 128),
    Conv3dLayer("conv3D_5b", 128),
)

STEREO_SPECS: Dict[str, StereoSpec] = {
    # `nvtiny_513x161_net.cpp`: conv5 -> 8ch, cost vol C=16, D=24.
    "nvtiny": StereoSpec(
        name="nvtiny", input_hw=(161, 513), max_disp=24,
        encoder2d="plain", enc2d_channels=(32, 32, 32, 32, 8),
        enc3d=_NVSMALL_ENC3D(16),
        dec3d=(("deconv3D_1", 32, "conv3D_5"),
               ("deconv3D_2", 16, "conv3D_2"),
               ("deconv3D_3", 1, None)),
    ),
    # `nvsmall_1025x321_net.cpp`: conv5 -> 32ch, cost vol C=64, D=48.
    "nvsmall": StereoSpec(
        name="nvsmall", input_hw=(321, 1025), max_disp=48,
        encoder2d="plain", enc2d_channels=(32, 32, 32, 32, 32),
        enc3d=_NVSMALL_ENC3D(32),
        dec3d=(("deconv3D_1", 64, "conv3D_5"),
               ("deconv3D_2", 32, "conv3D_2"),
               ("deconv3D_3", 1, None)),
    ),
    # `resnet18_1025x321_net.cpp`: resnet encoder, cost vol C=64, D=68.
    "resnet18": StereoSpec(
        name="resnet18", input_hw=(321, 1025), max_disp=68,
        encoder2d="resnet18", enc2d_channels=(32,),
        enc3d=_RESNET18_ENC3D,
        dec3d=(("deconv3D_1", 64, "conv3D_4b"),
               ("deconv3D_2", 64, "conv3D_3b"),
               ("deconv3D_3", 64, "conv3D_2b"),
               ("deconv3D_4", 32, "conv3D_1b"),
               ("deconv3D_5", 1, None)),
    ),
    # `resnet18_2D_513x257_net.cpp`: correlation cost volume, 2D bottleneck.
    "resnet18_2d": StereoSpec(
        name="resnet18_2d", input_hw=(257, 513), max_disp=48,
        encoder2d="resnet18", enc2d_channels=(32,), corr=True,
        bneck_channels=(("conv2D_1", 32, 1), ("conv2D_2", 32, 1),
                        ("conv2D_3ds", 64, 2), ("conv2D_4", 64, 1),
                        ("conv2D_5", 64, 1), ("conv2D_6ds", 128, 2),
                        ("conv2D_7", 128, 1), ("conv2D_8", 128, 1)),
        bneck_dec=(("deconv2D_1", 64, "conv2D_5"),
                   ("deconv2D_2", 32, "conv2D_2"),
                   ("deconv2D_3", 1, None)),
    ),
}


# ------------------------------------------------------------- forward


# Calibration hook: when set, every _c2d reports (leaf_dict, input) —
# used by quant.stereo_int8 to collect activation histograms without a
# second forward implementation. None in production (zero overhead).
_conv_tap = None


def _c2d(p, x, *, stride=1, act=None):
    if _conv_tap is not None:
        _conv_tap(p, x)
    if "weights_q" in p:
        # INT8-activation leaf (quant.stereo_int8): int8 x int8 -> int32
        # on the MXU, dequant fused into the output — the TensorRT INT8
        # engine mode for the 2D conv stack (`tensor_net.cpp:92-119`).
        from redtail_tpu.quant.ptq import conv2d_int8, quantize_act
        out = conv2d_int8(
            quantize_act(x, p["x_scale"]), p["weights_q"],
            x_scale=p["x_scale"], w_scale=p["w_scale"], bias=p["biases"],
            strides=(stride, stride), padding="SAME", out_dtype=x.dtype)
    else:
        out = conv2d(x, p["weights"], p["biases"], strides=(stride, stride))
    return elu(out) if act == "elu" else out


def _conv1(p, x, orig_hw, *, act="elu"):
    """The 5x5 stride-2 stem — or its exact space-to-depth 3x3 stride-1
    form when ``x`` arrives s2d-packed from the ingest (C = 4*Ci; see
    ops/space_to_depth.py — at Ci=3 the native form fills 3 of 128 MXU
    lanes and measured ~6x slower).  ``orig_hw`` fixes the TF-SAME pad
    parity of the original conv."""
    kernel = p["weights"] if "weights" in p else p["weights_q"]
    if x.shape[-1] == 4 * kernel.shape[2]:
        if "weights_q" in p:
            raise ValueError("s2d-packed input unsupported with int8 conv1")
        from redtail_tpu.ops.space_to_depth import conv5s2_kernel_to_s2d
        out = conv2d(x, conv5s2_kernel_to_s2d(p["weights"], orig_hw),
                     p["biases"], strides=(1, 1))
        return elu(out) if act == "elu" else out
    return _c2d(p, x, stride=2, act=act)


def _plain_encoder(params, x, orig_hw):
    """NVTiny/NVSmall 2D feature tower: conv1 5x5 s2 + conv2..4 + conv5
    (no activation on conv5 — `model_nvsmall.py:33-35`)."""
    enc = params["encoder2D"]
    x = _conv1(enc["conv1"], x, orig_hw, act="elu")
    for l in ("conv2", "conv3", "conv4"):
        x = _c2d(enc[l], x, act="elu")
    return _c2d(enc["conv5"], x)


def _resnet_encoder(params, x, orig_hw, *, return_conv1=False):
    """ResNet-18 feature tower (`model_resnet18.py:write_2d_encoder`):
    conv1 5x5 s2 + 8 residual blocks + encoder2D_out (no final act)."""
    enc = params["encoder2D"]
    x = _conv1(enc["conv1"], x, orig_hw, act="elu")
    conv1_act = x
    for i in range(1, 9):
        blk = enc[f"resblock{i}"]
        y = _c2d(blk["res_conv1"], x, act="elu")
        y = _c2d(blk["res_conv2"], y)
        x = elu(y + x)
    out = _c2d(enc["encoder2D_out"], x)
    return (out, conv1_act) if return_conv1 else out


def _blockdiag(w):
    """(kh, kw, ci, co) -> (kh, kw, 2ci, 2co) with two copies of w on the
    diagonal: one conv computes both siamese towers at 2x the MXU lane
    fill (measured 1.7x per conv-pair on a v5e at the flagship shapes;
    the zero blocks' extra FLOPs are cheaper than the idle lanes)."""
    z = jnp.zeros_like(w)
    top = jnp.concatenate([w, z], axis=3)
    bot = jnp.concatenate([z, w], axis=3)
    return jnp.concatenate([top, bot], axis=2)


def _fused_resnet_towers(params, left, right, orig_hw, *, corr=False):
    """Both ResNet-18 towers as ONE chain of block-diagonal convs over
    channel-concatenated images.  Exact (block-diagonal = independent
    towers; gated vs the per-tower path in tests/test_models.py).

    Returns (fl, fr, conv1_left, h_packed): ``h_packed`` is True when
    the features stay in the packed2d layout (corr model on the
    H-packed path — the correlation head consumes it directly)."""
    enc = params["encoder2D"]
    x = jnp.concatenate([left, right], axis=-1)  # (N, H, W, 6) or packed 24

    def c2d(p, x, *, stride=1, act=None):
        out = conv2d(x, _blockdiag(p["weights"]),
                     jnp.tile(p["biases"], (2,)),
                     strides=(stride, stride))
        return elu(out) if act == "elu" else out

    if x.shape[-1] == 8 * enc["conv1"]["weights"].shape[2]:
        # s2d-packed pair: block-diag of the folded 3x3 kernel (each
        # tower's 12 packed channels stay contiguous — the ingest packs
        # the two images separately; see `_conv1`).
        from redtail_tpu.ops.space_to_depth import conv5s2_kernel_to_s2d
        k3 = conv5s2_kernel_to_s2d(enc["conv1"]["weights"], orig_hw)
        if use_hpack2d():
            keep = corr and use_hpack_corr()
            return _hpacked_resnet_towers(enc, x, k3, orig_hw,
                                          unpack=not keep) + (keep,)
        x = elu(conv2d(x, _blockdiag(k3),
                       jnp.tile(enc["conv1"]["biases"], (2,)),
                       strides=(1, 1)))
    else:
        x = c2d(enc["conv1"], x, stride=2, act="elu")
    conv1_left = x[..., :x.shape[-1] // 2]
    for i in range(1, 9):
        blk = enc[f"resblock{i}"]
        y = c2d(blk["res_conv1"], x, act="elu")
        y = c2d(blk["res_conv2"], y)
        x = elu(y + x)
    out = c2d(enc["encoder2D_out"], x)
    c = out.shape[-1] // 2
    return out[..., :c], out[..., c:], conv1_left, False


def _hpacked_resnet_towers(enc, x_s2d, k3, orig_hw, *, unpack=True):
    """Block-diagonal towers with H row pairs ALSO folded into channels
    (`ops/packed2d.py`): the resblocks run at 128 MXU lanes instead of
    64 — measured 2.56x on the 4-resblock chain. conv1's s2d stem emits
    the H-packed layout for free (kh=4 stride-2 form); the resblocks
    alternate pair conventions; one identity-conv unpack at the end —
    unless ``unpack=False`` (the corr model consumes the packed layout
    directly: correlation is row-independent)."""
    from redtail_tpu.ops import packed2d as P2

    h_half = -(-orig_hw[0] // 2)
    f = enc["conv1"]["weights"].shape[3]  # per-tower channels (32)
    x = P2.conv1_s2d_hpacked(
        x_s2d, _blockdiag(k3), jnp.tile(enc["conv1"]["biases"], (2,)),
        h_half=h_half, act=elu)           # (N, hp, W, (q, tower, f))
    conv1_left_p = jnp.concatenate(
        [x[..., :f], x[..., 2 * f:3 * f]], axis=-1)  # (q, f) packed
    for i in range(1, 9):
        blk = enc[f"resblock{i}"]
        y = P2.conv2d_hpacked(x, _blockdiag(blk["res_conv1"]["weights"]),
                              jnp.tile(blk["res_conv1"]["biases"], (2,)),
                              h=h_half, in_shifted=False, act=elu)
        y = P2.conv2d_hpacked(y, _blockdiag(blk["res_conv2"]["weights"]),
                              jnp.tile(blk["res_conv2"]["biases"], (2,)),
                              h=h_half, in_shifted=True)
        x = elu(y + x)
    out = P2.conv2d_hpacked_keep(
        x, _blockdiag(enc["encoder2D_out"]["weights"]),
        jnp.tile(enc["encoder2D_out"]["biases"], (2,)), h=h_half)
    if not unpack:
        # packed (q, tower, f): split towers within each parity group
        fl = jnp.concatenate([out[..., :f], out[..., 2 * f:3 * f]], -1)
        fr = jnp.concatenate([out[..., f:2 * f], out[..., 3 * f:]], -1)
        return fl, fr, conv1_left_p
    conv1_left = P2.unpack_h2d(conv1_left_p, h_half)
    full = P2.unpack_h2d(out, h_half)     # (N, h, W, (tower, f))
    c = full.shape[-1] // 2
    return full[..., :c], full[..., c:], conv1_left


def use_hpack2d() -> bool:
    """H-packed 2D towers (s2d ingest required): default ON on TPU,
    REDTAIL_TPU_HPACK2D=0/1 overrides."""
    import os
    if use_plain_lowering():
        return False
    v = os.environ.get("REDTAIL_TPU_HPACK2D")
    if v is not None:
        return v == "1"
    return jax.default_backend() == "tpu"


def use_hpack_corr() -> bool:
    """Correlation head consumes the H-packed features directly
    (packed corr volume + per-group soft-argmax + packed bneck entry).

    Default OFF — measured SLOWER composed on the v5e (373.5 vs 379.4
    fps flagship): the two unpack convs it removes were already fusing
    into the corr volume's per-disparity slices, while the packed
    volume's per-parity-group channel reductions ((.., 2, C) reshape +
    sum over the split lane axis) lower worse than the plain lane sum.
    Same lesson class as r1's pallas CV: isolated wins != composed
    wins. REDTAIL_TPU_HPACK_CORR=1 opts in (exactness-gated)."""
    import os
    if use_plain_lowering():
        return False
    return os.environ.get("REDTAIL_TPU_HPACK_CORR") == "1"


def use_fused_towers() -> bool:
    """Block-diagonal siamese towers: default on TPU
    (REDTAIL_TPU_FUSED_TOWERS=0/1 overrides)."""
    import os
    if use_plain_lowering():
        return False
    v = os.environ.get("REDTAIL_TPU_FUSED_TOWERS")
    if v is not None:
        return v == "1"
    return jax.default_backend() == "tpu"


def _has_quantized(node) -> bool:
    if isinstance(node, dict):
        return "weights_q" in node or any(
            _has_quantized(v) for v in node.values() if isinstance(v, dict))
    return False


def _encode_pair(spec, params, left, right):
    # Default: towers as two separate chains — batching the siamese pair
    # on the BATCH axis was measured slower (171 vs 197 fps; concat/
    # split traffic), but on TPU the block-diagonal CHANNEL fusion wins
    # 1.7x per conv pair (32 -> 64 MXU lanes), so the resnet18 towers
    # fuse by default there.  Falls back per-tower when INT8 leaves or
    # a calibration tap are active (they need per-layer boundaries).
    orig_hw = spec.input_hw if left.shape[-1] == 12 else left.shape[1:3]
    if (spec.encoder2d == "resnet18" and use_fused_towers()
            and _conv_tap is None
            and not _has_quantized(params["encoder2D"])):
        return _fused_resnet_towers(params, left, right, orig_hw,
                                    corr=spec.corr)
    if spec.encoder2d == "plain":
        return (_plain_encoder(params, left, orig_hw),
                _plain_encoder(params, right, orig_hw), None, False)
    fl, conv1 = _resnet_encoder(params, left, orig_hw, return_conv1=True)
    fr = _resnet_encoder(params, right, orig_hw)
    return fl, fr, conv1, False


def _volume_head(spec, params, vol, full_hw, *, first_act=None):
    """3D encoder/decoder + soft-argmin (NVTiny/NVSmall/ResNet-18).

    ``first_act``: precomputed activation of the first 3D layer (the
    fused cost-volume+conv3d path); when given, ``vol`` is unused and the
    encoder starts from layer 2."""
    enc3 = params["encoder3D"]
    acts: Dict[str, jnp.ndarray] = {}
    layers = spec.enc3d
    if first_act is not None:
        acts[layers[0].name] = first_act
        x = first_act
        layers = layers[1:]
    else:
        x = vol
    for layer in layers:
        s = (layer.stride,) * 3
        x = elu(conv3d(x, enc3[layer.name]["weights"],
                       enc3[layer.name]["biases"], strides=s))
        acts[layer.name] = x
    dec3 = params["decoder3D"]
    full_d = spec.full_max_disp
    h_full, w_full = full_hw
    for name, _out_ch, skip in spec.dec3d:
        p = dec3[name]
        if skip is not None:
            target = acts[skip].shape[1:4]
        else:
            target = (full_d, h_full, w_full)
        x = conv3d_transpose(x, p["weights"], p["biases"], out_spatial=target,
                             strides=(2, 2, 2))
        if skip is not None:
            x = elu(x + acts[skip])
    # (N, D_full, H, W, 1) -> (N, H, W): expected disparity in pixels.
    return softargmin(x, axis=1)[..., 0]


def _volume_head_packed(spec, params, full_hw, *, first_packed,
                        vol_spatial):
    """Channel-packed twin of `_volume_head` (TPU fast path).

    The 3D stack runs at 16-64 channels natively — a fraction of the
    MXU's 128 lanes (conv3D_2 measured 8% MFU).  Here every layer runs
    with D (and H where channels allow) pairs folded into channels
    (`ops/packed3d.py`): measured 1.7-3.1x per layer on a v5e, exact to
    the native head (gated in tests/test_packed3d.py::test_packed_head).

    Layer policy: stride-1 layers keep their input layout; downsamples
    move DH->D and drop to native once 2*c_out > 128 lanes; decoders
    emit each skip's layout directly from the transposed conv; the final
    full-res deconv and soft-argmin run native (dfold handles c_out=1).
    """
    import os

    from redtail_tpu.ops import packed3d as P

    # Per-layer mask lowering (the measured winner differs by fusion
    # context — see packed3d._mask_slot). Default 'auto' = each mask
    # family's measured winner; REDTAIL_TPU_MASK_MUL (comma list of
    # layer names) forces 'mul' per layer and REDTAIL_TPU_MASK_FORM
    # forces one form globally (both are sweep/measurement knobs).
    global_form = os.environ.get("REDTAIL_TPU_MASK_FORM")
    mul_layers = frozenset(
        s for s in os.environ.get("REDTAIL_TPU_MASK_MUL", "").split(",") if s)

    def _mf(name):
        return P.mask_form(global_form or
                           ("mul" if name in mul_layers else "auto"))

    enc3 = params["encoder3D"]
    layers = spec.enc3d
    acts: Dict[str, tuple] = {}
    x = first_packed  # shifted-DH, ELU already applied by the fused op
    layout, conv_shift, spatial = "dh", True, vol_spatial
    for layer in layers[1:]:
        p = enc3[layer.name]
        w_, b_ = p["weights"], p["biases"]
        c_out = w_.shape[4]
        if layer.stride == 1:
            if layout == "none":
                x = elu(conv3d(x, w_, b_))
            else:
                with _mf(layer.name):
                    x = elu(P.conv3d_packed(x, w_, b_, full_spatial=spatial,
                                            packed_h=(layout == "dh"),
                                            in_shifted=conv_shift))
                conv_shift = not conv_shift
        else:
            assert not conv_shift, \
                f"{layer.name}: downsample needs an aligned input"
            if layout == "dh" or (layout == "d" and 2 * c_out <= 128):
                with _mf(layer.name):
                    x = elu(P.conv3d_packed_down(x, w_, b_,
                                                 full_spatial=spatial,
                                                 packed_h=(layout == "dh")))
                layout = "d"
            elif layout == "d":
                x = elu(P.conv3d_packed_down_unpack(x, w_, b_,
                                                    full_spatial=spatial))
                layout = "none"
            else:
                x = elu(conv3d(x, w_, b_, strides=(2, 2, 2)))
            spatial = tuple(-(-s // 2) for s in spatial)
        acts[layer.name] = (x, layout, conv_shift, spatial)
    dec3 = params["decoder3D"]
    h_full, w_full = full_hw
    for name, _out_ch, skip in spec.dec3d:
        p = dec3[name]
        if skip is not None:
            sk, sk_layout, sk_shift, sk_spatial = acts[skip]
            assert not sk_shift, f"skip {skip} must be aligned"
            assert layout in ("none", "d"), \
                f"{name}: deconv input layout {layout}"
            with _mf(name):
                y = P.deconv3d_packed(x, p["weights"], p["biases"],
                                      out_spatial=sk_spatial,
                                      in_packed_d=(layout == "d"),
                                      pack_h=(sk_layout == "dh"))
            x = elu(y + sk)
            layout, conv_shift, spatial = sk_layout, sk_shift, sk_spatial
        else:
            target = (spec.full_max_disp, h_full, w_full)
            from redtail_tpu.ops.convolution import conv3d_transpose_dfold
            import os
            c_out = p["weights"].shape[3]
            use_dfold = ((jax.default_backend() == "tpu"
                          or os.environ.get("REDTAIL_TPU_DFOLD") == "1")
                         and c_out == 1
                         and p["weights"].shape[:3] == (3, 3, 3)
                         and layout in ("d", "dh"))
            if use_dfold:
                # dfold consumes the packed layout directly — D-packed
                # (d-major channel order IS its transpose's order) and,
                # since r3, H-packed too (no unpack_h identity conv);
                # emits disparity-LAST so the soft-argmin is a lane
                # reduction and the (N, D, H, W) transpose never happens.
                # reduce=: soft-argmin runs per parity map BEFORE the
                # full-res weaves (exact; the weaves were the layer's
                # real cost — see conv3d_transpose_dfold).
                return conv3d_transpose_dfold(
                    x, p["weights"], p["biases"], out_spatial=target,
                    d_packed=True, h_packed=(layout == "dh"),
                    layout="dlast",
                    reduce=lambda t: softargmin(t[..., 0], axis=-1))
            if layout != "none":
                x = P.unpack_conv(x, spatial,
                                  packed_h=(layout == "dh"))
            x = conv3d_transpose(x, p["weights"], p["biases"],
                                 out_spatial=target, strides=(2, 2, 2))
            layout, spatial = "none", target
    return softargmin(x, axis=1)[..., 0]


def use_packed3d() -> bool:
    """Packed 3D stack: default ON on TPU, REDTAIL_TPU_PACKED3D=0/1
    overrides (tests force it on CPU for parity gates).

    Composed wins on a v5e (chained latency, bf16, random weights):
    NVSmall 53.2 -> 37.3 ms, NVTiny 4.45 -> 2.95 ms, ResNet-18 3D
    82.6 -> 57.7 ms."""
    import os
    if use_plain_lowering():
        return False
    v = os.environ.get("REDTAIL_TPU_PACKED3D")
    if v is not None:
        return v == "1"
    return jax.default_backend() == "tpu"


def _bneck_head(spec, params, d, conv1_act, full_hw):
    """ResNet18-2D head: feature concat + 2D bottleneck over the
    soft-argmax disparity map ``d`` (N, H', W', 1).

    Output is sigmoid-normalized disparity in [0, 1] at full resolution
    (multiply by W for pixels)."""
    x = jnp.concatenate([conv1_act, d.astype(conv1_act.dtype)], axis=-1)
    enc = params["bneck_encoder2D"]
    acts: Dict[str, jnp.ndarray] = {}
    for name, _out_ch, stride in spec.bneck_channels:
        x = _c2d(enc[name], x, stride=stride, act="elu")
        acts[name] = x
    return _bneck_decode(spec, params, x, acts, full_hw)


def _bneck_decode(spec, params, x, acts, full_hw):
    dec = params["bneck_decoder2D"]
    h_full, w_full = full_hw
    for name, _out_ch, skip in spec.bneck_dec:
        p = dec[name]
        target = acts[skip].shape[1:3] if skip is not None else (h_full, w_full)
        x = conv2d_transpose(x, p["weights"], p["biases"], out_spatial=target,
                             strides=(2, 2))
        if skip is not None:
            x = elu(x + acts[skip])
    return sigmoid(x)[..., 0]  # (N, H, W) in [0, 1]


def bneck_lead_count(spec: StereoSpec) -> int:
    """How many leading stride-1 bottleneck layers run H-packed.

    The packed chain must return to the 'aligned' parity convention
    (even count) and interior packed layers cannot serve decoder skips
    (skips are consumed unpacked).  Shared by the serving path
    (`_bneck_head_hpacked`) and the layer profiler so both always time
    the same network."""
    layers = list(spec.bneck_channels)
    n_lead = 0
    while n_lead < len(layers) and layers[n_lead][2] == 1:
        n_lead += 1
    n_lead -= n_lead % 2  # packed chain must return to 'aligned'
    skip_names = {s for _, _, s in spec.bneck_dec if s is not None}
    while n_lead > 0 and any(layers[i][0] in skip_names
                             for i in range(n_lead - 1)):
        n_lead -= 2  # interior packed layers cannot serve skips
    return n_lead


def _bneck_head_hpacked(spec, params, fl_p, fr_p, conv1_left_p, full_hw):
    """Correlation head consuming H-PACKED features end to end through
    its stride-1 prefix: packed corr volume (rows are independent in a
    per-pixel channel dot), per-parity-group soft-argmax, packed
    concat, and the leading stride-1 bottleneck convs at 2x lanes —
    ONE unpack where the stride-2 section begins (which is also the
    decoder's skip resolution, so skips stay unpacked)."""
    from redtail_tpu.ops import packed2d as P2

    h2 = -(-full_hw[0] // 2)
    vol_p = P2.corr_cost_volume_hpacked(fl_p, fr_p, spec.max_disp)
    d_p = P2.softargmax_hpacked(vol_p, h2).astype(conv1_left_p.dtype)
    f = conv1_left_p.shape[-1] // 2
    x = jnp.concatenate([conv1_left_p[..., :f], d_p[..., :1],
                         conv1_left_p[..., f:], d_p[..., 1:]], axis=-1)

    enc = params["bneck_encoder2D"]
    layers = list(spec.bneck_channels)
    n_lead = bneck_lead_count(spec)

    acts: Dict[str, jnp.ndarray] = {}
    for i in range(n_lead):
        name = layers[i][0]
        x = P2.conv2d_hpacked(x, enc[name]["weights"], enc[name]["biases"],
                              h=h2, in_shifted=(i % 2 == 1), act=elu)
    x = P2.unpack_h2d(x, h2)
    if n_lead:
        acts[layers[n_lead - 1][0]] = x
    for name, _out_ch, stride in layers[n_lead:]:
        x = _c2d(enc[name], x, stride=stride, act="elu")
        acts[name] = x
    return _bneck_decode(spec, params, x, acts, full_hw)


def stereo_forward(spec: StereoSpec, params: Params, left, right):
    """Run one stereo network: NHWC image pair (values in [0,1]) -> disparity.

    Returns (N, H, W): pixels for the 3D models, [0,1]-normalized for
    resnet18_2d (the reference multiplies by image width downstream).

    Inputs may also arrive **s2d-packed** from the ingest — shape
    (N, ceil(H/2), ceil(W/2), 12) per `ops.space_to_depth.space_to_depth2`
    with (H, W) = ``spec.input_hw`` — in which case conv1 runs as its
    exactly-equivalent 3x3 stride-1 form (~6x faster at c_in=3's 3/128
    MXU-lane fill; the pack itself rides the ingest where it is free).
    """
    if left.shape[-1] == 12:
        from redtail_tpu.ops.space_to_depth import s2d_hw
        full_hw = spec.input_hw
        if tuple(left.shape[1:3]) != s2d_hw(full_hw):
            raise ValueError(
                f"s2d-packed input {left.shape} does not match "
                f"spec.input_hw {spec.input_hw} (expected spatial "
                f"{s2d_hw(full_hw)})")
    else:
        full_hw = left.shape[1:3]
    fl, fr, conv1_act, h_packed = _encode_pair(spec, params, left, right)
    if spec.corr:
        if h_packed:
            return _bneck_head_hpacked(spec, params, fl, fr, conv1_act,
                                       full_hw)
        if use_pallas_cost_volume():
            # Experimental Pallas kernel producing (N, H, D, W); measured
            # slower than the XLA slices form in-context and compiles in
            # ~10 min via this environment's remote Mosaic service —
            # opt-in via REDTAIL_TPU_PALLAS_CV=1 (see kernels/__init__).
            from redtail_tpu.kernels import corr_cost_volume_pallas
            vol = corr_cost_volume_pallas(fl, fr, spec.max_disp)
            d = softargmax(vol, axis=2)[..., None]
        else:
            # Disparity-last slices volume: lane-axis soft-argmax, no
            # transposes; ~2x full-model latency vs a gather volume.
            vol = corr_cost_volume_dlast(fl, fr, spec.max_disp)
            d = softargmax(vol, axis=-1)[..., None]
        return _bneck_head(spec, params, d, conv1_act, full_hw)
    first = spec.enc3d[0]
    if first.stride == 1 and not use_plain_lowering():
        # Fused cost-volume + first conv3d: the (D, H, W, 2C) volume is
        # never materialized and the heaviest conv3d factors into a few
        # conv2d (exact; see ops/fused_cost_volume_conv.py).
        from redtail_tpu.ops.fused_cost_volume_conv import cost_volume_conv3d
        p1 = params["encoder3D"][first.name]
        if use_packed3d():
            first_packed = cost_volume_conv3d(
                fl, fr, p1["weights"], p1["biases"], spec.max_disp,
                act=elu, emit="dh_shifted")
            vol_spatial = (spec.max_disp,) + tuple(fl.shape[1:3])
            return _volume_head_packed(spec, params, full_hw,
                                       first_packed=first_packed,
                                       vol_spatial=vol_spatial)
        first_act = elu(cost_volume_conv3d(
            fl, fr, p1["weights"], p1["biases"], spec.max_disp))
        return _volume_head(spec, params, None, full_hw,
                            first_act=first_act)
    vol = cost_volume(fl, fr, spec.max_disp)
    return _volume_head(spec, params, vol, full_hw)


def use_pallas_cost_volume() -> bool:
    import os
    return os.environ.get("REDTAIL_TPU_PALLAS_CV", "0") == "1" and \
        jax.default_backend() == "tpu"


# ------------------------------------------------------------- params


def load_stereo_params(checkpoint_prefix, dtype=None) -> Params:
    """Load a TF checkpoint (e.g. the shipped
    `stereoDNN/models/NVTiny/TensorFlow/model-inference-513x161-0`) into the
    nested param dict. Pure-Python reader — no TensorFlow required."""
    from redtail_tpu.io.tf_checkpoint import load_checkpoint

    flat = load_checkpoint(checkpoint_prefix)
    params: Params = {}
    for name, arr in flat.items():
        parts = name.split("/")
        if parts[0] == "model":
            parts = parts[1:]
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if dtype is not None:
            arr = arr.astype(dtype)
        node[parts[-1]] = jnp.asarray(arr)
    return params


def params_from_npz(path_or_npz, dtype=None) -> Params:
    """Load params from an .npz bundle.

    Accepts both key conventions: `model|scope|layer|var` (the
    golden-bundle format of `tools/make_golden_e2e.py`; a 'disp' entry,
    if present, is the bundled golden disparity and is skipped) and the
    `scope/layer/var` convention of `utils/checkpoint.save_params` —
    so checkpoints written by the native trainer (`apps/train_app.py`)
    serve directly via `stereo_app --weights`. bf16 leaves stored as
    `@bf16` uint16 views are decoded."""
    from redtail_tpu.utils.checkpoint import _decode_npz

    npz = (np.load(path_or_npz) if isinstance(path_or_npz, (str, Path))
           else path_or_npz)
    flat = _decode_npz({k: npz[k] for k in npz.files})
    if any(k.startswith("params/") for k in flat):
        # full train-state checkpoint (training/stereo.save_train_state):
        # serve the params subtree, ignore optimizer moments + step
        flat = {k[len("params/"):]: v for k, v in flat.items()
                if k.startswith("params/")}
    sep = "|" if any("|" in k for k in flat) else "/"
    params: Params = {}
    for key, arr in flat.items():
        if key == "disp":
            continue
        parts = key.split(sep)
        if parts[0] == "model":
            parts = parts[1:]
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if dtype is not None:
            arr = arr.astype(dtype)
        node[parts[-1]] = jnp.asarray(arr)
    return params


def _spec_layer_shapes(spec: StereoSpec):
    """(path, kernel_shape_rsck_or_vrsck, bias_shape) for every layer —
    the shape table the reference carried in its generated C++."""
    out = []
    if spec.encoder2d == "plain":
        chans = spec.enc2d_channels
        in_ch = 3
        for i, c in enumerate(chans, start=1):
            k = 5 if i == 1 else 3
            out.append((f"encoder2D/conv{i}", (k, k, in_ch, c), (c,)))
            in_ch = c
        cv_ch = 2 * chans[-1]
    else:
        f = spec.enc2d_channels[0]
        out.append(("encoder2D/conv1", (5, 5, 3, f), (f,)))
        for i in range(1, 9):
            out.append((f"encoder2D/resblock{i}/res_conv1", (3, 3, f, f), (f,)))
            out.append((f"encoder2D/resblock{i}/res_conv2", (3, 3, f, f), (f,)))
        out.append(("encoder2D/encoder2D_out", (3, 3, f, f), (f,)))
        cv_ch = 2 * f
    in_ch = 1 + spec.enc2d_channels[0] if spec.corr else cv_ch
    for layer in spec.enc3d:
        out.append((f"encoder3D/{layer.name}",
                    (3, 3, 3, in_ch, layer.out_ch), (layer.out_ch,)))
        in_ch = layer.out_ch
    for name, out_ch, _skip in spec.dec3d:
        # VRSCK for transpose: C = transpose output channels, K = input.
        out.append((f"decoder3D/{name}", (3, 3, 3, out_ch, in_ch), (out_ch,)))
        in_ch = out_ch
    if spec.bneck_channels:
        in_ch = 1 + spec.enc2d_channels[0]  # softargmax + conv1 features
        for name, out_ch, _stride in spec.bneck_channels:
            out.append((f"bneck_encoder2D/{name}",
                        (3, 3, in_ch, out_ch), (out_ch,)))
            in_ch = out_ch
        for name, out_ch, _skip in spec.bneck_dec:
            out.append((f"bneck_decoder2D/{name}",
                        (3, 3, out_ch, in_ch), (out_ch,)))
            in_ch = out_ch
    return out


def init_stereo_params(spec: StereoSpec, key=None, dtype=jnp.float32) -> Params:
    """He-init random params with the spec's exact shapes (for the two
    models whose shipped checkpoints lack the data files)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    params: Params = {}
    for path, kshape, bshape in _spec_layer_shapes(spec):
        key, sub = jax.random.split(key)
        fan_in = int(np.prod(kshape[:-1]))
        w = jax.random.normal(sub, kshape, dtype) * math.sqrt(2.0 / fan_in)
        node = params
        for p in path.split("/")[:-1]:
            node = node.setdefault(p, {})
        node[path.split("/")[-1]] = {
            "weights": w, "biases": jnp.zeros(bshape, dtype)}
    return params


_TRT_2D_PREFIXES = ("conv2D", "deconv2D")


def params_from_trt_blob(spec: StereoSpec, blob: Dict[str, np.ndarray],
                         dtype=None) -> Params:
    """Reconstruct the nested params from a TRT-format weight blob
    (`read_trt_weights`). The blob stores flat KCRS/KVCRS arrays without
    shapes (`tensorrt_model_builder.py:52-60`); shapes come from the spec.

    This is the only weight path for NVSmall, whose TF checkpoint shipped
    without data files (only the fp16 TRT blob survives).
    """
    params: Params = {}

    def put(path, w, b):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if dtype is not None:
            w = w.astype(dtype)
            b = b.astype(dtype)
        node[parts[-1]] = {"weights": jnp.asarray(w), "biases": jnp.asarray(b)}

    for path, kshape, bshape in _spec_layer_shapes(spec):
        layer = path.split("/", 1)[1].replace("/", "_")
        if path.startswith("encoder2D"):
            blob_name = "left_" + layer  # siamese: left == right
        else:
            blob_name = layer
        wk = blob[blob_name + "_k"]
        wb = blob[blob_name + "_b"]
        if len(kshape) == 4:  # KCRS -> RSCK
            r, s, c, k = kshape
            w = wk.reshape(k, c, r, s).transpose(2, 3, 1, 0)
        else:  # KVCRS -> VRSCK; transpose convs store K=input ch
            v, r, s, c, k = kshape
            w = wk.reshape(k, v, c, r, s).transpose(1, 3, 4, 2, 0)
        assert wb.shape == bshape or wb.size == int(np.prod(bshape))
        put(path, w, wb.reshape(bshape))
    return params

"""ctypes bindings for the native host runtime (`native/redtail_native.cpp`).

Build with `python -m redtail_tpu.native build` (cmake + ninja/make). All
callers degrade gracefully to the numpy/cv2 paths when the library isn't
built — `available()` reports which is active.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_BUILD_DIR = _NATIVE_DIR / "build"
_LIB_NAMES = ["libredtail_native.so", "redtail_native.so"]

_lib: Optional[ctypes.CDLL] = None


def _find_lib() -> Optional[Path]:
    for base in (_BUILD_DIR, _NATIVE_DIR):
        for name in _LIB_NAMES:
            p = base / name
            if p.exists():
                return p
    return None


def build(verbose: bool = False) -> Path:
    """Compile the native library (cmake; falls back to direct g++)."""
    _BUILD_DIR.mkdir(exist_ok=True)
    try:
        subprocess.run(["cmake", "-S", str(_NATIVE_DIR), "-B",
                        str(_BUILD_DIR), "-DCMAKE_BUILD_TYPE=Release"],
                       check=True, capture_output=not verbose)
        subprocess.run(["cmake", "--build", str(_BUILD_DIR), "-j"],
                       check=True, capture_output=not verbose)
    except (subprocess.CalledProcessError, FileNotFoundError):
        out = _BUILD_DIR / "libredtail_native.so"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
             "-fPIC", str(_NATIVE_DIR / "redtail_native.cpp"), "-o",
             str(out)], check=True, capture_output=not verbose)
    path = _find_lib()
    assert path is not None, "native build produced no library"
    return path


def load(auto_build: bool = False) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = _find_lib()
    if path is None and auto_build:
        try:
            path = build()
        except Exception:
            return None
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.rn_preprocess_bilinear.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float]
    lib.rn_preprocess_area.argtypes = lib.rn_preprocess_bilinear.argtypes
    lib.rn_hwc_to_chw.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, f32p]
    lib.rn_pack_s2d.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, u8p, ctypes.c_int]
    lib.rn_mailbox_create.restype = ctypes.c_void_p
    lib.rn_mailbox_create.argtypes = [ctypes.c_size_t]
    lib.rn_mailbox_destroy.argtypes = [ctypes.c_void_p]
    lib.rn_mailbox_publish.restype = ctypes.c_uint64
    lib.rn_mailbox_publish.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rn_mailbox_take.restype = ctypes.c_uint64
    lib.rn_mailbox_take.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_uint64]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


# ------------------------------------------------------------ wrappers


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def preprocess_bilinear(img_u8: np.ndarray, dst_hw, *, swap_rb=True,
                        scale=1.0 / 255.0, shift=0.0) -> np.ndarray:
    lib = load()
    assert lib is not None, "native library not built"
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, c = img_u8.shape
    dh, dw = dst_hw
    out = np.empty((dh, dw, c), np.float32)
    lib.rn_preprocess_bilinear(_u8p(img_u8), h, w, c, _f32p(out), dh, dw,
                               int(swap_rb), scale, shift)
    return out


def preprocess_area(img_u8: np.ndarray, dst_hw, *, swap_rb=True,
                    scale=1.0 / 255.0, shift=0.0) -> np.ndarray:
    lib = load()
    assert lib is not None, "native library not built"
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, c = img_u8.shape
    dh, dw = dst_hw
    out = np.empty((dh, dw, c), np.float32)
    lib.rn_preprocess_area(_u8p(img_u8), h, w, c, _f32p(out), dh, dw,
                           int(swap_rb), scale, shift)
    return out


def pack_s2d(x_u8: np.ndarray, *, swap_rb: bool = True) -> np.ndarray:
    """Fused serving-ingest pack: u8 (..., H, W, C) frames -> u8
    space-to-depth(2) packed (..., ceil(H/2), ceil(W/2), 4C), optional
    BGR->RGB swap. Uses the native single-pass kernel when built
    (0.77 vs 8.2 ms/eye at flagship size — ~10x the numpy strided-slice
    path), else falls back to
    `ops.space_to_depth.space_to_depth2_np` — bit-identical either way."""
    x_u8 = np.asarray(x_u8)
    lib = load()
    # The native kernel supports c<=16 (camera frames are 1/3/4-channel)
    # and returns WITHOUT writing dst beyond that — route wide-channel
    # inputs to numpy rather than returning uninitialized memory.
    if lib is None or x_u8.dtype != np.uint8 or x_u8.shape[-1] > 16:
        from redtail_tpu.ops.space_to_depth import space_to_depth2_np
        return space_to_depth2_np(x_u8[..., ::-1] if swap_rb else x_u8)
    lead = x_u8.shape[:-3]
    h, w, c = x_u8.shape[-3:]
    swap_native = swap_rb and c == 3
    if swap_rb and not swap_native:  # kernel swaps 3-channel only
        x_u8 = x_u8[..., ::-1]
    frames = np.ascontiguousarray(x_u8).reshape((-1, h, w, c))
    hp, wp = -(-h // 2), -(-w // 2)
    out = np.empty((frames.shape[0], hp, wp, 4 * c), np.uint8)
    for i in range(frames.shape[0]):
        lib.rn_pack_s2d(_u8p(frames[i]), h, w, c, _u8p(out[i]),
                        int(swap_native))
    return out.reshape(lead + (hp, wp, 4 * c))


def hwc_to_chw(img: np.ndarray) -> np.ndarray:
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty((c, h, w), np.float32)
    lib.rn_hwc_to_chw(_f32p(img), h, w, c, _f32p(out))
    return out


class NativeMailbox:
    """Lock-free SPSC latest-wins frame mailbox (native Topic core)."""

    def __init__(self, frame_shape, dtype=np.uint8):
        lib = load()
        assert lib is not None, "native library not built"
        self._lib = lib
        self.frame_shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        nbytes = int(np.prod(frame_shape)) * self.dtype.itemsize
        self._nbytes = nbytes
        self._mb = lib.rn_mailbox_create(nbytes)

    def publish(self, frame: np.ndarray) -> int:
        frame = np.ascontiguousarray(frame, self.dtype)
        assert frame.nbytes == self._nbytes
        return int(self._lib.rn_mailbox_publish(
            self._mb, frame.ctypes.data_as(ctypes.c_void_p)))

    def take(self, last_seq: int = 0):
        out = np.empty(self.frame_shape, self.dtype)
        seq = int(self._lib.rn_mailbox_take(
            self._mb, out.ctypes.data_as(ctypes.c_void_p), last_seq))
        if seq == 0:
            return None, last_seq
        return out, seq

    def __del__(self):
        if getattr(self, "_mb", None):
            self._lib.rn_mailbox_destroy(self._mb)
            self._mb = None


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build(verbose=True))
    else:
        print("available:", available())

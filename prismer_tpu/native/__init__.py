"""Native (C++) data-loader fast path.

Builds `_native_loader` (libjpeg decode + fused bilinear resize +
normalization, GIL-releasing) on first import via setuptools; falls back
cleanly when a toolchain/libjpeg is unavailable. Use `decode_jpeg_resize` /
`is_available()`; `data/loader.py` consumers treat it as an optional
accelerator over PIL."""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_mod = None
_tried = False


def _build() -> None:
    src = os.path.join(_DIR, "loader.cpp")
    out = os.path.join(_DIR, "_native_loader" +
                       (sysconfig.get_config_var("EXT_SUFFIX") or ".so"))
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", src, "-ljpeg", "-lpng", "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    try:
        _build()
        if _DIR not in sys.path:
            sys.path.insert(0, _DIR)
        import _native_loader  # noqa
        _mod = _native_loader
    except Exception:
        _mod = None
    return _mod


def is_available() -> bool:
    return _load() is not None


def decode_jpeg_resize(data: bytes, out_h: int, out_w: int,
                       mean: Tuple[float, float, float],
                       std: Tuple[float, float, float]) -> np.ndarray:
    """JPEG bytes -> normalized float32 (out_h, out_w, 3)."""
    mod = _load()
    if mod is None:
        raise RuntimeError("native loader unavailable")
    raw, shape = mod.decode_jpeg_resize(data, out_h, out_w, tuple(mean),
                                        tuple(std))
    return np.frombuffer(raw, np.float32).reshape(shape)


def decode_jpeg_shape(data: bytes) -> Tuple[int, int]:
    mod = _load()
    if mod is None:
        raise RuntimeError("native loader unavailable")
    return tuple(mod.decode_jpeg_shape(data))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w) grayscale or (h, w, 3) RGB array (palette
    expanded, 16-bit stripped, alpha dropped). Raises on exotic formats —
    callers fall back to PIL."""
    mod = _load()
    if mod is None:
        raise RuntimeError("native loader unavailable")
    raw, (h, w, ch) = mod.decode_png(data)
    arr = np.frombuffer(raw, np.uint8)
    return arr.reshape(h, w) if ch == 1 else arr.reshape(h, w, 3)

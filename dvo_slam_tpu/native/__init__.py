"""Native RGB-D ingest: C++ PNG decode + a threaded prefetcher.

The reference's host pipeline is C++ throughout (OpenCV imread + color
conversion, benchmark_slam.cpp:46-93); here the byte-level work lives in a
small C++ extension (ingest.cpp, libpng + CPython API, GIL released during
decode) compiled on demand, with a pure-Python cv2 fallback so the
framework stays importable anywhere.

``RgbdFramePrefetcher`` overlaps dataset IO/decode with device compute —
the ingest half of the pipeline parallelism the reference gets from its
ROS message queue.
"""

from __future__ import annotations

import concurrent.futures
import os
import subprocess
import sys
import sysconfig
from typing import Iterator, Optional, Tuple

import numpy as np

_ext = None
_build_error: Optional[str] = None


def _build_extension():
    """Compile ingest.cpp into a cached shared object (g++ + libpng)."""
    src_dir = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(src_dir, "ingest.cpp")
    out = os.path.join(src_dir, "_dvo_ingest.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        src,
        "-lpng",
        "-lz",
        "-o",
        out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _load():
    global _ext, _build_error
    if _ext is not None or _build_error is not None:
        return _ext
    try:
        so_path = _build_extension()
        import importlib.util

        spec = importlib.util.spec_from_file_location("_dvo_ingest", so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _ext = mod
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _build_error = f"{type(e).__name__}: {e}"
        _ext = None
    return _ext


def native_available() -> bool:
    return _load() is not None


def load_rgbd_native(
    rgb_path: str, depth_path: str, depth_scale: float = 5000.0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load one frame with the native decoder:
    (gray float32 0..255, depth float32 meters 0-invalid, valid bool)."""
    ext = _load()
    if ext is None:
        raise RuntimeError(f"native ingest unavailable: {_build_error}")
    with open(rgb_path, "rb") as f:
        gray_bytes, h, w = ext.decode_gray_u8(f.read())
    gray = np.frombuffer(gray_bytes, np.uint8).reshape(h, w).astype(np.float32)
    with open(depth_path, "rb") as f:
        depth_bytes, dh, dw = ext.decode_depth_u16(f.read())
    raw = np.frombuffer(depth_bytes, np.uint16).reshape(dh, dw)
    valid = raw > 0
    depth = np.where(valid, raw.astype(np.float32) / depth_scale, 0.0)
    return gray, depth, valid


def reduce_ingest_native(intensity_u8: np.ndarray, depth_u16: np.ndarray,
                         levels: int):
    """C++ twin of streaming.host_reduce_ingest: lossless u16 4^k-scaled
    2x2-mean intensity + subsampled depth, two worker threads, GIL
    released.  Returns (intensity_u16, depth_u16) or raises if the
    extension is unavailable / the shape is unsupported (callers fall
    back to the NumPy oracle)."""
    ext = _load()
    if ext is None:
        raise RuntimeError(f"native ingest unavailable: {_build_error}")
    iu = np.ascontiguousarray(intensity_u8, np.uint8)
    du = np.ascontiguousarray(depth_u16, np.uint16)
    t, h, w = iu.shape
    ib, db, ho, wo = ext.reduce_ingest(iu.data, du.data, t, h, w, int(levels))
    return (
        np.frombuffer(ib, np.uint16).reshape(t, ho, wo),
        np.frombuffer(db, np.uint16).reshape(t, ho, wo),
    )


def load_rgbd_raw(
    rgb_path: str, depth_path: str
) -> Tuple[np.ndarray, np.ndarray]:
    """Camera-native formats (u8 luma, u16 raw depth) for minimal
    host->device transfer; conversion happens on device
    (ops/pyramid.convert_raw_depth)."""
    ext = _load()
    if ext is None:
        raise RuntimeError(f"native ingest unavailable: {_build_error}")
    with open(rgb_path, "rb") as f:
        gray_bytes, h, w = ext.decode_gray_u8(f.read())
    with open(depth_path, "rb") as f:
        depth_bytes, dh, dw = ext.decode_depth_u16(f.read())
    return (
        np.frombuffer(gray_bytes, np.uint8).reshape(h, w),
        np.frombuffer(depth_bytes, np.uint16).reshape(dh, dw),
    )


class RgbdFramePrefetcher:
    """Read-ahead frame loader: decodes frames on a thread pool (the
    native decoder releases the GIL) while the device tracks."""

    def __init__(self, pairs, root: str = "", depth: int = 4, workers: int = 2,
                 raw: bool = False):
        """``pairs``: [(rgb_path, depth_path), ...] relative to ``root``."""
        self.pairs = [
            (os.path.join(root, r), os.path.join(root, d)) for r, d in pairs
        ]
        self.depth = depth
        self.raw = raw
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=workers)

    def _load(self, i: int):
        rgb, dep = self.pairs[i]
        if self.raw:
            return load_rgbd_raw(rgb, dep)
        return load_rgbd_native(rgb, dep)

    def __iter__(self) -> Iterator:
        futures = {}
        horizon = min(self.depth, len(self.pairs))
        for i in range(horizon):
            futures[i] = self._pool.submit(self._load, i)
        for i in range(len(self.pairs)):
            nxt = i + horizon
            if nxt < len(self.pairs):
                futures[nxt] = self._pool.submit(self._load, nxt)
            yield futures.pop(i).result()

    def close(self):
        self._pool.shutdown(wait=False)

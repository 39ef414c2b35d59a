"""ctypes binding for the native C++ image pipeline (native/image_pipe.cc).

JPEG decode + TargetPad/SquarePad + PIL-compatible bicubic resize + center
crop + CLIP normalization, all in one GIL-free native call — the framework's
data-loader hot path. Falls back to the PIL pipeline when the library isn't
built (``make -C native``); the PIL path stays the pixel-parity reference.
"""
from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libimagepipe.so"
_lib = None


def native_available() -> bool:
    return _LIB_PATH.exists()


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(_LIB_PATH))
        _lib.ip_process_jpeg.restype = ctypes.c_int
        _lib.ip_process_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_double,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib.ip_process_rgb.restype = ctypes.c_int
        _lib.ip_process_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        _lib.ip_process_jpeg_batch.restype = ctypes.c_int32
        _lib.ip_process_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32)]
    return _lib


def process_jpeg_bytes(data: bytes, dim: int = 384,
                       target_ratio: float = 1.25,
                       square_pad: bool = False) -> np.ndarray:
    """JPEG bytes -> normalized float32 [dim, dim, 3]. Raises on decode
    failure (mirrors the datasets' raise-by-default error policy)."""
    lib = _load()
    out = np.empty((dim, dim, 3), np.float32)
    rc = lib.ip_process_jpeg(
        data, len(data), dim, target_ratio, int(square_pad),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"native jpeg pipeline failed (code {rc})")
    return out


def process_rgb(rgb: np.ndarray, dim: int = 384, target_ratio: float = 1.25,
                square_pad: bool = False) -> np.ndarray:
    """uint8 RGB [H, W, 3] -> normalized float32 [dim, dim, 3]."""
    lib = _load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    out = np.empty((dim, dim, 3), np.float32)
    rc = lib.ip_process_rgb(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rgb.shape[1], rgb.shape[0], dim, target_ratio, int(square_pad),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"native rgb pipeline failed (code {rc})")
    return out


def process_jpeg_batch(datas: list[bytes], dim: int = 384,
                       target_ratio: float = 1.25,
                       square_pad: bool = False,
                       num_threads: int = 0) -> np.ndarray:
    """Decode + preprocess a batch of JPEG byte buffers with a NATIVE thread
    pool (one GIL-free call per batch). num_threads=0 uses all cores.
    Raises on any decode failure, naming the failing batch indices."""
    lib = _load()
    n = len(datas)
    out = np.empty((n, dim, dim, 3), np.float32)
    rcs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*datas)
    lens = (ctypes.c_int64 * n)(*[len(d) for d in datas])
    failures = lib.ip_process_jpeg_batch(
        arr, lens, n, dim, target_ratio, int(square_pad), num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if failures:
        bad = np.nonzero(rcs)[0].tolist()
        raise ValueError(f"native jpeg batch failed for indices {bad}")
    return out


def make_native_transform(kind: str = "targetpad", dim: int = 384,
                          target_ratio: float = 1.25):
    """Path/bytes -> tensor callable matching data.preprocessing.make_transform
    semantics, reading the file directly (no PIL decode)."""
    square = kind == "squarepad"

    def transform_path(path) -> np.ndarray:
        data = Path(path).read_bytes()
        return process_jpeg_bytes(data, dim, target_ratio, square)

    def batch_from_paths(paths) -> np.ndarray:
        datas = [Path(p).read_bytes() for p in paths]
        return process_jpeg_batch(datas, dim, target_ratio, square)

    transform_path.wants_path = True
    transform_path.batch_from_paths = batch_from_paths
    return transform_path

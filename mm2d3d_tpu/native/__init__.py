"""ctypes bindings for the C++ host ops (csrc/libmm2d3d_host.so).

Auto-builds the shared library on first use (g++ is baked into the image)
and degrades gracefully: `available()` is False when no toolchain exists and
callers fall back to the numpy/jax implementations.

The host ops mirror the device ops bit-for-bit (tested in
tests/test_native.py) so topology can be built on CPU — pipelined with
device compute — or on device, interchangeably.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_CSRC = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "csrc")
_LIB_PATH = osp.join(_CSRC, "libmm2d3d_host.so")
_lock = threading.Lock()
_lib = None
_build_failed = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not osp.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _CSRC], check=True, capture_output=True
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.bilinear_resize_u8.argtypes = [
            _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _f32p, ctypes.c_int, ctypes.c_int,
        ]
        lib.depth_label_maps.argtypes = [
            _i64p, _f32p, _i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _f32p, _i64p,
        ]
        lib.voxelize_dedup.restype = ctypes.c_int32
        lib.voxelize_dedup.argtypes = [
            _i32p, _i32p, _u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _i32p, _i32p, _i32p, _i32p,
        ]
        lib.build_nbr27.argtypes = [
            _i32p, _i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _i32p,
        ]
        lib.build_transition.argtypes = [
            _i32p, _i32p, ctypes.c_int32, ctypes.c_int32,
            _i32p, _i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _i32p, _i32p, _i32p,
        ]
        lib.build_slots_tiered.restype = ctypes.c_int64
        lib.build_slots_tiered.argtypes = [
            _i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def bilinear_resize(image_u8: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    lib = _load()
    assert lib is not None
    h, w = out_hw
    src = np.ascontiguousarray(image_u8, np.uint8)
    c = src.shape[2]
    dst = np.empty((h, w, c), np.float32)
    lib.bilinear_resize_u8(src, src.shape[0], src.shape[1], c, dst, h, w)
    return dst


def depth_label_maps(img_indices, depths, labels, hw):
    lib = _load()
    assert lib is not None
    h, w = hw
    depth_map = np.empty((h, w), np.float32)
    label_map = np.empty((h, w), np.int64)
    lib.depth_label_maps(
        np.ascontiguousarray(img_indices, np.int64),
        np.ascontiguousarray(depths, np.float32),
        np.ascontiguousarray(labels, np.int64),
        len(img_indices), h, w, depth_map, label_map,
    )
    return depth_map, label_map


def voxelize_dedup(coords, batch, valid, full_scale: int, capacity: int):
    """Returns (vox_coords, vox_batch, p2v, counts, num_voxels) — the host
    mirror of ops.voxelize.voxelize."""
    lib = _load()
    assert lib is not None
    n = len(coords)
    vox_coords = np.empty((capacity, 3), np.int32)
    vox_batch = np.empty((capacity,), np.int32)
    p2v = np.empty((n,), np.int32)
    counts = np.empty((capacity,), np.int32)
    nvox = lib.voxelize_dedup(
        np.ascontiguousarray(coords, np.int32),
        np.ascontiguousarray(batch, np.int32),
        np.ascontiguousarray(valid, np.uint8),
        n, full_scale, capacity, vox_coords, vox_batch, p2v, counts,
    )
    return vox_coords, vox_batch, p2v, counts, int(nvox)


def build_nbr27(vox_coords, vox_batch, num_voxels: int, capacity: int,
                full_scale: int):
    lib = _load()
    assert lib is not None
    nbr = np.empty((capacity, 27), np.int32)
    lib.build_nbr27(
        np.ascontiguousarray(vox_coords, np.int32),
        np.ascontiguousarray(vox_batch, np.int32),
        num_voxels, capacity, full_scale, nbr,
    )
    return nbr


def build_slots_tiered(nbr_rows, h1: int, h2: int, h_max: int,
                       vm_cap: int, vh_cap: int):
    """Host mirror of ops.hierarchy.build_slots_tiered.

    `nbr_rows` is (cap, 27) row-major (the transpose of the device's
    (27, V) table); outputs are device-layout tap-major tables.  The
    2-tier `build_slots_split` form is h2 == h_max with vh_cap == 0.
    Returns (src1, tap1, idxm, invm, srcm, tapm, idxh, srch, taph,
    dropped).
    """
    lib = _load()
    assert lib is not None
    nbr_rows = np.ascontiguousarray(nbr_rows, np.int32)
    cap = nbr_rows.shape[0]
    src1 = np.empty((h1, cap), np.int32)
    tap1 = np.empty((h1, cap), np.int32)
    idxm = np.empty((vm_cap,), np.int32)
    invm = np.empty((cap,), np.int32)
    srcm = np.empty((h2 - h1, vm_cap), np.int32)
    tapm = np.empty((h2 - h1, vm_cap), np.int32)
    idxh = np.empty((vh_cap,), np.int32)
    srch = np.empty((h_max - h2, vh_cap), np.int32)
    taph = np.empty((h_max - h2, vh_cap), np.int32)
    dropped = lib.build_slots_tiered(
        nbr_rows, cap, h1, h2, h_max, vm_cap, vh_cap,
        src1, tap1, idxm, invm, srcm, tapm, idxh, srch, taph,
    )
    return (src1, tap1, idxm, invm, srcm, tapm, idxh, srch, taph,
            np.int32(dropped))


def build_transition(fine_coords, fine_batch, nvox_f, cap_f,
                     coarse_coords, coarse_batch, nvox_c, cap_c,
                     full_scale_c: int):
    lib = _load()
    assert lib is not None
    parent = np.empty((cap_f,), np.int32)
    off_id = np.empty((cap_f,), np.int32)
    child = np.empty((cap_c, 8), np.int32)
    lib.build_transition(
        np.ascontiguousarray(fine_coords, np.int32),
        np.ascontiguousarray(fine_batch, np.int32),
        nvox_f, cap_f,
        np.ascontiguousarray(coarse_coords, np.int32),
        np.ascontiguousarray(coarse_batch, np.int32),
        nvox_c, cap_c, full_scale_c,
        parent, off_id, child,
    )
    return parent, off_id, child

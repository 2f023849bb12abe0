"""Native (C++) input-pipeline components via ctypes.

`write_sgrec` serializes per-image annotation records to the flat SGRC
binary format; `NativeBatchPacker` loads libsgc_pack.so (auto-building it
with g++ on first use) and packs padded batches with a C++ thread pool —
replacing the per-image Python work (lower-triangular -> directed grid
expansion is O(N^2) per image) on the host side of the input pipeline.
Falls back to the pure-Python loader when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "sgc_pack.cc")
_LIB = os.path.join(_THIS_DIR, "libsgc_pack.so")

MAGIC = 0x43524753


def write_sgrec(path: str, cats: np.ndarray, boxes: np.ndarray,
                super_mh: np.ndarray, relationships: Sequence[np.ndarray],
                subj_or_obj: Sequence[np.ndarray], depth: np.ndarray,
                feature_size: int = 32, num_super: int = 17,
                image: Optional[np.ndarray] = None) -> None:
    """Serializes one image's annotation to the SGRC binary format.

    With `image` (an (H, W, 3) uint8 raw RGB array) the record is
    written as v2, carrying the pixels the TRAINING path needs for the
    per-epoch contrastive view (the jittered square view is computed by
    the C++ packer at batch-assembly time, sgc_pack.cc)."""
    n = len(cats)
    rel_lower = np.concatenate(
        [np.asarray(r, np.int32) for r in relationships]) \
        if n > 1 else np.zeros(0, np.int32)
    dir_lower = np.concatenate(
        [np.asarray(d, np.float32) for d in subj_or_obj]) \
        if n > 1 else np.zeros(0, np.float32)
    assert len(rel_lower) == n * (n - 1) // 2, \
        f"rel_lower has {len(rel_lower)} entries, want {n*(n-1)//2}"
    assert len(dir_lower) == n * (n - 1) // 2, \
        f"dir_lower has {len(dir_lower)} entries, want {n*(n-1)//2}"
    depth_flat = np.asarray(depth, np.float32).reshape(-1)
    assert depth_flat.size == feature_size * feature_size, \
        f"depth has {depth_flat.size} values, want {feature_size}^2" \
        f" — a short write would misalign every following field"
    version = 1 if image is None else 2
    header = np.asarray([MAGIC, version, n, feature_size, num_super],
                        np.int32)
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(depth_flat.tobytes())
        f.write(np.asarray(cats, np.int32).tobytes())
        f.write(np.asarray(boxes, np.float32).reshape(n, 4).tobytes())
        f.write(np.asarray(super_mh, np.uint8).reshape(n,
                                                       num_super).tobytes())
        f.write(rel_lower.tobytes())
        f.write(dir_lower.tobytes())
        if image is not None:
            img = np.ascontiguousarray(image)
            assert img.dtype == np.uint8 and img.ndim == 3 \
                and img.shape[2] == 3, \
                f"image must be (H, W, 3) uint8, got {img.dtype} " \
                f"{img.shape}"
            f.write(np.asarray(img.shape[:2], np.int32).tobytes())
            f.write(img.tobytes())


def build_library(force: bool = False) -> Optional[str]:
    """Compiles libsgc_pack.so with g++.  The cache is mtime-checked so
    editing sgc_pack.cc takes effect on the next run (a stale .so would
    silently keep running the old code)."""
    if (os.path.exists(_LIB) and not force
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB], check=True, capture_output=True)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


class NativeBatchPacker:
    """ctypes wrapper over sgc_pack_batch."""

    def __init__(self, max_objects: int = 20, feature_size: int = 32,
                 num_super: int = 17, num_threads: int = 8):
        lib_path = build_library()
        if lib_path is None:
            raise RuntimeError("could not build libsgc_pack.so (g++)")
        self.lib = ctypes.CDLL(lib_path)
        self.lib.sgc_pack_batch.restype = ctypes.c_int
        self.lib.sgc_pack_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        self.lib.sgc_pack_train_batch.restype = ctypes.c_int
        self.lib.sgc_pack_train_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        self.n = max_objects
        self.s = feature_size
        self.k = num_super
        self.num_threads = num_threads

    def pack(self, paths: Sequence[str]) -> Dict[str, np.ndarray]:
        b, n, s, k = len(paths), self.n, self.s, self.k
        cats = np.zeros((b, n), np.int32)
        boxes = np.zeros((b, n, 4), np.float32)
        rel = np.zeros((b, n, n), np.int32)
        valid = np.zeros((b, n), np.uint8)
        super_mh = np.zeros((b, n, k), np.float32)
        depth = np.zeros((b, s, s), np.float32)
        ok = np.zeros(b, np.uint8)
        c_paths = (ctypes.c_char_p * b)(
            *[p.encode() for p in paths])

        def ptr(a, t):
            return a.ctypes.data_as(ctypes.POINTER(t))

        packed = self.lib.sgc_pack_batch(
            c_paths, b, n, s, k,
            ptr(cats, ctypes.c_int32), ptr(boxes, ctypes.c_float),
            ptr(rel, ctypes.c_int32), ptr(valid, ctypes.c_uint8),
            ptr(super_mh, ctypes.c_float), ptr(depth, ctypes.c_float),
            ptr(ok, ctypes.c_uint8), self.num_threads)
        if packed < 0:
            raise RuntimeError("sgc_pack_batch failed")
        return {"cats": cats, "boxes": boxes, "rel": rel,
                "valid": valid.astype(bool), "super_mh": super_mh,
                "depth": depth[..., None], "ok": ok.astype(bool),
                "num_packed": packed}

    def pack_train(self, paths: Sequence[str], jitter: np.ndarray,
                   image_size: int,
                   want_plain: bool = False) -> Dict[str, np.ndarray]:
        """Training batch from v2 records: the v1 annotation payload plus
        the jittered contrastive square view ('image_aug'; and the plain
        square view 'image' when want_plain — skip it when features come
        from the cache).  `jitter` is the (B, 9) float32 matrix of
        [apply, order[4], factors[4]] rows from
        data.dataset.color_jitter_params."""
        b, n, s, k = len(paths), self.n, self.s, self.k
        jitter = np.ascontiguousarray(jitter, np.float32)
        assert jitter.shape == (b, 9), jitter.shape
        cats = np.zeros((b, n), np.int32)
        boxes = np.zeros((b, n, 4), np.float32)
        rel = np.zeros((b, n, n), np.int32)
        valid = np.zeros((b, n), np.uint8)
        super_mh = np.zeros((b, n, k), np.float32)
        depth = np.zeros((b, s, s), np.float32)
        aug = np.zeros((b, image_size, image_size, 3), np.float32)
        plain = (np.zeros((b, image_size, image_size, 3), np.float32)
                 if want_plain else None)
        ok = np.zeros(b, np.uint8)
        c_paths = (ctypes.c_char_p * b)(*[p.encode() for p in paths])

        def ptr(a, t):
            return a.ctypes.data_as(ctypes.POINTER(t))

        packed = self.lib.sgc_pack_train_batch(
            c_paths, b, n, s, k, image_size,
            ptr(jitter, ctypes.c_float),
            ptr(cats, ctypes.c_int32), ptr(boxes, ctypes.c_float),
            ptr(rel, ctypes.c_int32), ptr(valid, ctypes.c_uint8),
            ptr(super_mh, ctypes.c_float), ptr(depth, ctypes.c_float),
            ptr(aug, ctypes.c_float),
            ptr(plain, ctypes.c_float) if plain is not None
            else ctypes.cast(None, ctypes.POINTER(ctypes.c_float)),
            ptr(ok, ctypes.c_uint8), self.num_threads)
        if packed < 0:
            raise RuntimeError("sgc_pack_train_batch failed")
        out = {"cats": cats, "boxes": boxes, "rel": rel,
               "valid": valid.astype(bool), "super_mh": super_mh,
               "depth": depth[..., None], "image_aug": aug,
               "ok": ok.astype(bool), "num_packed": packed}
        if plain is not None:
            out["image"] = plain
        return out

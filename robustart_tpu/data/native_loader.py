"""ctypes bindings for the C++ native data loader (native/loader.cpp).

The DALI-replacement fast path (SURVEY.md §2.10): JPEG decode + resize +
center-crop run in a C++ thread pool off the GIL, producing fixed-shape
uint8 NHWC batches. Enabled via ``data.use_native_loader: True`` (accepted
alongside the reference's ``use_dali`` key) for meta-file JPEG datasets with
the ONECROP eval transform; everything else falls back to the Python loader.

The shared library is built on demand with ``make -C native`` (g++ + libjpeg,
both baked into this image).
"""

from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
from typing import Iterator

import numpy as np

from robustart_tpu.core.logging import get_logger
from robustart_tpu.data.loader import Batch

logger = get_logger(__name__)

_NATIVE_DIR = osp.join(
    osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "native"
)
_LIB_PATH = osp.join(_NATIVE_DIR, "librobustart_loader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH):
        logger.info("building native loader: make -C %s", _NATIVE_DIR)
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rl_create.restype = ctypes.c_void_p
    lib.rl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.rl_next_batch.restype = ctypes.c_int
    lib.rl_next_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rl_destroy.restype = None
    lib.rl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception as exc:  # pragma: no cover - toolchain issues
        logger.warning("native loader unavailable: %s", exc)
        return False


class NativeDataLoader:
    """Iterator of Batch dicts backed by the C++ decode pool.

    Yields the same Batch protocol as robustart_tpu.data.loader.DataLoader
    (image/label/index/mask with static shapes).
    """

    def __init__(
        self,
        paths: list[str],
        labels: np.ndarray,
        indices: np.ndarray,
        batch_size: int,
        input_size: int = 224,
        test_resize: int = 256,
        mode: str = "onecrop",
        num_threads: int = 8,
        queue_cap: int = 4,
        dct_scale: bool = False,
    ):
        # dct_scale: libjpeg DCT-domain scaled decode (the DALI-style fast
        # path) — decodes at the largest M/8 downscale that still covers the
        # resize target; ~2x less IDCT + resize work per image, output within
        # a few grey levels of the exact decode (tests/test_native_loader.py)
        self.paths = [paths[i] for i in indices]
        self.labels = np.asarray(labels)[indices].astype(np.int32)
        self.indices = np.asarray(indices, np.int32)
        self.batch_size = batch_size
        self.input_size = input_size
        self.test_resize = test_resize
        self.mode = {"plain": 0, "onecrop": 1}[mode]
        self.num_threads = num_threads
        self.queue_cap = queue_cap
        self.dct_scale = 1 if dct_scale else 0

    def __len__(self) -> int:
        return (len(self.paths) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Batch]:
        lib = _load_lib()
        n = len(self.paths)
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in self.paths]
        )
        c_labels = self.labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        handle = lib.rl_create(
            c_paths, c_labels, n, self.input_size, self.input_size,
            self.batch_size, self.test_resize, self.mode, self.num_threads,
            self.queue_cap, self.dct_scale,
        )
        img = np.empty(
            (self.batch_size, self.input_size, self.input_size, 3), np.uint8
        )
        lab = np.empty((self.batch_size,), np.int32)
        idx = np.empty((self.batch_size,), np.int32)
        try:
            while True:
                count = lib.rl_next_batch(
                    handle,
                    img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                )
                if count == 0:
                    return
                mask = np.zeros((self.batch_size,), bool)
                mask[:count] = True
                # local positions → original dataset indices
                clipped = np.clip(idx, 0, len(self.indices) - 1)
                global_idx = np.where(idx >= 0, np.take(self.indices, clipped), -1)
                yield Batch(
                    image=img.copy(),
                    label=lab.copy(),
                    index=global_idx.astype(np.int32),
                    mask=mask,
                )
        finally:
            lib.rl_destroy(handle)

"""ctypes binding for the native C++ shard loader (native/vfloader.cpp).

Drop-in replacement for the raw-decode stage of the Python pipeline
(tar streaming + PNG decode happen in C++ worker threads, off the GIL);
per-sample processing (process_sample) stays in numpy.  Used
automatically by ``create_nmr_stream(..., native=True)`` when the shared
library has been built (native/build.sh).
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, List, Tuple

import numpy as np

__all__ = ["NativeShardReader", "native_available", "lib_path"]

_LIB = None


def lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "native",
        "libvfloader.so",
    )


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = lib_path()
    lib = ctypes.CDLL(path)
    lib.vf_loader_open.restype = ctypes.c_void_p
    lib.vf_loader_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.vf_loader_next.restype = ctypes.c_int
    lib.vf_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.vf_loader_release.argtypes = [ctypes.c_void_p]
    lib.vf_loader_decode_errors.restype = ctypes.c_long
    lib.vf_loader_decode_errors.argtypes = [ctypes.c_void_p]
    lib.vf_loader_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


_BUILD_ATTEMPTED = False


def _try_build() -> bool:
    """Build libvfloader.so from source if a toolchain is present.

    The .so is a build artifact (not committed); a fresh checkout on a
    machine with g++ self-heals here so the native path is active
    without a manual native/build.sh step.  Attempted AT MOST ONCE per
    process — a failing toolchain must not re-stall every stream
    construction (the trainer builds a fresh val stream per eval).

    Concurrency-safe: the compile is serialized across processes with an
    fcntl lock file, and build.sh compiles to a temp name + renames, so
    a concurrent reader never dlopens a half-written library.  Set
    ``VF_NATIVE_AUTOBUILD=0`` to disable the implicit compile entirely
    (run native/build.sh manually instead)."""
    global _BUILD_ATTEMPTED
    if _BUILD_ATTEMPTED:
        return os.path.exists(lib_path())
    _BUILD_ATTEMPTED = True
    if os.environ.get("VF_NATIVE_AUTOBUILD", "1") in ("0", "false", ""):
        return False
    src_dir = os.path.dirname(lib_path())
    script = os.path.join(src_dir, "build.sh")
    if not os.path.exists(os.path.join(src_dir, "vfloader.cpp")):
        return False
    import fcntl
    import subprocess

    try:
        with open(os.path.join(src_dir, ".build.lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)  # released on close
            if os.path.exists(lib_path()):
                return True  # another process built it while we waited
            subprocess.run(
                ["bash", script], capture_output=True, timeout=120,
                check=True,
            )
        return os.path.exists(lib_path())
    except Exception:
        return False


def native_available() -> bool:
    if not os.path.exists(lib_path()) and not _try_build():
        return False
    try:
        _load_lib()
        return True
    except OSError:
        return False


class NativeShardReader:
    """Iterates (views_uint8_NHWC (V, H, W, 3), key) decoded by C++
    threads.  Raises FileNotFoundError up-front for missing shards and
    RuntimeError if the stream produces no readable samples.

    Sample ORDER is thread-completion order and therefore not
    reproducible across runs (same trade as a multi-worker torch
    dataloader); the downstream shuffle buffer makes the stream
    statistically equivalent either way.  Tests that compare loss
    trajectories across two runs must set tpu.native_loader: false
    to get the sequential (deterministic) Python reader."""

    def __init__(self, urls: List[str], total_views: int = 24,
                 n_threads: int = 4, resample: bool = True, seed: int = 0,
                 capacity: int = 64):
        missing = [u for u in urls if not os.path.exists(u)]
        if missing:
            raise FileNotFoundError(f"missing shard(s): {missing}")
        self._lib = _load_lib()
        arr = (ctypes.c_char_p * len(urls))(
            *[u.encode() for u in urls]
        )
        self._handle = self._lib.vf_loader_open(
            arr, len(urls), n_threads, total_views, int(resample),
            seed, capacity,
        )
        if not self._handle:
            raise RuntimeError(
                "vf_loader_open failed (empty shard list?)"
            )
        self._closed = False

    def __iter__(self) -> Iterator[Tuple[np.ndarray, str]]:
        data_p = ctypes.POINTER(ctypes.c_uint8)()
        views = ctypes.c_int()
        h = ctypes.c_int()
        w = ctypes.c_int()
        key = ctypes.create_string_buffer(512)
        token = ctypes.c_void_p()
        yielded = 0
        while True:
            if self._closed:
                raise RuntimeError("NativeShardReader is closed")
            rc = self._lib.vf_loader_next(
                self._handle, ctypes.byref(data_p), ctypes.byref(views),
                ctypes.byref(h), ctypes.byref(w), key, len(key),
                ctypes.byref(token),
            )
            if rc <= 0:
                if rc < 0 or (yielded == 0 and self.decode_errors > 0):
                    raise RuntimeError(
                        "native loader produced no readable samples "
                        f"({self.decode_errors} shard/decode errors)"
                    )
                return
            n = views.value * h.value * w.value * 3
            buf = np.ctypeslib.as_array(data_p, shape=(n,))
            out = buf.copy().reshape(views.value, h.value, w.value, 3)
            self._lib.vf_loader_release(token)
            yielded += 1
            yield out, key.value.decode()

    @property
    def decode_errors(self) -> int:
        return int(self._lib.vf_loader_decode_errors(self._handle))

    def close(self) -> None:
        if not self._closed:
            self._lib.vf_loader_close(self._handle)
            self._closed = True

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

"""ctypes bindings for the native RT runtime (native/librt_runtime.so).

The native side provides what the reference gets from XCM/Xenomai + MatLogger
(SURVEY.md C17, C20, C22): absolute-deadline pacing with latency accounting,
and a wait-free SPSC trace ring so the control thread never blocks on IO.
Builds on demand with ``make -C native`` (g++ is in the image; pybind11 is
not, hence the C ABI + ctypes).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "librt_runtime.so")

_TICK_CB = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int64, ctypes.c_double,
                            ctypes.c_void_p)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.rt_executor_create.restype = ctypes.c_void_p
    lib.rt_executor_create.argtypes = [ctypes.c_int64]
    lib.rt_executor_destroy.argtypes = [ctypes.c_void_p]
    lib.rt_executor_run.restype = ctypes.c_int64
    lib.rt_executor_run.argtypes = [ctypes.c_void_p, _TICK_CB,
                                    ctypes.c_int64, ctypes.c_void_p]
    lib.rt_executor_stats.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64)]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_uint64]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ring_push.restype = ctypes.c_int
    lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                              ctypes.POINTER(ctypes.c_float), ctypes.c_uint32]
    lib.ring_pop.restype = ctypes.c_int
    lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
                             ctypes.POINTER(ctypes.c_float), ctypes.c_uint32]
    lib.ring_dropped.restype = ctypes.c_uint64
    lib.ring_dropped.argtypes = [ctypes.c_void_p]
    lib.shm_channel_create.restype = ctypes.c_void_p
    lib.shm_channel_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
    lib.shm_channel_open.restype = ctypes.c_void_p
    lib.shm_channel_open.argtypes = [ctypes.c_char_p]
    lib.shm_channel_size.restype = ctypes.c_uint32
    lib.shm_channel_size.argtypes = [ctypes.c_void_p]
    lib.shm_channel_write.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_uint32]
    lib.shm_channel_read.restype = ctypes.c_int64
    lib.shm_channel_read.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_uint32]
    lib.shm_channel_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeExecutor:
    """Paced periodic executor (the Xenomai-thread analog)."""

    def __init__(self, period_s: float = 1e-3):
        self._lib = _load()
        self._h = self._lib.rt_executor_create(int(period_s * 1e9))

    def run(self, callback: Callable[[int, float], bool], n_ticks: int) -> int:
        """callback(tick, t_s) -> keep_running. Returns ticks completed."""
        def _cb(tick, t_s, _user):
            try:
                return 0 if callback(tick, t_s) else 1
            except Exception:
                return 1
        cb = _TICK_CB(_cb)
        return self._lib.rt_executor_run(self._h, cb, n_ticks, None)

    def stats(self):
        p50 = ctypes.c_double()
        p99 = ctypes.c_double()
        mean = ctypes.c_double()
        misses = ctypes.c_int64()
        self._lib.rt_executor_stats(self._h, ctypes.byref(p50),
                                    ctypes.byref(p99), ctypes.byref(mean),
                                    ctypes.byref(misses))
        return dict(p50_s=p50.value, p99_s=p99.value, mean_s=mean.value,
                    deadline_misses=misses.value)

    def __del__(self):
        try:
            self._lib.rt_executor_destroy(self._h)
        except Exception:
            pass


class NativeTraceRing:
    """Wait-free SPSC trace channel (MatLogger's RT-safe core, natively)."""

    def __init__(self, capacity_bytes: int = 1 << 22):
        self._lib = _load()
        self._h = self._lib.ring_create(capacity_bytes)

    def push(self, channel: int, data) -> bool:
        arr = np.ascontiguousarray(np.asarray(data, np.float32).ravel())
        ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return self._lib.ring_push(self._h, channel, ptr, arr.size) == 0

    def pop(self, max_floats: int = 4096):
        ch = ctypes.c_uint32()
        out = np.empty(max_floats, np.float32)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        n = self._lib.ring_pop(self._h, ctypes.byref(ch), ptr, max_floats)
        if n < 0:
            return None
        return int(ch.value), out[:n].copy()

    @property
    def dropped(self) -> int:
        return int(self._lib.ring_dropped(self._h))

    def __del__(self):
        try:
            self._lib.ring_destroy(self._h)
        except Exception:
            pass


class NativeSharedObject:
    """Cross-process typed float channel over POSIX shared memory — the
    native analog of XBot's SharedObject/SharedMemory
    (/root/reference/src/ForceAcc.cpp:52-55: a simulator process publishes
    floating-base pos/vel; the RT controller reads them). Seqlock protocol:
    single writer, any readers, wait-free writes, readers retry torn reads.

    >>> pub = NativeSharedObject("/qppvm_fb_pos", size=3, create=True)
    >>> sub = NativeSharedObject("/qppvm_fb_pos")        # another process
    >>> pub.write([0.0, 0.0, 0.9]); sub.read()
    """

    def __init__(self, name: str, size: Optional[int] = None,
                 create: bool = False):
        self._lib = _load()
        if create:
            if size is None:
                raise ValueError("size required when create=True")
            self._h = self._lib.shm_channel_create(name.encode(), size)
        else:
            self._h = self._lib.shm_channel_open(name.encode())
        if not self._h:
            raise OSError(f"shm channel {name!r} unavailable")
        self.name = name
        self.size = int(self._lib.shm_channel_size(self._h))

    def write(self, data) -> None:
        arr = np.ascontiguousarray(np.asarray(data, np.float32).ravel())
        ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self._lib.shm_channel_write(self._h, ptr, arr.size)

    def read(self):
        """Returns (seq, np.ndarray). seq == 0 means never written."""
        out = np.empty(self.size, np.float32)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        seq = self._lib.shm_channel_read(self._h, ptr, self.size)
        if seq < 0:
            raise RuntimeError("torn read persisted (writer wedged?)")
        return int(seq), out

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.shm_channel_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

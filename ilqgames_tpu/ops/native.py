"""ctypes bindings for the native C++ LQ kernel (native/lq_feedback.cc).

The native kernel is an independent implementation of the coupled Riccati
recursion used as (a) a cross-language test oracle for the JAX scan kernel
and (b) a zero-dispatch-latency single-instance CPU path for host-side
runtimes. Built on demand with g++ (no external dependencies)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "lq_feedback.cc")
_LIB = os.path.join(_ROOT, "native", "build", "liblqgames_native.so")
_LOCK = threading.Lock()
_lib = None


def _build():
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    subprocess.run(
        ["g++", "-std=c++17", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
        check=True,
    )


def load():
    """Load (building if needed) the native library."""
    global _lib
    with _LOCK:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        f32 = ctypes.POINTER(ctypes.c_float)
        i32 = ctypes.POINTER(ctypes.c_int)
        lib.solve_lq_feedback.restype = ctypes.c_int
        lib.solve_lq_feedback.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32,
            f32, f32, f32, f32, f32, f32, f32, ctypes.c_int, f32, f32, f32,
        ]
        lib.solve_lq_open_loop.restype = ctypes.c_int
        lib.solve_lq_open_loop.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32,
            f32, f32, f32, f32, f32, f32, f32, f32, f32, f32,
        ]
        _lib = lib
        return lib


def solve_lq_feedback_native(spec, A, Bs, Q, l, R, r, x0,
                             adaptive_regularization=True):
    """NumPy front end mirroring ilqgames_tpu.solver.lq_feedback.

    Args match the JAX kernel's shapes: A [N,x,x], Bs [N,P,x,umax],
    Q [N,P,x,x], l [N,P,x], R [N,P,P,umax,umax], r [N,P,P,umax], x0 [x].
    Returns (Ps [N,P,umax,x], alphas [N,P,umax], delta_xs [N,x])."""
    lib = load()
    N, P, xd, um = spec.num_time_steps, spec.num_players, spec.xdim, spec.umax

    def as32(a):
        return np.ascontiguousarray(np.asarray(a), np.float32)

    A, Bs, Q, l, R, r, x0 = map(as32, (A, Bs, Q, l, R, r, x0))
    udims = np.asarray(spec.udims, np.int32)
    Ps = np.zeros((N, P, um, xd), np.float32)
    alphas = np.zeros((N, P, um), np.float32)
    dxs = np.zeros((N, xd), np.float32)

    ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    status = lib.solve_lq_feedback(
        N, P, xd, um,
        udims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ptr(A), ptr(Bs), ptr(Q), ptr(l), ptr(R), ptr(r), ptr(x0),
        int(adaptive_regularization), ptr(Ps), ptr(alphas), ptr(dxs),
    )
    if status != 0:
        raise RuntimeError(f"native LQ solve failed with status {status}")
    return Ps, alphas, dxs


def solve_lq_open_loop_native(spec, A, Bs, Q, l, R, r, x0):
    """NumPy front end mirroring ilqgames_tpu.solver.lq_open_loop
    (Lambda recursion; reference src/lq_open_loop_solver.cpp:110-194).

    Returns (alphas [N,P,umax], delta_xs [N,x], costates [N,P,x]);
    gains are zero by the open-loop convention."""
    lib = load()
    N, P, xd, um = spec.num_time_steps, spec.num_players, spec.xdim, spec.umax

    def as32(a):
        return np.ascontiguousarray(np.asarray(a), np.float32)

    A, Bs, Q, l, R, r, x0 = map(as32, (A, Bs, Q, l, R, r, x0))
    udims = np.asarray(spec.udims, np.int32)
    alphas = np.zeros((N, P, um), np.float32)
    dxs = np.zeros((N, xd), np.float32)
    costates = np.zeros((N, P, xd), np.float32)

    ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    status = lib.solve_lq_open_loop(
        N, P, xd, um,
        udims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ptr(A), ptr(Bs), ptr(Q), ptr(l), ptr(R), ptr(r), ptr(x0),
        ptr(alphas), ptr(dxs), ptr(costates),
    )
    if status != 0:
        raise RuntimeError(
            f"native open-loop LQ solve failed with status {status}"
        )
    return alphas, dxs, costates

"""Native host-runtime components (C++ via ctypes).

The compute path is JAX/XLA on TPU; the host runtime around it — image
decode/resize feeding the device — is native. `lanczos_resize` is a
PIL-LANCZOS-compatible float32 resampler built on first use with g++ and
used by the data pipeline; everything degrades gracefully to PIL when no
toolchain is available.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_BUILD_FAILED = False


def _build_library():
    """Compile resize.cpp into a cached shared library. Returns path or
    None."""
    src = os.path.join(os.path.dirname(__file__), "resize.cpp")
    cache_dir = os.environ.get(
        "RANSACFLOW_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "ransacflow_tpu"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libransacflow_host.so")
    if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
        return lib_path
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", lib_path, src,
        "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"native build failed ({e}); falling back to PIL resize")
        return None
    return lib_path


def _get_lib():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    path = _build_library()
    if path is None:
        _BUILD_FAILED = True
        return None
    lib = ctypes.CDLL(path)
    lib.lanczos_resize_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.lanczos_resize_f32.restype = None
    _LIB = lib
    return _LIB


def native_available():
    return _get_lib() is not None


def lanczos_resize(img, out_h, out_w, n_threads=4):
    """Lanczos-3 resize of a float32 (H, W, C) array (PIL semantics).

    Falls back to PIL per-channel 'F'-mode resizing when the native
    library is unavailable.
    """
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    lib = _get_lib()
    if lib is None:
        from PIL import Image

        out = np.stack(
            [
                np.asarray(
                    Image.fromarray(img[:, :, i], mode="F").resize(
                        (out_w, out_h), resample=Image.LANCZOS
                    )
                )
                for i in range(c)
            ],
            axis=-1,
        )
        return out
    out = np.empty((out_h, out_w, c), np.float32)
    lib.lanczos_resize_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
        n_threads,
    )
    return out

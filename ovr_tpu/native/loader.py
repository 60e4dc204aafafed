"""Python wrapper for the native raw-volume loader, with on-demand build.

The extension is compiled once from `loader.c` into the package directory
(cc -O3 -shared -fPIC -pthread); subsequent imports load the cached .so.
If no compiler is available the caller (ovr_tpu.io.raw) falls back to numpy.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

import numpy as np

_NATIVE = None
_TRIED = False


def _build_and_import():
    global _NATIVE, _TRIED
    if _NATIVE is not None or _TRIED:
        return _NATIVE
    _TRIED = True
    pkg_dir = os.path.dirname(__file__)
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    so_path = os.path.join(pkg_dir, "_ovr_native" + suffix)
    src = os.path.join(pkg_dir, "loader.c")
    if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(src)):
        include = sysconfig.get_paths()["include"]
        cc = os.environ.get("CC", "cc")
        cmd = [cc, "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
               f"-I{include}", src, "-o", so_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("_ovr_native", so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _NATIVE = mod
    except Exception:
        _NATIVE = None
    return _NATIVE


def load_raw(path: str, count: int, dtype_char: str, offset: int,
             big_endian: bool, nthreads: int | None = None) -> np.ndarray:
    """Load + normalize to float32 via the native extension.

    Raises ImportError when the extension can't be built (callers fall back).
    """
    mod = _build_and_import()
    if mod is None:
        raise ImportError("native loader unavailable")
    if nthreads is None:
        nthreads = min(os.cpu_count() or 1, 16)
    buf = mod.load_raw_f32(path, int(count), dtype_char, int(offset),
                           bool(big_endian), int(nthreads))
    return np.frombuffer(buf, dtype=np.float32)

"""C-reference oracle: compiles the read-only reference library to a shared
object and binds it via ctypes, so op/VJP outputs can be compared against the
reference's actual behavior on random inputs (SURVEY.md §4, §8.1).

The reference sources are compiled *in place* from /root/reference (read-only
mount) into a temp directory — nothing is copied into this repo. All tests
using the oracle must skip gracefully when the reference tree is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
import tempfile
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference")
_LIB_SOURCES = ["matrix.c", "csv.c", "util.c", "norm.c", "conv.c"]

_cached_lib = None


def reference_available() -> bool:
    return (REFERENCE / "lib" / "matrix.c").is_file()


class CMatrix(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.c_int),
        ("cols", ctypes.c_int),
        ("data", ctypes.POINTER(ctypes.c_double)),
    ]


def load_oracle():
    """Compile (once) and return the ctypes handle to the reference lib."""
    global _cached_lib
    if _cached_lib is not None:
        return _cached_lib
    if not reference_available():
        return None
    build_dir = Path(tempfile.gettempdir()) / "bla_oracle_build"
    build_dir.mkdir(exist_ok=True)
    so_path = build_dir / "libref.so"
    srcs = [str(REFERENCE / "lib" / s) for s in _LIB_SOURCES]
    newest_src = max(Path(s).stat().st_mtime for s in srcs)
    if not so_path.exists() or so_path.stat().st_mtime < newest_src:
        cmd = [
            "gcc", "-O2", "-fPIC", "-shared", "-o", str(so_path),
            *srcs, "-lm",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(so_path))
    lib.matrix_multiply.restype = ctypes.POINTER(CMatrix)
    lib.matrix_row_sum.restype = ctypes.POINTER(CMatrix)
    lib.matrix_col_sum.restype = ctypes.POINTER(CMatrix)
    lib.frobenius_norm.restype = ctypes.c_double
    lib.max_value.restype = ctypes.c_double
    _cached_lib = lib
    return lib


def as_cmatrix(arr: np.ndarray):
    """Wrap a C-contiguous float64 numpy array as a reference Matrix.

    Keeps a reference to the backing array to prevent GC; the reference library
    stores data row-major (lib/matrix.h:6-12), matching numpy's default.
    """
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    m = CMatrix(
        arr.shape[0],
        arr.shape[1] if arr.ndim > 1 else 1,
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    m._backing = arr  # keep alive
    return m, arr


def from_cmatrix(mp) -> np.ndarray:
    m = mp.contents
    out = np.ctypeslib.as_array(m.data, shape=(m.rows * m.cols,)).copy()
    return out.reshape(m.rows, m.cols)


# ---------------------------------------------------------------------------
# High-level wrappers (each returns fresh numpy arrays; inputs untouched).
# ---------------------------------------------------------------------------


def c_matmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = load_oracle()
    ma, _ = as_cmatrix(a)
    mb, _ = as_cmatrix(b)
    res = lib.matrix_multiply(ma, mb)
    out = from_cmatrix(res)
    lib.free_matrix(res)
    return out


def c_row_sum(a: np.ndarray) -> np.ndarray:
    lib = load_oracle()
    ma, _ = as_cmatrix(a)
    res = lib.matrix_row_sum(ma)
    out = from_cmatrix(res)
    lib.free_matrix(res)
    return out


def c_col_sum(a: np.ndarray) -> np.ndarray:
    """NOTE: reference-buggy for non-square inputs (lib/matrix.c:144,
    SURVEY.md §7.6) — only compare on square matrices."""
    lib = load_oracle()
    ma, _ = as_cmatrix(a)
    res = lib.matrix_col_sum(ma)
    out = from_cmatrix(res)
    lib.free_matrix(res)
    return out


def c_frobenius(a: np.ndarray) -> float:
    lib = load_oracle()
    ma, _ = as_cmatrix(a)
    return lib.frobenius_norm(ma)


def c_max_value(a: np.ndarray) -> float:
    lib = load_oracle()
    ma, _ = as_cmatrix(a)
    return lib.max_value(ma)


def c_z_score_normalize(a: np.ndarray) -> np.ndarray:
    lib = load_oracle()
    ma, buf = as_cmatrix(a.copy())
    lib.matrix_z_score_normalize(ctypes.byref(ma))
    return buf


def c_scale(a: np.ndarray, f: float) -> np.ndarray:
    lib = load_oracle()
    ma, buf = as_cmatrix(a.copy())
    lib.matrix_scale(ctypes.byref(ma), ctypes.c_double(f))
    return buf


def c_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = load_oracle()
    ma, buf = as_cmatrix(a.copy())
    mb, _ = as_cmatrix(b)
    lib.matrix_add(ctypes.byref(ma), ctypes.byref(mb))
    return buf


def c_multiply_elementwise(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = load_oracle()
    ma, buf = as_cmatrix(a.copy())
    mb, _ = as_cmatrix(b)
    lib.matrix_multiply_elementwise(ctypes.byref(ma), ctypes.byref(mb))
    return buf


def c_transpose(a: np.ndarray) -> np.ndarray:
    lib = load_oracle()
    ma, buf = as_cmatrix(a.copy())
    lib.matrix_transpose(ctypes.byref(ma))
    return buf.reshape(a.shape[1], a.shape[0])


def c_add_tile_columns(a: np.ndarray, col: np.ndarray) -> np.ndarray:
    lib = load_oracle()
    ma, buf = as_cmatrix(a.copy())
    mb, _ = as_cmatrix(col)
    lib.matrix_add_tile_columns(ctypes.byref(ma), ctypes.byref(mb))
    return buf


def c_add_tile_rows(a: np.ndarray, row: np.ndarray) -> np.ndarray:
    lib = load_oracle()
    ma, buf = as_cmatrix(a.copy())
    mb, _ = as_cmatrix(row)
    lib.matrix_add_tile_rows(ctypes.byref(ma), ctypes.byref(mb))
    return buf


def c_relu(a: np.ndarray) -> np.ndarray:
    lib = load_oracle()
    buf = np.ascontiguousarray(a.copy(), dtype=np.float64)
    lib.relu(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(buf.size),
    )
    return buf


def c_softmax(a: np.ndarray) -> np.ndarray:
    """Column-wise softmax (lib/util.c:15)."""
    lib = load_oracle()
    buf = np.ascontiguousarray(a.copy(), dtype=np.float64)
    lib.softmax(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(buf.shape[0]),
        ctypes.c_int(buf.shape[1]),
    )
    return buf


def c_softmax_row_wise(a: np.ndarray) -> np.ndarray:
    lib = load_oracle()
    buf = np.ascontiguousarray(a.copy(), dtype=np.float64)
    lib.softmax_row_wise(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(buf.shape[0]),
        ctypes.c_int(buf.shape[1]),
    )
    return buf


def c_group_norm(x: np.ndarray, channels: int, group_size: int):
    """Reference group_norm (lib/norm.c:5). x: (channels, spatial) row-major.

    Returns (out, means, stdevs) where — per the reference quirk (SURVEY.md
    §7.5) — 'stdevs' is actually the per-group *variance* and epsilon is 0.
    """
    lib = load_oracle()
    ma, _ = as_cmatrix(x)
    out = np.zeros_like(x, dtype=np.float64)
    mo, out_buf = as_cmatrix(out)
    n_groups = channels // group_size
    means = np.zeros(n_groups, dtype=np.float64)
    stdevs = np.zeros(n_groups, dtype=np.float64)
    lib.group_norm(
        ctypes.byref(ma),
        ctypes.byref(mo),
        stdevs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        means.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(channels),
        ctypes.c_int(group_size),
    )
    return out_buf, means, stdevs


def c_group_norm_ddx(
    g: np.ndarray,
    x: np.ndarray,
    means: np.ndarray,
    stdevs: np.ndarray,
    channels: int,
    group_size: int,
) -> np.ndarray:
    lib = load_oracle()
    mg, _ = as_cmatrix(g)
    mx, _ = as_cmatrix(x)
    dest = np.zeros_like(x, dtype=np.float64)
    md, dest_buf = as_cmatrix(dest)
    lib.group_norm_ddx(
        ctypes.byref(mg),
        ctypes.byref(md),
        ctypes.byref(mx),
        means.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        stdevs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(channels),
        ctypes.c_int(group_size),
    )
    return dest_buf

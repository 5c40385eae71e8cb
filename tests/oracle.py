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


def _channel_array(arr: np.ndarray):
    """(C, H, W) float64 → (ctypes array of CMatrix, backing buffer).
    The reference passes per-channel maps as arrays of Matrix structs
    (lib/norm.c:5, lib/conv.c:8)."""
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    c, h, w = arr.shape
    mats = (CMatrix * c)()
    for i in range(c):
        mats[i].rows = h
        mats[i].cols = w
        mats[i].data = ctypes.cast(
            arr.ctypes.data + i * h * w * 8, ctypes.POINTER(ctypes.c_double)
        )
    return mats, arr


def c_group_norm(x: np.ndarray, group_size: int):
    """Reference group_norm (lib/norm.c:5). x: (C, H, W).

    Returns (out, means, stdevs) where — per the reference quirk (SURVEY.md
    §7.5) — 'stdevs' is actually the per-group *variance* and epsilon is 0.
    """
    lib = load_oracle()
    channels = x.shape[0]
    mats_in, _ = _channel_array(x)
    out = np.zeros_like(x, dtype=np.float64)
    mats_out, out_buf = _channel_array(out)
    n_groups = -(-channels // group_size)
    means = np.zeros(n_groups, dtype=np.float64)
    stdevs = np.zeros(n_groups, dtype=np.float64)
    lib.group_norm(
        mats_in,
        mats_out,
        stdevs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        means.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(channels),
        ctypes.c_int(group_size),
    )
    return out_buf, means, stdevs


def c_group_norm_ddx(g: np.ndarray, x: np.ndarray, means: np.ndarray,
                     stdevs: np.ndarray, group_size: int) -> np.ndarray:
    """Reference group_norm backward (lib/norm.c:52). g, x: (C, H, W)."""
    lib = load_oracle()
    channels = x.shape[0]
    mats_g, _ = _channel_array(g)
    mats_x, _ = _channel_array(x)
    dest = np.zeros_like(x, dtype=np.float64)
    mats_d, dest_buf = _channel_array(dest)
    lib.group_norm_ddx(
        mats_g,
        mats_d,
        mats_x,
        means.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        stdevs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(channels),
        ctypes.c_int(group_size),
    )
    return dest_buf


# ---------------------------------------------------------------------------
# Convolution oracle: the reference's conv/conv_ddx as committed are broken by
# the swapped channel-reshape helpers (SURVEY.md §7.1 — the GEMM product is
# clobbered before it reaches the output), so parity targets the *correct*
# C pieces composed per the evident intent: _im2col → kernel reshape → GEMM,
# and im2colᵀ@dQ / _col2im for the backward.
# ---------------------------------------------------------------------------


def c_im2col(x: np.ndarray, kernel_size: int, stride: int) -> np.ndarray:
    """lib/conv.c:8 _im2col. x: (C, H, W) → (oh·ow, k·k·C)."""
    import math

    lib = load_oracle()
    c, h, w = x.shape
    mats_in, _ = _channel_array(x)
    oh, ow = math.ceil(h / stride), math.ceil(w / stride)
    out = np.zeros((oh * ow, kernel_size * kernel_size * c), np.float64)
    m_out, out_buf = as_cmatrix(out)
    lib._im2col(mats_in, ctypes.byref(m_out), ctypes.c_int(kernel_size),
                ctypes.c_int(c), ctypes.c_int(stride))
    return out_buf


def c_col2im(cols: np.ndarray, out_shape, kernel_size: int,
             stride: int) -> np.ndarray:
    """lib/conv.c:80 _col2im (scatter-add). cols: (oh·ow, k·k·C) →
    (C, H, W)."""
    lib = load_oracle()
    m_in, _ = as_cmatrix(cols)
    out = np.zeros(out_shape, np.float64)
    mats_out, out_buf = _channel_array(out)
    lib._col2im(ctypes.byref(m_in), mats_out, ctypes.c_int(kernel_size),
                ctypes.c_int(out_shape[0]), ctypes.c_int(stride))
    return out_buf


def c_conv_forward(x: np.ndarray, kernels: np.ndarray,
                   stride: int) -> np.ndarray:
    """Intended reference conv: im2col → (HWC, F) kernel matrix → GEMM →
    (F, oh, ow) (lib/conv.c:205-212 minus the §7.1 reshape bug)."""
    import math

    f, c, kh, kw = kernels.shape
    cols = c_im2col(x, kh, stride)
    kmat = kernels.reshape(f, c * kh * kw).T  # (k·k·C, F), C-major rows
    prod = c_matmul(cols, np.ascontiguousarray(kmat))
    oh, ow = math.ceil(x.shape[1] / stride), math.ceil(x.shape[2] / stride)
    return prod.reshape(oh, ow, f).transpose(2, 0, 1)


def c_conv_backward(x: np.ndarray, kernels: np.ndarray, g: np.ndarray,
                    stride: int):
    """Intended reference conv_ddx (lib/conv.c:214-227):
    del_K = im2colᵀ @ del_Q, del_X = col2im(del_Q @ Kᵀ).

    NOTE: dx is only produced for stride == 1. The reference's ``_col2im``
    iterates over the full image grid (height × width, lib/conv.c:106-108)
    instead of the output grid (oh × ow), so for stride > 1 it reads its
    input matrix out of bounds and scatters past the padded buffer (heap
    corruption — empirically verified; a latent defect beyond SURVEY.md §7,
    hidden upstream because the §7.1 reshape bug already breaks ``conv``).
    The strided dx path is instead validated against autodiff in
    tests/test_conv.py.
    """
    f, c, kh, kw = kernels.shape
    cols = c_im2col(x, kh, stride)
    dq = g.transpose(1, 2, 0).reshape(-1, f)      # (oh·ow, F), intended
    dk_mat = c_matmul(np.ascontiguousarray(cols.T), dq)   # (k·k·C, F)
    dk = dk_mat.T.reshape(f, c, kh, kw)
    dx = None
    if stride == 1:
        kmat = kernels.reshape(f, c * kh * kw)    # (F, k·k·C)
        dcols = c_matmul(dq, np.ascontiguousarray(kmat))  # (oh·ow, k·k·C)
        dx = c_col2im(dcols, x.shape, kh, stride)
    return dk, dx

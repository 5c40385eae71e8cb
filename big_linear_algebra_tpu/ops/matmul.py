"""Pallas MXU matmul kernels with hand-written VJPs.

TPU-native rebuild of the reference's dense matmul
(``lib/matrix.c:35`` ``matrix_multiply`` → ``:47`` ``matrix_multiply_inplace``,
the j-i-k triple loop that is the hot loop of the entire reference repo).

Instead of one naive loop, we provide three MXU kernels that cover the forward
pass and both backward GEMMs without ever materializing a transpose (the
reference clones the whole matrix to transpose it, ``lib/matrix.c:105``):

- ``matmul(a, b)``      : ``a @ b``       — forward
- ``matmul_nt(a, b)``   : ``a @ b.T``     — used for dA = g @ B.T
- ``matmul_tn(a, b)``   : ``a.T @ b``     — used for dB = A.T @ g

All kernels tile to the 128×128 MXU with float32 accumulation in a VMEM
scratch accumulator and a K-innermost "arbitrary" grid dimension so XLA/Mosaic
pipelines the HBM→VMEM block copies against compute. Inputs with dimensions
that are not tile-aligned are zero-padded (zero padding is exact for matmul)
and the result is sliced back.

The gradients are hand-written (``jax.custom_vjp``): this library treats
explicit backward passes as a first-class feature, mirroring the reference's
hand-derived backprop (e.g. ``model/mnist_nn.c:259-293``); JAX autodiff is
used only as a test oracle.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from big_linear_algebra_tpu.ops.pallas_utils import (
    LANE,
    pad2d,
    round_up,
    use_interpret,
)

# Below this many FLOPs a kernel launch + padding costs more than it saves;
# XLA's dot is used instead (still under the same custom_vjp structure).
_SMALL_FLOPS = 2 ** 22

# Measured on a v5e chip (4096³ bf16, slope-timed; see bench.py for the
# methodology): the 2-D full-K grid with (bm, bn) = (512, 1024) and a raised
# VMEM budget reaches ~197 TF/s ≈ 100% of the MXU roofline (XLA: ~96%);
# K-split fallback (512, 512, 2048) reaches ~85%.
_DEFAULT_BLOCK = None  # auto-tuned per shape; pass (bm, bn, bk) to override
_VMEM_LIMIT = 64 * 1024 * 1024   # raised scoped-vmem budget for big tiles
_VMEM_BUDGET = 40 * 1024 * 1024  # planning budget for double-buffered blocks

Variant = Literal["nn", "nt", "tn"]

# Per-variant geometry:
#   operand shapes        block shapes      index maps (i=m-tile, j=n-tile, k)
_VARIANTS = {
    # C[M,N] = A[M,K] @ B[K,N]
    "nn": dict(
        a_block=lambda bm, bn, bk: (bm, bk),
        b_block=lambda bm, bn, bk: (bk, bn),
        a_index=lambda i, j, k: (i, k),
        b_index=lambda i, j, k: (k, j),
        dims=(((1,), (0,)), ((), ())),
        shapes=lambda a, b: (a.shape[0], b.shape[1], a.shape[1]),
        check=lambda a, b: a.shape[1] == b.shape[0],
    ),
    # C[M,N] = A[M,P] @ B[N,P].T   (contract over last dims)
    "nt": dict(
        a_block=lambda bm, bn, bk: (bm, bk),
        b_block=lambda bm, bn, bk: (bn, bk),
        a_index=lambda i, j, k: (i, k),
        b_index=lambda i, j, k: (j, k),
        dims=(((1,), (1,)), ((), ())),
        shapes=lambda a, b: (a.shape[0], b.shape[0], a.shape[1]),
        check=lambda a, b: a.shape[1] == b.shape[1],
    ),
    # C[M,N] = A[P,M].T @ B[P,N]   (contract over first dims)
    "tn": dict(
        a_block=lambda bm, bn, bk: (bk, bm),
        b_block=lambda bm, bn, bk: (bk, bn),
        a_index=lambda i, j, k: (k, i),
        b_index=lambda i, j, k: (k, j),
        dims=(((0,), (0,)), ((), ())),
        shapes=lambda a, b: (a.shape[1], b.shape[1], a.shape[0]),
        check=lambda a, b: a.shape[0] == b.shape[0],
    ),
}


def _epilogue(acc, bias_ref, activation):
    """Fused output epilogue: bias row-broadcast and/or activation applied to
    the f32 accumulator while the tile is still in VMEM — saves the extra
    HBM round trip XLA's separate elementwise kernel would cost."""
    if bias_ref is not None:
        acc = acc + bias_ref[:].astype(jnp.float32)
    if activation == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif activation is not None:  # pragma: no cover - guarded at dispatch
        raise ValueError(f"unknown fused activation {activation!r}")
    return acc


def _mm_kernel(a_ref, b_ref, *refs, n_k: int, dims, precision, activation):
    """Grid (m, n, k) with k innermost; fp32 accumulation in VMEM scratch."""
    bias_ref = refs[0] if len(refs) == 3 else None
    o_ref, acc_ref = refs[-2], refs[-1]
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(k == n_k - 1)
    def _flush():
        o_ref[:] = _epilogue(acc_ref[:], bias_ref,
                             activation).astype(o_ref.dtype)


def _mm_kernel_2d(a_ref, b_ref, *refs, dims, precision, activation):
    """Full-K 2-D grid: one MXU contraction per output tile, no scratch —
    the peak-throughput path when both K-strips fit in VMEM."""
    bias_ref = refs[0] if len(refs) == 2 else None
    o_ref = refs[-1]
    acc = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    o_ref[:] = _epilogue(acc, bias_ref, activation).astype(o_ref.dtype)


def _choose_blocks(m: int, n: int, k: int, itemsize: int):
    """Pick (bm, bn, bk): prefer the full-K 2-D layout (bm, bn) = (512, 1024)
    shrinking tiles until the double-buffered strips fit the VMEM planning
    budget; fall back to K-splitting for very large K."""
    kp = round_up(k, LANE)
    bm, bn = 512, 1024

    def strip_bytes(bm, bn, bk):
        return 2 * (bm * bk + bk * bn) * itemsize + 2 * bm * bn * 4

    # try full-K first
    while bm > 256 or bn > 256:
        if strip_bytes(bm, bn, kp) <= _VMEM_BUDGET:
            return min(bm, round_up(m, LANE)), min(bn, round_up(n, LANE)), kp
        if bn >= bm:
            bn //= 2
        else:
            bm //= 2
    if strip_bytes(256, 256, kp) <= _VMEM_BUDGET:
        return 256, 256, kp
    # K too large to hold a full strip: split K
    bm, bn, bk = 512, 512, 2048
    while bk > LANE and strip_bytes(bm, bn, bk) > _VMEM_BUDGET:
        bk //= 2
    return bm, bn, min(bk, kp)


# MXU input-precision policy (shared library-wide; f32 must use HIGHEST so
# the TPU never silently truncates it to bf16 — the 1e-5 gradient-parity
# contract in BASELINE.md depends on it)
from big_linear_algebra_tpu.ops.precision import mxu_precision as _mxu_precision  # noqa: E501,E402


def _pallas_mm(a, b, variant: Variant, block, out_dtype,
               bias=None, activation=None):
    spec = _VARIANTS[variant]
    m, n, k = spec["shapes"](a, b)
    # plan VMEM with the larger operand itemsize: a bf16×f32 mix must not
    # undercount the f32 strip and approve blocks that exceed the budget
    itemsize = max(jnp.dtype(a.dtype).itemsize, jnp.dtype(b.dtype).itemsize)
    if block is None:
        bm, bn, bk = _choose_blocks(m, n, k, itemsize)
    else:
        bm, bn, bk = block
    # All block dims are kept lane-aligned (128): every block dim appears as a
    # trailing dim of some operand in at least one variant, and 128-alignment
    # satisfies every dtype's sublane constraint too.
    bm = min(bm, round_up(m, LANE))
    bn = min(bn, round_up(n, LANE))
    bk = min(bk, round_up(k, LANE))
    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)

    if variant == "nn":
        a_p, b_p = pad2d(a, mp, kp), pad2d(b, kp, np_)
    elif variant == "nt":
        a_p, b_p = pad2d(a, mp, kp), pad2d(b, np_, kp)
    else:  # tn
        a_p, b_p = pad2d(a, kp, mp), pad2d(b, kp, np_)

    n_k = kp // bk
    # keyed on BOTH operands: a bf16·f32 mix must still protect the f32 side
    precision = _mxu_precision(jnp.result_type(a.dtype, b.dtype))
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=(m * k + k * n + m * n) * itemsize,
        transcendentals=0,
    )
    operands = [a_p, b_p]
    bias_specs = []
    if bias is not None:
        operands.append(pad2d(bias.reshape(1, -1), 1, np_))
    if n_k == 1:
        if bias is not None:
            bias_specs = [pl.BlockSpec((1, bn), lambda i, j: (0, j),
                                       memory_space=pltpu.VMEM)]
        # peak path: full-K strips, no scratch accumulator
        out = pl.pallas_call(
            functools.partial(_mm_kernel_2d, dims=spec["dims"],
                              precision=precision, activation=activation),
            grid=(mp // bm, np_ // bn),
            in_specs=[
                pl.BlockSpec(spec["a_block"](bm, bn, bk),
                             lambda i, j: spec["a_index"](i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(spec["b_block"](bm, bn, bk),
                             lambda i, j: spec["b_index"](i, j, 0),
                             memory_space=pltpu.VMEM),
                *bias_specs,
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=cost,
            interpret=use_interpret(),
        )(*operands)
    else:
        if bias is not None:
            bias_specs = [pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                                       memory_space=pltpu.VMEM)]
        out = pl.pallas_call(
            functools.partial(_mm_kernel, n_k=n_k, dims=spec["dims"],
                              precision=precision, activation=activation),
            grid=(mp // bm, np_ // bn, n_k),
            in_specs=[
                pl.BlockSpec(spec["a_block"](bm, bn, bk), spec["a_index"],
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(spec["b_block"](bm, bn, bk), spec["b_index"],
                             memory_space=pltpu.VMEM),
                *bias_specs,
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            cost_estimate=cost,
            interpret=use_interpret(),
        )(*operands)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


def _xla_mm(a, b, variant: Variant, out_dtype, bias=None, activation=None):
    dims = _VARIANTS[variant]["dims"]
    out = jax.lax.dot_general(
        a, b, dimension_numbers=dims,
        preferred_element_type=jnp.float32
        if jnp.dtype(out_dtype).itemsize <= 4 else jnp.float64,
        precision=_mxu_precision(jnp.result_type(a.dtype, b.dtype)),
    )
    if bias is not None:
        out = out + bias[None, :].astype(out.dtype)
    if activation == "relu":
        out = jnp.maximum(out, 0.0)
    return out.astype(out_dtype)


def _dispatch(a, b, variant: Variant, block, out_dtype,
              bias=None, activation=None):
    spec = _VARIANTS[variant]
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(
            f"matmul_{variant} expects 2-D operands, got {a.shape} and {b.shape}"
        )
    if not spec["check"](a, b):
        # Reference behavior: dimension mismatch is a hard error
        # (lib/matrix.c:36-39 printf + exit(1)); here it is a trace-time error.
        raise ValueError(
            f"matmul_{variant}: incompatible shapes {a.shape} and {b.shape}"
        )
    if activation not in (None, "relu"):
        raise ValueError(f"unsupported fused activation {activation!r}")
    if out_dtype is None:
        out_dtype = jnp.result_type(a.dtype, b.dtype)
    m, n, k = spec["shapes"](a, b)
    # float64 (CPU parity/oracle mode) and tiny problems go through XLA.
    # Keyed on the PROMOTED dtype: an f32×f64 mix must not reach Mosaic
    # (no f64 support) just because the a-slot operand is f32.
    # Under SPMD the caller wraps the step in shard_map (parallel/spmd.py),
    # so this dispatch always sees per-shard local shapes and the Pallas
    # kernel runs on every device without needing a partitioning rule.
    if (jnp.dtype(jnp.result_type(a.dtype, b.dtype)).itemsize > 4
            or 2 * m * n * k < _SMALL_FLOPS):
        return _xla_mm(a, b, variant, out_dtype, bias, activation)
    return _pallas_mm(a, b, variant, block, out_dtype, bias, activation)


# ---------------------------------------------------------------------------
# Public ops with hand-written VJPs.
# dC = g for C = f(A, B):
#   nn: C = A @ B     → dA = g @ B.T  = nt(g, B);   dB = A.T @ g = tn(A, g)
#   nt: C = A @ B.T   → dA = g @ B    = nn(g, B);   dB = g.T @ A = tn(g, A)
#   tn: C = A.T @ B   → dA = B @ g.T  = nt(B, g);   dB = A @ g   = nn(A, g)
# (matches the reference's dense backward, model/mnist_nn.c:267-289, which
#  materializes matrix_transpose clones; here the transposes are fused into
#  the kernel's index maps.)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _matmul_base(a, b, variant: Variant, block):
    return _dispatch(a, b, variant, block, None)


def _matmul_fwd(a, b, variant, block):
    return _dispatch(a, b, variant, block, None), (a, b)


def _matmul_bwd(variant, block, res, g):
    a, b = res
    g = g.astype(jnp.result_type(a.dtype, b.dtype))
    if variant == "nn":
        da = _dispatch(g, b, "nt", block, a.dtype)
        db = _dispatch(a, g, "tn", block, b.dtype)
    elif variant == "nt":
        da = _dispatch(g, b, "nn", block, a.dtype)
        db = _dispatch(g, a, "tn", block, b.dtype)
    else:  # tn
        da = _dispatch(b, g, "nt", block, a.dtype)
        db = _dispatch(a, g, "nn", block, b.dtype)
    return da, db


_matmul_base.defvjp(_matmul_fwd, _matmul_bwd)


def matmul(a: jax.Array, b: jax.Array, *, block=_DEFAULT_BLOCK) -> jax.Array:
    """``a @ b`` on the MXU. Rebuilds ``matrix_multiply`` (lib/matrix.c:35)."""
    return _matmul_base(a, b, "nn", block)


def matmul_nt(a: jax.Array, b: jax.Array, *, block=_DEFAULT_BLOCK) -> jax.Array:
    """``a @ b.T`` without materializing the transpose.

    Covers the reference pattern ``matrix_multiply(dz, matrix_transpose(act))``
    (model/mnist_nn.c:267-269) in one kernel.
    """
    return _matmul_base(a, b, "nt", block)


def matmul_tn(a: jax.Array, b: jax.Array, *, block=_DEFAULT_BLOCK) -> jax.Array:
    """``a.T @ b`` without materializing the transpose.

    Covers the reference pattern ``matrix_multiply(matrix_transpose(W), dz)``
    (model/mnist_nn.c:273-275) in one kernel.
    """
    return _matmul_base(a, b, "tn", block)

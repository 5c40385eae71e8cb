"""Scaled dot-product attention: dense reference math + flash Pallas kernels.

Reference semantics (model/cifar_unet.c:999-1022 ``_forward_attention``):
single-head, unmasked: ``S = QKᵀ/√d`` → row-softmax (lib/util.c:36) → ``PV``.
The reference materializes the full N×N score matrix
(``_allocate_self_attention_block_data``, :409-417) and hand-derives the
backward incl. the softmax Jacobian (``_backward_attention`` :1261-1335,
``_softmax_ddx`` :1246).

TPU-native design (SURVEY.md §5 "Long-context"):
- ``attention_dense``: exact reference math with an explicit VJP (the
  reference's derivation in matrix form). Right choice for the U-Net's
  N ≤ 256 spatial tokens — one MXU GEMM pair beats a kernel launch.
- ``flash_attention``: blockwise online-softmax Pallas kernel that never
  materializes N×N in HBM, with a flash *backward* (saved per-row logsumexp,
  scores recomputed blockwise) — also hand-written Pallas. Scales to long
  sequences and is the building block for the ring/sequence-parallel mode in
  ``parallel/ring_attention.py``.
- ``attention`` dispatches between them by sequence length/backend.

Shapes: q, k, v are (B, N, d) (single head; for multi-head fold heads into B).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from big_linear_algebra_tpu.ops.pallas_utils import round_up, use_interpret

_FLASH_MIN_N = 1024  # below this the dense path wins (kernel launch + pad)


# ---------------------------------------------------------------------------
# Dense path: exact reference math, explicit VJP
# ---------------------------------------------------------------------------


def _dense_fwd_impl(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    acc_t = jnp.float64 if q.dtype == jnp.float64 else jnp.float32
    prec = _mxu_precision(q.dtype)  # f32 → HIGHEST (library-wide policy:
    # the TPU default would silently truncate f32 operands to bf16)
    s = jnp.einsum("bnd,bmd->bnm", q, k,
                   preferred_element_type=acc_t, precision=prec) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o = jnp.einsum("bnm,bmd->bnd", p, v.astype(p.dtype), precision=prec)
    return o.astype(q.dtype), p


@jax.custom_vjp
def attention_dense(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """softmax(QKᵀ/√d)V with the N×N matrix materialized (the reference's
    exact formulation, model/cifar_unet.c:999-1022)."""
    return _dense_fwd_impl(q, k, v)[0]


def _attention_dense_fwd(q, k, v):
    o, p = _dense_fwd_impl(q, k, v)
    return o, (q, k, v, p)


def _attention_dense_bwd(res, g):
    q, k, v, p = res
    scale = 1.0 / math.sqrt(q.shape[-1])
    prec = _mxu_precision(q.dtype)
    g = g.astype(p.dtype)
    dv = jnp.einsum("bnm,bnd->bmd", p, g, precision=prec)
    dp = jnp.einsum("bnd,bmd->bnm", g, v.astype(p.dtype), precision=prec)
    # softmax Jacobian per row: ds = p ⊙ (dp − Σ_j dp_j p_j)
    # (model/cifar_unet.c:1246-1258,1307-1308)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bnm,bmd->bnd", ds, k.astype(ds.dtype),
                    precision=prec) * scale
    dk = jnp.einsum("bnm,bnd->bmd", ds, q.astype(ds.dtype),
                    precision=prec) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


attention_dense.defvjp(_attention_dense_fwd, _attention_dense_bwd)


# ---------------------------------------------------------------------------
# Flash path: Pallas blockwise online softmax (fwd) + flash backward
# ---------------------------------------------------------------------------


# Shared MXU input-precision policy (ops/precision.py): bf16 native path,
# f32 HIGHEST — no silent bf16 truncation.
from big_linear_algebra_tpu.ops.precision import mxu_precision as _mxu_precision  # noqa: E501,E402


_LOG2E = math.log2(math.e)
# Static-unroll cap for the blockwise k/q loops: unrolling lets Mosaic
# software-pipeline the s-GEMM of block j+1 against the exp/rescale VPU chain
# of block j (measured on v5e: 137 → 181 TF/s fwd at N=4096). Longer
# sequences run a fori_loop over groups of this many unrolled blocks so
# compile time stays bounded.
_MAX_UNROLL = 16


def _unrolled_loop(n_blocks: int, body, init):
    if n_blocks <= _MAX_UNROLL:
        carry = init
        for j in range(n_blocks):
            carry = body(j, carry)
        return carry
    n_groups = n_blocks // _MAX_UNROLL

    def group(gi, carry):
        for u in range(_MAX_UNROLL):
            carry = body(gi * _MAX_UNROLL + u, carry)
        return carry

    carry = jax.lax.fori_loop(0, n_groups, group, init)
    for j in range(n_groups * _MAX_UNROLL, n_blocks):
        carry = body(j, carry)
    return carry


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                      scale, block_k, n_valid):
    """Online-softmax forward in the exp2 domain: 1/√d·log2(e) is folded
    into q once, so every score block needs only the hardware exp2 (exp
    lowers to exp2 + a per-element multiply — measurably slower). The
    blockwise loop is statically unrolled (see _MAX_UNROLL)."""
    in_dtype = q_ref.dtype
    prec = _mxu_precision(in_dtype)
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(in_dtype)
    bq = q.shape[0]
    n_pad = k_ref.shape[1]
    n_blocks = n_pad // block_k
    aligned = n_valid == n_pad  # no tail → masking compiled out entirely

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                    # (bq, bk) f32, log2 domain
        if not aligned:
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + j * block_k)
            s = jnp.where(col < n_valid, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # PV on the MXU in the input dtype (standard flash practice: bf16
        # probabilities for bf16 inputs; f32 accumulation either way)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(in_dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)
        return m_new, l, acc

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, q_ref.shape[2]), jnp.float32)
    m, l, acc = _unrolled_loop(n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # lse carries a 128-lane trailing dim (TPU block-shape constraint:
    # a (1, block_q) tile of a (b, n) array is not a legal vmem block).
    # Converted back to the natural-log domain for the backward.
    lse_ref[0] = jnp.broadcast_to((m + jnp.log2(l)) / _LOG2E, (bq, 128))


def _flash_bwd_fused_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                            dq_ref, dk_ref, dv_ref, dq_acc, *,
                            scale, block_q, block_k, n_valid, n_k):
    """One pass over k-blocks (grid dim j) computing dq, dk and dv together:
    each (q-block i, k-block j) pair recomputes p ONCE and feeds all three
    grads — the two-kernel split recomputed it twice and re-read q/g/lse per
    kernel. dq accumulates across j in a float32 VMEM scratch (flushed at the
    last j); dk/dv accumulate across the inner q loop in registers."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    kb = k_ref[0]                                      # (bk, d)
    vb = v_ref[0]
    in_dtype = kb.dtype
    prec = _mxu_precision(in_dtype)
    n_pad = q_ref.shape[1]
    aligned = n_valid == n_pad

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        g = g_ref[0, pl.ds(i * block_q, block_q), :]
        lse2 = lse_ref[0, pl.ds(i * block_q, block_q), 0:1]  # log2 domain
        delta = delta_ref[0, pl.ds(i * block_q, block_q), 0:1]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec) * (scale * _LOG2E)
        p = jnp.exp2(s - lse2)
        if not aligned:
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + j * block_k)
            p = jnp.where(col < n_valid, p, 0.0)
        dp = jax.lax.dot_general(g, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        ds = (p * (dp - delta)).astype(in_dtype)
        dv = dv + jax.lax.dot_general(p.astype(in_dtype), g,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=prec)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=prec)
        dq_acc[pl.ds(i * block_q, block_q), :] += jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        return dk, dv

    dk0 = jnp.zeros(kb.shape, jnp.float32)
    dv0 = jnp.zeros(vb.shape, jnp.float32)
    dk, dv = _unrolled_loop(n_pad // block_q, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)      # scale applied once
    dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(j == n_k - 1)
    def _flush():
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                         dq_ref, *, scale, block_k, n_valid):
    q = q_ref[0]
    g = g_ref[0]
    in_dtype = q.dtype
    prec = _mxu_precision(in_dtype)
    lse = lse_ref[0, :, 0:1]
    delta = delta_ref[0, :, 0:1]
    n_pad = k_ref.shape[1]
    aligned = n_valid == n_pad

    def body(j, dq):
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec) * (scale * _LOG2E)
        p = jnp.exp2(s - lse)                  # lse arrives in log2 domain
        if not aligned:
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + j * block_k)
            p = jnp.where(col < n_valid, p, 0.0)
        dp = jax.lax.dot_general(g, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        ds = (p * (dp - delta)).astype(in_dtype)
        return dq + jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec) * scale

    dq0 = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    dq = _unrolled_loop(n_pad // block_k, body, dq0)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, scale, block_q, n_valid):
    kb = k_ref[0]                                      # (bk, d)
    vb = v_ref[0]
    in_dtype = kb.dtype
    prec = _mxu_precision(in_dtype)
    n_pad = q_ref.shape[1]
    aligned = n_valid == n_pad

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        g = g_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), 0:1]  # log2 domain
        delta = delta_ref[0, pl.ds(i * block_q, block_q), 0:1]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec) * (scale * _LOG2E)
        p = jnp.exp2(s - lse)
        if not aligned:
            row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                   + i * block_q)
            p = jnp.where(row < n_valid, p, 0.0)
        dv = dv + jax.lax.dot_general(p.astype(in_dtype), g,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=prec)
        dp = jax.lax.dot_general(g, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        ds = (p * (dp - delta)).astype(in_dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=prec) * scale
        return dk, dv

    dk0 = jnp.zeros(kb.shape, jnp.float32)
    dv0 = jnp.zeros(vb.shape, jnp.float32)
    dk, dv = _unrolled_loop(n_pad // block_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_nd(x, n_pad, d_pad):
    b, n, d = x.shape
    if n == n_pad and d == d_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d_pad - d)))


_FWD_VMEM_BUDGET = 64 * 1024 * 1024


def _flash_fwd(q, k, v, block_q, block_k):
    b, n, d = q.shape
    if k.shape != q.shape or v.shape != q.shape:
        # the kernel derives n_pad and its validity mask from q alone —
        # shorter k/v would be zero-padded into ATTENDED phantom keys
        # (silently wrong softmax); use attention_dense for cross-attention
        raise ValueError(
            f"flash_attention is self-attention-shaped: q {q.shape}, "
            f"k {k.shape}, v {v.shape} must match (attention_dense "
            f"supports differing key/query lengths)")
    scale = 1.0 / math.sqrt(d)
    d_pad = round_up(d, 128)
    # pad to a common multiple so BOTH the q-grid and the k-loop tile n_pad
    # exactly (rounding to max(block_q, block_k) silently drops tail keys
    # when one block size does not divide the other)
    n_pad = round_up(n, math.lcm(block_q, block_k))
    # the kernel keeps the full padded K and V rows VMEM-resident (that row
    # residency is what lets the unrolled k-loop pipeline at 181 TF/s) —
    # guard the budget up front with a clear remedy instead of an opaque
    # Mosaic allocation failure
    itemsize = jnp.dtype(q.dtype).itemsize
    resident = 2 * n_pad * d_pad * itemsize            # K + V rows
    resident += 2 * block_q * d_pad * itemsize         # q + o blocks
    if 2 * resident > _FWD_VMEM_BUDGET:                # ×2: double buffering
        raise ValueError(
            f"flash_attention: K/V rows for n={n} (padded {n_pad}), "
            f"d={d} ({q.dtype}) need ~{2 * resident >> 20} MB VMEM, over "
            f"the {_FWD_VMEM_BUDGET >> 20} MB budget. Shard the sequence "
            f"with parallel.ring_attention (each shard holds n/P rows) or "
            f"cast to bfloat16.")
    qp, kp, vp = (_pad_nd(x, n_pad, d_pad) for x in (q, k, v))
    grid = (b, n_pad // block_q)
    o, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale, block_k=block_k,
                          n_valid=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, n_pad, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FWD_VMEM_BUDGET),
        interpret=use_interpret(),
    )(qp, kp, vp)
    return o[:, :n, :d], lse[:, :n, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    block_q: int = 512, block_k: int = 1024) -> jax.Array:
    """Blockwise online-softmax attention; N×N never hits HBM.

    Default blocks (512, 1024) measured best on v5e: 181 TF/s bf16 forward
    (92% of the MXU roofline) at B=4, N=4096, d=128 by kernel device time —
    the statically-unrolled k-loop + exp2 scoring let Mosaic pipeline each
    block's VPU softmax chain against the next block's MXU GEMMs."""
    return _flash_fwd(q, k, v, block_q, block_k)[0]


def _flash_attention_fwd(q, k, v, block_q, block_k):
    o, lse = _flash_fwd(q, k, v, block_q, block_k)
    return o, (q, k, v, o, lse)


# VMEM planning budget for the fused backward's resident rows (q, g, lse,
# delta, dq scratch + output). The chip exposes far more than the ~16 MB
# textbook figure (the matmul kernel runs a 40 MB budget at 95% roofline);
# beyond this, fall back to the two-pass kernels that block q over the grid.
_BWD_FUSED_VMEM_BUDGET = 40 * 1024 * 1024


def _flash_bwd_prepare(q, g, o, lse, block_q, block_k):
    """The rotation-invariant residual prep (padded q/g, log2-domain
    lse/delta rows): split out so ring attention computes it ONCE instead of
    once per rotation (only k/v change around the ring)."""
    b, n, d = q.shape
    g = g.astype(q.dtype)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    d_pad = round_up(d, 128)
    n_pad = round_up(n, math.lcm(block_q, block_k))  # see _flash_fwd
    qp, gp = (_pad_nd(x, n_pad, d_pad) for x in (q, g))
    # lse is shipped to the kernels pre-multiplied into the log2 domain (the
    # kernels compute scores as s·log2e and use the hardware exp2 directly)
    lse_p = jnp.broadcast_to(
        jnp.pad(lse * _LOG2E,
                ((0, 0), (0, n_pad - n)))[:, :, None], (b, n_pad, 128))
    delta_p = jnp.broadcast_to(
        jnp.pad(delta, ((0, 0), (0, n_pad - n)))[:, :, None], (b, n_pad, 128))
    return qp, gp, lse_p, delta_p, n_pad, d_pad


def _flash_attention_bwd(block_q, block_k, res, g):
    q, k, v, o, lse = res
    qp, gp, lse_p, delta_p, n_pad, d_pad = _flash_bwd_prepare(
        q, g, o, lse, block_q, block_k)
    kp, vp = (_pad_nd(x, n_pad, d_pad) for x in (k, v))
    return _flash_bwd_padded(qp, kp, vp, gp, lse_p, delta_p,
                             q.shape, block_q, block_k)


def _flash_bwd_padded(qp, kp, vp, gp, lse_p, delta_p, q_shape,
                      block_q, block_k):
    """Kernel dispatch on pre-padded residuals. ``q_shape`` is the unpadded
    (b, n, d)."""
    b, n, d = q_shape
    b_pad, n_pad, d_pad = qp.shape
    scale = 1.0 / math.sqrt(d)

    itemsize = jnp.dtype(qp.dtype).itemsize
    # both the fused kernel and the two-pass fallback keep O(n_pad·d_pad)
    # rows VMEM-resident (k/v for dq; q/g/lse/delta for dkv) — same wall as
    # the forward, so fail with the same remedy before Mosaic does opaquely
    fallback_resident = 2 * (2 * n_pad * d_pad * itemsize
                             + 2 * n_pad * 128 * 4)
    if fallback_resident > _FWD_VMEM_BUDGET:
        raise ValueError(
            f"flash_attention backward: resident rows for n={n} (padded "
            f"{n_pad}), d={d} ({qp.dtype}) need ~{fallback_resident >> 20} "
            f"MB VMEM, over the {_FWD_VMEM_BUDGET >> 20} MB budget. Shard "
            f"the sequence with parallel.ring_attention or cast to "
            f"bfloat16.")
    fused_bytes = (
        n_pad * d_pad * (3 * itemsize + 4)     # q, g, dq out, dq f32 scratch
        + n_pad * 128 * 8                      # lse + delta rows
        + 4 * block_k * d_pad * itemsize * 2)  # k/v/dk/dv double-buffered
    if fused_bytes <= _BWD_FUSED_VMEM_BUDGET:
        n_k = n_pad // block_k
        row = pl.BlockSpec((1, n_pad, d_pad), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
        row128 = pl.BlockSpec((1, n_pad, 128), lambda b, j: (b, 0, 0),
                              memory_space=pltpu.VMEM)
        kv_blk = pl.BlockSpec((1, block_k, d_pad), lambda b, j: (b, j, 0),
                              memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_flash_bwd_fused_kernel, scale=scale,
                              block_q=block_q, block_k=block_k, n_valid=n,
                              n_k=n_k),
            grid=(b, n_k),
            in_specs=[row, kv_blk, kv_blk, row, row128, row128],
            out_specs=[row, kv_blk, kv_blk],
            out_shape=[
                jax.ShapeDtypeStruct((b, n_pad, d_pad), qp.dtype),
                jax.ShapeDtypeStruct((b, n_pad, d_pad), kp.dtype),
                jax.ShapeDtypeStruct((b, n_pad, d_pad), vp.dtype),
            ],
            scratch_shapes=[pltpu.VMEM((n_pad, d_pad), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=use_interpret(),
        )(qp, kp, vp, gp, lse_p, delta_p)
        return dq[:, :n, :d], dk[:, :n, :d], dv[:, :n, :d]

    row_specs = [
        pl.BlockSpec((1, n_pad, d_pad), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, 128), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, block_k=block_k,
                          n_valid=n),
        grid=(b, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),   # q
            row_specs[0],                            # k (full)
            row_specs[0],                            # v (full)
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),   # g
            pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),   # lse
            pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),   # delta
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d_pad), qp.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FWD_VMEM_BUDGET),
        interpret=use_interpret(),
    )(qp, kp, vp, gp, lse_p, delta_p)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                          block_q=block_q, n_valid=n),
        grid=(b, n_pad // block_k),
        in_specs=[
            row_specs[0],                            # q (full)
            pl.BlockSpec((1, block_k, d_pad), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),   # k block
            pl.BlockSpec((1, block_k, d_pad), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),   # v block
            row_specs[0],                            # g (full)
            row_specs[1],                            # lse (full)
            row_specs[1],                            # delta (full)
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d_pad), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, d_pad), kp.dtype),
            jax.ShapeDtypeStruct((b, n_pad, d_pad), vp.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FWD_VMEM_BUDGET),
        interpret=use_interpret(),
    )(qp, kp, vp, gp, lse_p, delta_p)

    return dq[:, :n, :d], dk[:, :n, :d], dv[:, :n, :d]


flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Dispatch: dense for short sequences (and cross-attention shapes,
    which the flash kernel rejects), flash for long self-attention."""
    if (q.shape == k.shape == v.shape and q.shape[1] >= _FLASH_MIN_N
            and q.dtype != jnp.float64):
        return flash_attention(q, k, v)
    return attention_dense(q, k, v)


# ---------------------------------------------------------------------------
# The U-Net's self-attention block
# ---------------------------------------------------------------------------


def self_attention_block(x: jax.Array, params) -> jax.Array:
    """(B, C, H, W) → (B, C, H, W). ≈ ``_forward_attention``
    (model/cifar_unet.c:999-1022): reshape to (HW, C), project Q/K/V to
    key_dim, attend, dense back to C with bias, reshape.

    ``params``: dict with q/k/v (C, key_dim), w (key_dim, C), b (C,).
    """
    b, c, h, w = x.shape
    tokens = x.reshape(b, c, h * w).transpose(0, 2, 1)   # (B, HW, C)
    out = _attention_core(tokens, params)
    return out.transpose(0, 2, 1).reshape(b, c, h, w)


def self_attention_block_nhwc(x: jax.Array, params) -> jax.Array:
    """(B, H, W, C) → (B, H, W, C): the channels-last twin. Tokens are a
    plain reshape (no transpose — C already trails), so the block is two
    fewer HBM-sweep transposes than the NCHW version."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)                      # (B, HW, C)
    return _attention_core(tokens, params).reshape(b, h, w, c)


def _attention_core(tokens: jax.Array, params) -> jax.Array:
    """(B, N, C) → (B, N, C): q/k/v projections → attention → output dense
    with bias. The shared body of both layout wrappers — explicit MXU
    precision so f32 mode never silently truncates to bf16."""
    prec = _mxu_precision(tokens.dtype)
    q = jnp.einsum("bnc,ck->bnk", tokens, params["q"], precision=prec)
    k = jnp.einsum("bnc,ck->bnk", tokens, params["k"], precision=prec)
    v = jnp.einsum("bnc,ck->bnk", tokens, params["v"], precision=prec)
    att = attention(q, k, v)                             # (B, N, key_dim)
    return jnp.einsum("bnk,kc->bnc", att, params["w"],
                      precision=prec) + params["b"]

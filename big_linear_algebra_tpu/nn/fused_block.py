"""Fused U-Net resnet block as ONE Pallas kernel per direction.

VERDICT r3 #2: the starved 4²/8² resolutions were closed per-op, not
per-block. Three measured-negative per-op Pallas attempts (fused GN+ReLU,
per-example implicit GEMM, batch-packed conv) all died to the same
mechanism: every ``pallas_call`` materializes its operands in HBM while XLA
keeps these ≤128 KB activations VMEM-resident across its own fusion chains.
This kernel amortizes that round trip across the WHOLE reference resnet
block (``_forward_resnet``, /root/reference/model/cifar_unet.c:1044-1072):

    GN → ReLU → conv3×3 → +temb → GN → ReLU → dropout → conv3×3 → +residual

in one VMEM pass — at 4²/8² with 256 channels the block's activations
(≤1 MB) and both conv kernel sets (~2.4 MB bf16) fit VMEM trivially.

Design (TPU-first, not a translation):
- **Batch-packed layout** (C, B·H·W): every example's tokens share the MXU
  lane axis (the layout that made ``conv2d_packed`` win isolated at these
  shapes — nn/conv_implicit.py).
- **Convs as k² shifted tap GEMMs**: ``acc += W_tapᵀ @ roll(x, s)·mask`` —
  the same roll/mask scheme as ``_conv_packed_kernel`` (cross-example reads
  are exactly the masked-out ones).
- **GroupNorm via segment matmuls**: per-(group, example) sums are
  ``G_ch @ (x @ S_ex)`` with iota-built one-hot segment matrices — no
  in-kernel reshapes, stats ride the MXU.
- **Dropout from the in-kernel hardware PRNG** (``pltpu.prng_random_bits``):
  the forward and backward kernels reseed identically and regenerate the
  same mask. NOTE: this is a *different stream* than the XLA path's
  ``jax.random.bernoulli(key)`` masks — statistically equivalent, not
  bit-equal (same contract as switching ``--prng``).
- **Recompute-in-backward**: the VJP is a second fused kernel that
  recomputes the forward intermediates from the block inputs inside VMEM
  (≈½ extra forward of FLOPs — cheap at these starved shapes) and emits
  dx, d_td and all weight-tap grads in the same pass; nothing but the
  block inputs crosses HBM between fwd and bwd.

The time embedding projection (temb @ W_t + b_t → ``td`` (B, F)) and the
tap-layout transforms stay OUTSIDE the kernel as tiny XLA ops inside the
``custom_vjp`` boundary, so their grads fall out of the tap-grad transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from big_linear_algebra_tpu.ops.pallas_utils import use_interpret
from big_linear_algebra_tpu.ops.precision import mxu_precision as _mxu_precision

_VMEM_LIMIT = 96 * 1024 * 1024


def _hw_prng() -> bool:
    """In-kernel hardware PRNG only on a real TPU: the generic interpret
    mode has no rule for ``prng_seed``/``prng_random_bits`` (and the
    TPU-semantics interpreter mis-executes this kernel's packed GEMMs).
    Off-TPU the wrappers generate the SAME-role bits outside the kernel
    from the same seed (fwd and bwd both regenerate them, so the
    mask-consistency contract is identical in both modes)."""
    return not use_interpret()


def supported(x_shape, in_ch: int, out_ch: int, k: int, group_size: int,
              dtype) -> bool:
    """Shape gate: stride-1 odd-square kernels, channels divisible into
    full groups, and the whole block VMEM-resident with headroom."""
    b, c, h, w = x_shape
    if k % 2 == 0 or c != in_ch:
        return False
    if c % group_size or out_ch % group_size:
        return False
    if jnp.dtype(dtype).itemsize > 4:
        return False  # Mosaic has no f64
    bhw = b * h * w
    cm = max(in_ch, out_ch)
    # ~12 live (Cmax, BHW) f32 buffers (recompute backward) + two tap sets
    # + f32 tap-grad accumulators
    need = 12 * cm * bhw * 4 + 2 * k * k * in_ch * out_ch * 6 + \
        2 * k * k * cm * cm * 4
    return need <= _VMEM_LIMIT // 2


# ---------------------------------------------------------------------------
# In-kernel helpers (operate on jnp values inside a pallas kernel)
# ---------------------------------------------------------------------------


def _segments(c: int, b: int, hw: int, groups: int):
    """Iota-built one-hot segment matrices:
    S_ex (B·HW, B): token t belongs to example t // HW.
    G_ch (groups, C): channel c belongs to group c // group_size."""
    t = jax.lax.broadcasted_iota(jnp.int32, (b * hw, b), 0)
    e = jax.lax.broadcasted_iota(jnp.int32, (b * hw, b), 1)
    s_ex = (t // hw == e).astype(jnp.float32)
    g = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
    ch = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1)
    g_ch = (ch // (c // groups) == g).astype(jnp.float32)
    return s_ex, g_ch


def _f32dot(a, b_, dims):
    return jax.lax.dot_general(a, b_, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _bcast_gb(stat, s_ex, g_ch):
    """(groups, B) per-(group, example) stat → (C, B·HW) full broadcast:
    G_chᵀ @ stat @ S_exᵀ (two small f32 matmuls)."""
    per_ch = _f32dot(g_ch, stat, ((0,), (0,)))          # (C, B)
    return _f32dot(per_ch, s_ex, ((1,), (1,)))          # (C, BHW)


def _gn_stats(xs32, s_ex, g_ch, n, eps):
    """Textbook GN (nn/norm.py semantics: mean/σ² over group×H×W per
    example, ε inside the sqrt, no γ/β): returns (x̂, rstd_full)."""
    e1 = _f32dot(xs32, s_ex, ((1,), (0,)))              # (C, B) token sums
    e2 = _f32dot(xs32 * xs32, s_ex, ((1,), (0,)))       # (C, B)
    gs1 = _f32dot(g_ch, e1, ((1,), (0,)))               # (groups, B)
    gs2 = _f32dot(g_ch, e2, ((1,), (0,)))
    mean = gs1 / n
    var = jnp.maximum(gs2 / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_f = _bcast_gb(mean, s_ex, g_ch)
    rstd_f = _bcast_gb(rstd, s_ex, g_ch)
    return (xs32 - mean_f) * rstd_f, rstd_f


def _gn_bwd(g32, xhat, rstd_f, s_ex, g_ch, n):
    """dx = (g − mean_g(g) − x̂·mean_g(g·x̂))·rstd (matches
    nn/norm.py:_group_norm_bwd)."""
    gm = _bcast_gb(_f32dot(g_ch, _f32dot(g32, s_ex, ((1,), (0,))),
                           ((1,), (0,))) / n, s_ex, g_ch)
    gxm = _bcast_gb(_f32dot(g_ch, _f32dot(g32 * xhat, s_ex, ((1,), (0,))),
                            ((1,), (0,))) / n, s_ex, g_ch)
    return (g32 - gm - xhat * gxm) * rstd_f


def _tap_shift(x, s, valid, dtype):
    xs = x if s == 0 else jnp.roll(x, -s, axis=1)
    return (xs * valid).astype(dtype)


def _tap_masks(k, h, w, hw, bhw):
    """Per-tap validity masks (f32), token-indexed over the packed axis."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, bhw), 1)
    q = col % hw
    row_i, col_j = q // w, q % w
    half = k // 2
    masks = []
    for di in range(-half, half + 1):
        for dj in range(-half, half + 1):
            v = ((row_i + di >= 0) & (row_i + di < h)
                 & (col_j + dj >= 0) & (col_j + dj < w))
            masks.append((di * w + dj, v.astype(jnp.float32)))
    return masks


def _conv_taps(x, w_taps, masks, prec, compute_dtype):
    """Σ_tap W_tapᵀ @ (roll(x)·mask): (C, BHW) → (F, BHW) f32."""
    xc = x.astype(compute_dtype)
    acc = None
    for i, (s, valid) in enumerate(masks):
        xs = _tap_shift(xc, s, valid, compute_dtype)
        p = jax.lax.dot_general(w_taps[i], xs, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        acc = p if acc is None else acc + p
    return acc


def _conv_tap_grads(g, x, masks, prec, compute_dtype):
    """Per-tap weight grads: dW_tap = (roll(x)·mask) @ gᵀ → (k², C, F)."""
    xc = x.astype(compute_dtype)
    gc = g.astype(compute_dtype)
    outs = []
    for s, valid in masks:
        xs = _tap_shift(xc, s, valid, compute_dtype)
        outs.append(jax.lax.dot_general(
            xs, gc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec))
    return jnp.stack(outs)


def _mask_from_bits(bits, rate, scale_dtype):
    """Keep-mask·1/(1−rate) from uniform uint32 bits (keep iff
    bits ≥ rate·2³² — the same threshold rule in both PRNG modes)."""
    thresh = np.uint32(min(int(rate * float(2 ** 32)), 2 ** 32 - 1))
    keep = (bits.astype(jnp.uint32) >= thresh).astype(scale_dtype)
    return keep / np.asarray(1.0 - rate, scale_dtype)


def _dropout(a, seed, bits, rate):
    """Apply dropout to ``a`` from the in-kernel PRNG (``bits`` is None,
    real TPU) or from caller-supplied bits (interpret mode). fwd and bwd
    call this identically, so the mask always matches."""
    if bits is None:
        pltpu.prng_seed(seed)
        bits = pltpu.prng_random_bits(a.shape)
    return a * _mask_from_bits(bits, rate, jnp.float32)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_body(x, td, w1, w2, w3, seed, bits, *, k, b, h, w, gsz, rate,
              train, eps, prec, cdt):
    """Shared forward math (fwd kernel + bwd recompute). Returns the
    pre-residual conv_2 output, the residual, and the intermediates the
    backward needs. All (C, BHW)-packed; stats f32."""
    c_in = x.shape[0]
    f = w1.shape[2]
    hw = h * w
    bhw = b * hw
    s_ex, g_ch = _segments(c_in, b, hw, c_in // gsz)
    s_ex_f, g_ch_f = _segments(f, b, hw, f // gsz)
    masks = _tap_masks(k, h, w, hw, bhw)

    xs32 = x.astype(jnp.float32)
    xhat1, rstd1 = _gn_stats(xs32, s_ex, g_ch, gsz * hw, eps)
    a1 = jnp.maximum(xhat1, 0.0)
    h1 = _conv_taps(a1, w1, masks, prec, cdt)                 # (F, BHW) f32
    # +temb: td (B, F) broadcast over each example's tokens
    td_full = _f32dot(td.astype(jnp.float32), s_ex_f, ((0,), (1,))).reshape(
        f, bhw)
    h1t = h1 + td_full
    xhat2, rstd2 = _gn_stats(h1t, s_ex_f, g_ch_f, gsz * hw, eps)
    a2 = jnp.maximum(xhat2, 0.0)
    d = _dropout(a2, seed, bits, rate) if (train and rate > 0.0) else a2
    h2 = _conv_taps(d, w2, masks, prec, cdt)                  # (F, BHW) f32
    if w3 is None:
        res = xs32
    else:
        # 1×1 residual conv in packed layout = plain GEMM: (F, C)@(C, BHW)
        res = jax.lax.dot_general(w3, x.astype(cdt), (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
    return (h2, res, xs32, xhat1, rstd1, a1, h1t, xhat2, rstd2, d,
            (s_ex, g_ch, s_ex_f, g_ch_f, masks))


def _fused_fwd_kernel(x_ref, td_ref, seed_ref, w1_ref, w2_ref, *rest,
                      k, b, h, w, gsz, rate, train, eps, prec, cdt,
                      has_w3, has_bits):
    # pallas passes ALL input refs first, then output refs: rest is
    # [w3?, bits?, o]
    refs = list(rest)
    w3 = refs.pop(0)[...] if has_w3 else None
    bits = refs.pop(0)[...] if has_bits else None
    (o_ref,) = refs
    h2, res, *_ = _fwd_body(x_ref[...], td_ref[...], w1_ref[...],
                            w2_ref[...], w3, seed_ref[0], bits, k=k, b=b,
                            h=h, w=w, gsz=gsz, rate=rate, train=train,
                            eps=eps, prec=prec, cdt=cdt)
    o_ref[...] = (h2 + res).astype(o_ref.dtype)


def _fused_bwd_kernel(x_ref, td_ref, seed_ref, w1_ref, w2_ref, w1t_ref,
                      w2t_ref, g_ref, *refs, k, b, h, w, gsz, rate, train,
                      eps, prec, cdt, has_w3, has_bits):
    """Recompute-in-backward: one pass emitting dx, d_td, dW taps."""
    refs = list(refs)
    w3 = refs.pop(0)[...] if has_w3 else None
    bits = refs.pop(0)[...] if has_bits else None
    if has_w3:
        dx_ref, dtd_ref, dw1_ref, dw2_ref, dw3_ref = refs
    else:
        dx_ref, dtd_ref, dw1_ref, dw2_ref = refs
    (h2, res, xs32, xhat1, rstd1, a1, h1t, xhat2, rstd2, d,
     (s_ex, g_ch, s_ex_f, g_ch_f, masks)) = _fwd_body(
        x_ref[...], td_ref[...], w1_ref[...], w2_ref[...], w3, seed_ref[0],
        bits, k=k, b=b, h=h, w=w, gsz=gsz, rate=rate, train=train, eps=eps,
        prec=prec, cdt=cdt)
    del h2, res
    f = w1_ref.shape[2]
    hw = h * w

    g32 = g_ref[...].astype(jnp.float32)
    # conv_2 backward
    dw2_ref[...] = _conv_tap_grads(g32, d, masks, prec, cdt)
    dd = _conv_taps(g32, w2t_ref[...], masks, prec, cdt)      # (F, BHW)
    # dropout backward (same bits: _dropout reseeds / reuses the same
    # caller bits, identical draw order as _fwd_body)
    if train and rate > 0.0:
        dd = _dropout(dd, seed_ref[0], bits, rate)
    # relu 2 + GN 2
    dn2 = dd * (xhat2 > 0.0)
    dh1t = _gn_bwd(dn2, xhat2, rstd2, s_ex_f, g_ch_f, gsz * hw)
    # +temb: d_td[b, f] = Σ_{tokens of b} dh1t[f, t]
    dtd_ref[...] = _f32dot(dh1t, s_ex, ((1,), (0,))).astype(dtd_ref.dtype)
    # conv_1 backward
    dw1_ref[...] = _conv_tap_grads(dh1t, a1, masks, prec, cdt)
    da1 = _conv_taps(dh1t, w1t_ref[...], masks, prec, cdt)    # (C, BHW)
    # relu 1 + GN 1
    dn1 = da1 * (xhat1 > 0.0)
    dx = _gn_bwd(dn1, xhat1, rstd1, s_ex, g_ch, gsz * hw)
    # residual path
    if has_w3:
        dw3_ref[...] = jax.lax.dot_general(
            x_ref[...].astype(cdt), g32.astype(cdt),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec)
        dx = dx + jax.lax.dot_general(
            w3, g32.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
    else:
        dx = dx + g32
    dx_ref[...] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _taps(kern):
    """(F, C, k, k) → tap layout (k², C, F)."""
    f, c, kh, kw = kern.shape
    return kern.transpose(2, 3, 1, 0).reshape(kh * kw, c, f)


def _taps_t(kern):
    """Transpose-conv taps: flip spatial, swap channel dims → (k², F, C)."""
    return _taps(jnp.flip(kern, axis=(-2, -1)).transpose(1, 0, 2, 3))


def _untaps(d_taps, f, c, k):
    """Tap-grad (k², C, F) → kernel grad (F, C, k, k)."""
    return d_taps.reshape(k, k, c, f).transpose(3, 2, 0, 1)


def _pack(x):
    b, c, h, w = x.shape
    return x.transpose(1, 0, 2, 3).reshape(c, b * h * w)


def _unpack(xp, b, h, w):
    f = xp.shape[0]
    return xp.reshape(f, b, h, w).transpose(1, 0, 2, 3)


def _common(cfg_key, x, w1):
    b, c, h, w = x.shape
    k = w1.shape[-1]
    f = w1.shape[0]
    dt = jnp.result_type(x.dtype, w1.dtype)
    return b, c, h, w, k, f, dt


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_resnet_block(x, td, w1, w2, w3, seed, group_size: int,
                       rate: float, train: bool, eps: float = 1e-8):
    """The whole reference resnet block as one Pallas kernel.

    x: (B, C, H, W); td: (B, F) time-embedding projection (already through
    time_w/time_b); w1 (F, C, k, k), w2 (F, F, k, k); w3 (F, C, 1, 1) 1×1
    residual conv or None when C == F; seed: int32 scalar for the in-kernel
    dropout PRNG. Returns (B, F, H, W). Semantics =
    ``models/cifar_unet._resnet_block_body`` with the dropout stream
    swapped to the in-kernel PRNG."""
    return _frb_fwd(x, td, w1, w2, w3, seed, group_size, rate, train,
                    eps)[0]


def _ext_bits(seed, shape, rate, train):
    """Interpret-mode dropout bits, derived deterministically from the
    seed OUTSIDE the kernel (fwd and bwd both call this → same mask)."""
    if not (train and rate > 0.0) or _hw_prng():
        return None
    return jax.random.bits(jax.random.key(seed), shape, jnp.uint32)


def _frb_fwd(x, td, w1, w2, w3, seed, group_size, rate, train, eps):
    b, c, h, w, k, f, dt = _common(None, x, w1)
    prec = _mxu_precision(dt)
    cdt = dt
    xp = _pack(x).astype(dt)
    w1t, w2t = _taps(w1.astype(dt)), _taps(w2.astype(dt))
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    extra = () if w3 is None else (w3.astype(dt).reshape(f, c),)
    bits = _ext_bits(seed[0], (f, b * h * w), rate, train)
    if bits is not None:
        extra = extra + (bits,)
    kern = functools.partial(
        _fused_fwd_kernel, k=k, b=b, h=h, w=w, gsz=group_size, rate=rate,
        train=train, eps=eps, prec=prec, cdt=cdt, has_w3=w3 is not None,
        has_bits=bits is not None)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        in_specs=[vspec, vspec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vspec] * (2 + len(extra)),
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((f, b * h * w), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * f * h * w * max(c, f) * k * k,
            bytes_accessed=(2 * b * c * h * w + 2 * k * k * c * f)
            * jnp.dtype(dt).itemsize,
            transcendentals=0),
        interpret=use_interpret(),
    )(xp, td.astype(dt), seed, w1t, w2t, *extra)
    return _unpack(out, b, h, w), (x, td, w1, w2, w3, seed)


def _frb_bwd(group_size, rate, train, eps, res, g):
    x, td, w1, w2, w3, seed = res
    b, c, h, w, k, f, dt = _common(None, x, w1)
    prec = _mxu_precision(dt)
    xp = _pack(x).astype(dt)
    gp = _pack(g).astype(dt)
    w1taps, w2taps = _taps(w1.astype(dt)), _taps(w2.astype(dt))
    w1tt, w2tt = _taps_t(w1.astype(dt)), _taps_t(w2.astype(dt))
    has_w3 = w3 is not None
    extra = (w3.astype(dt).reshape(f, c),) if has_w3 else ()
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    bits = _ext_bits(seed_arr[0], (f, b * h * w), rate, train)
    if bits is not None:
        extra = extra + (bits,)
    kern = functools.partial(
        _fused_bwd_kernel, k=k, b=b, h=h, w=w, gsz=group_size, rate=rate,
        train=train, eps=eps, prec=prec, cdt=dt, has_w3=has_w3,
        has_bits=bits is not None)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((c, b * h * w), dt),        # dx packed
        jax.ShapeDtypeStruct((f, b), jnp.float32),       # d_td (F, B)
        jax.ShapeDtypeStruct((k * k, c, f), jnp.float32),  # dW1 taps
        jax.ShapeDtypeStruct((k * k, f, f), jnp.float32),  # dW2 taps
    ]
    if has_w3:
        out_shapes.append(jax.ShapeDtypeStruct((c, f), jnp.float32))
    outs = pl.pallas_call(
        kern,
        in_specs=[vspec, vspec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vspec] * (4 + len(extra) + 1),
        out_specs=[vspec] * len(out_shapes),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * 2 * b * f * h * w * max(c, f) * k * k,
            bytes_accessed=(4 * b * max(c, f) * h * w
                            + 6 * k * k * c * f) * jnp.dtype(dt).itemsize,
            transcendentals=0),
        interpret=use_interpret(),
    )(xp, td.astype(dt), seed_arr, w1taps, w2taps, w1tt, w2tt, gp, *extra)
    if has_w3:
        dxp, dtd, dw1t, dw2t, dw3 = outs
    else:
        dxp, dtd, dw1t, dw2t = outs
        dw3 = None
    dx = _unpack(dxp, b, h, w).astype(x.dtype)
    d_td = dtd.T.astype(td.dtype)
    dw1 = _untaps(dw1t, f, c, k).astype(w1.dtype)
    dw2 = _untaps(dw2t, f, f, k).astype(w2.dtype)
    if has_w3:
        dw3 = dw3.T.reshape(f, c, 1, 1).astype(w3.dtype)
    return dx, d_td, dw1, dw2, dw3, None


fused_resnet_block.defvjp(_frb_fwd, _frb_bwd)

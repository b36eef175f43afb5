"""Flash-fused pairwise MLP edge scoring — Pallas TPU kernel.

Round-5 (round-4 VERDICT item 1): the per-kernel breakdown of the CT
causal step (scripts/ct_breakdown.py) put the XLA one-walk pairwise
score op at 6.8 ms of the 26.8 ms device step — ~4x its analytic VPU
bound. This kernel owns the walk schedule instead: the
[VB, S, T, Hd] pre-activation domain (VB=192, S=T=64, Hd=800 at the
causal headline) is walked exactly ONCE forward and ONCE backward in
VMEM-resident [Tc, S, Hd] tiles, with the same grid layout as
ops/gat_flash.py (one program per (batch row, target chunk), sources on
sublanes, hidden on lanes — 800 lanes = 6.25 full vregs, no waste).

Semantics are identical to ops/pairwise.py::fused_pairwise_scores:
``sigmoid(sum_h leaky(xl_s + xr_t + b1) * w2 + b2)`` for every ordered
pair (s, t), with per-sample w2/b1/b2 supported (the causal path
gathers per-action discoverer params). The residual is the [B, S, T]
output itself, exactly like the XLA form.

NOTE ON ORIENTATION: ops/pairwise.py computes scores[s, t] with s the
ROW (xl) element; the kernel grid chunks the COLUMN (t / xr) axis, so
blocks ride transposed as [B, T, S] and are transposed back at the
boundary — a [B,S,T]<->[B,T,S] XLA transpose each way (cheap: the
[B,64,64] score tensor is ~0.1% of the walk domain).

Mosaic remote-compile rules obeyed (see ops/gat_flash.py): no 1-D
intermediates (w2/b1 ride [1, Hd]), 8-multiple sublane extents, lane
reductions keep keepdims until the store, arithmetic masking not
needed (no softmax).

Reference analogue: /root/reference/models/ct_mcq_vae.py:140-174 (the
comp/mem pairwise discoverers — materialize-everything or a Python row
loop; no fused form exists there).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _tc(T: int) -> int:
    """Target-chunk rows per program (multiple of 8, see gat_flash._tc).
    Default 16 covers the causal headline ([16, 64, 800] f32 workspace
    ~3.3 MB); CTVAE_PAIRWISE_TC overrides (rounded up)."""
    env = os.environ.get("CTVAE_PAIRWISE_TC")
    tc = max(1, int(env)) if env else (T if T <= 32 else 16)
    tc = -(-tc // 8) * 8
    return min(tc, -(-T // 8) * 8)


def _pad_t(x, n, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad) if n != x.shape[axis] else x


def _fwd_kernel(xl_ref, xrt_ref, w2_ref, b1_ref, b2_ref, out_ref, *,
                ns: float):
    """One (b, tc) program. xl [1,S,Hd], xrT [1,Tc,Hd], w2/b1 [1,1,Hd],
    b2 [1,1]; out [1,Tc,S] (scores TRANSPOSED: out[t,s] = score(s,t))."""
    xl = xl_ref[0].astype(jnp.float32)              # [S, Hd]
    xr = xrt_ref[0].astype(jnp.float32)             # [Tc, Hd]
    w2 = w2_ref[0].astype(jnp.float32)              # [1, Hd]
    b1 = b1_ref[0].astype(jnp.float32)              # [1, Hd]
    b2 = b2_ref[0, 0, 0].astype(jnp.float32)        # scalar (SMEM)

    pre = (xr[:, None, :] + xl[None, :, :]
           + b1[None, :, :])                        # [Tc, S, Hd]
    act = jnp.where(pre >= 0, pre, ns * pre)
    z = jnp.sum(act * w2[None, :, :], axis=-1)      # [Tc, S] lane-reduce
    out_ref[0] = jax.nn.sigmoid(z + b2).astype(out_ref.dtype)


def _bwd_kernel(xl_ref, xrt_ref, w2_ref, b1_ref, b2_ref, out_ref,
                dout_ref, dxl_ref, dxrt_ref, dw2_ref, db1_ref, db2_ref,
                *, ns: float):
    """One (b, tc) program; single re-walk of [Tc, S, Hd].
    dxl/dw2/db1/db2 revisit one block per b, accumulating over tc
    (the TPU grid is sequential)."""
    xl = xl_ref[0].astype(jnp.float32)              # [S, Hd]
    xr = xrt_ref[0].astype(jnp.float32)             # [Tc, Hd]
    w2 = w2_ref[0].astype(jnp.float32)              # [1, Hd]
    b1 = b1_ref[0].astype(jnp.float32)              # [1, Hd]
    out = out_ref[0].astype(jnp.float32)            # [Tc, S]
    dout = dout_ref[0].astype(jnp.float32)          # [Tc, S]

    d_z = dout * out * (1.0 - out)                  # [Tc, S]
    pre = (xr[:, None, :] + xl[None, :, :] + b1[None, :, :])
    slope = jnp.where(pre >= 0, 1.0, ns)
    dpre = d_z[:, :, None] * w2[None, :, :] * slope  # [Tc, S, Hd]
    act = jnp.where(pre >= 0, pre, ns * pre)

    d_xl_c = jnp.sum(dpre, axis=0)                  # [S, Hd]
    dxrt_ref[0] = jnp.sum(dpre, axis=1).astype(dxrt_ref.dtype)  # [Tc,Hd]
    d_w2_c = jnp.sum(jnp.sum(act * d_z[:, :, None], axis=0),
                     axis=0, keepdims=True)         # [1, Hd]
    d_b1_c = jnp.sum(jnp.sum(dpre, axis=0), axis=0,
                     keepdims=True)                 # [1, Hd]
    # 2-D at every stage (a 1-D intermediate crashes this toolchain's
    # Mosaic remote-compile, see ops/gat_flash.py module docstring)
    d_b2_c = jnp.sum(jnp.sum(d_z, axis=0, keepdims=True), axis=1,
                     keepdims=True)                 # [1, 1]

    tc = pl.program_id(1)

    @pl.when(tc == 0)
    def _init():
        dxl_ref[0] = d_xl_c.astype(dxl_ref.dtype)
        dw2_ref[0] = d_w2_c.astype(dw2_ref.dtype)
        db1_ref[0] = d_b1_c.astype(db1_ref.dtype)
        db2_ref[0] = d_b2_c[:1, :1].astype(db2_ref.dtype)

    @pl.when(tc != 0)
    def _acc():
        dxl_ref[0] = (dxl_ref[0].astype(jnp.float32)
                      + d_xl_c).astype(dxl_ref.dtype)
        dw2_ref[0] = (dw2_ref[0].astype(jnp.float32)
                      + d_w2_c).astype(dw2_ref.dtype)
        db1_ref[0] = (db1_ref[0].astype(jnp.float32)
                      + d_b1_c).astype(db1_ref.dtype)
        db2_ref[0] = (db2_ref[0].astype(jnp.float32)
                      + d_b2_c[:1, :1]).astype(db2_ref.dtype)


def _prep(xl, xr, w2, b1, b2):
    """Broadcast params to per-sample [B, 1, Hd]/[B, 1] and pad the
    node axes (padded target rows produce garbage scores that are
    sliced off; padded SOURCE rows only affect padded outputs — the
    pre-activation has no cross-source coupling)."""
    B, S, Hd = xl.shape
    T = xr.shape[1]
    w2b = jnp.broadcast_to(jnp.asarray(w2).reshape((-1, Hd))
                           if jnp.asarray(w2).ndim <= 2
                           else w2, (B, Hd))[:, None, :]
    b1b = jnp.broadcast_to(jnp.asarray(b1).reshape((-1, Hd))
                           if jnp.asarray(b1).ndim <= 2
                           else b1, (B, Hd))[:, None, :]
    b2b = jnp.broadcast_to(jnp.asarray(b2).reshape(-1),
                           (B,))[:, None, None]     # [B,1,1]: a [1,1]
    # trailing block equals the array's trailing dims (Mosaic tiling)
    Tc = _tc(T)
    NT = -(-T // Tc)
    Tp = NT * Tc
    Sp = -(-S // 8) * 8
    xl2 = _pad_t(xl, Sp, 1)
    xr2 = _pad_t(xr, Tp, 1)
    return xl2, xr2, w2b, b1b, b2b, Tc, NT, Tp, Sp


def _in_specs(S, Tc, Hd):
    return [
        pl.BlockSpec((1, S, Hd), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),          # xl
        pl.BlockSpec((1, Tc, Hd), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),          # xr
        pl.BlockSpec((1, 1, Hd), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),          # w2
        pl.BlockSpec((1, 1, Hd), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),          # b1
        pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.SMEM),          # b2 (scalar:
        # broadcasting a [1,1] VMEM vector over [Tc,S] is a relayout
        # Mosaic cannot express — "Not implemented" vpad broadcast)
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_pairwise(xl: Array, xr: Array, w2: Array, b1: Array,
                   b2: Array, ns: float,
                   interpret: bool = False) -> Array:
    """``sigmoid(sum_h leaky(xl_s + xr_t + b1) * w2 + b2)`` [B, S, T].
    xl/xr [B,S|T,Hd]; w2/b1 [Hd] or [B,Hd]; b2 scalar or [B]."""
    out, _ = _flash_fwd(xl, xr, w2, b1, b2, ns, interpret)
    return out


def _flash_fwd(xl, xr, w2, b1, b2, ns, interpret):
    B, S, Hd = xl.shape
    T = xr.shape[1]
    dt = xl.dtype
    xl2, xr2, w2b, b1b, b2b, Tc, NT, Tp, Sp = _prep(xl, xr, w2, b1, b2)
    outt = pl.pallas_call(
        functools.partial(_fwd_kernel, ns=ns),
        grid=(B, NT),
        in_specs=_in_specs(Sp, Tc, Hd),
        out_specs=pl.BlockSpec((1, Tc, Sp), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Sp), dt),
        interpret=interpret,
    )(xl2, xr2, w2b, b1b, b2b)
    return outt[:, :T, :S].transpose(0, 2, 1), outt


def _flash_vjp_fwd(xl, xr, w2, b1, b2, ns, interpret):
    out, outt = _flash_fwd(xl, xr, w2, b1, b2, ns, interpret)
    return out, (xl, xr, w2, b1, b2, outt)


def _flash_vjp_bwd(ns, interpret, res, dout):
    xl, xr, w2, b1, b2, outt = res
    B, S, Hd = xl.shape
    T = xr.shape[1]
    dt = xl.dtype
    xl2, xr2, w2b, b1b, b2b, Tc, NT, Tp, Sp = _prep(xl, xr, w2, b1, b2)
    doutt = _pad_t(_pad_t(dout.transpose(0, 2, 1), Tp, 1), Sp, 2)
    specs = _in_specs(Sp, Tc, Hd) + [
        pl.BlockSpec((1, Tc, Sp), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),          # out residual
        pl.BlockSpec((1, Tc, Sp), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),          # dout
    ]
    dxl, dxrt, dw2_b, db1_b, db2_b = pl.pallas_call(
        functools.partial(_bwd_kernel, ns=ns),
        grid=(B, NT),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, Sp, Hd), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # dxl (acc over t)
            pl.BlockSpec((1, Tc, Hd), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hd), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # dw2 (acc over t)
            pl.BlockSpec((1, 1, Hd), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # db1 (acc over t)
            pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # db2 (acc over t)
        ],
        out_shape=[
            # f32 accumulators across target chunks (cast at the edge)
            jax.ShapeDtypeStruct((B, Sp, Hd), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp, Hd), dt),
            jax.ShapeDtypeStruct((B, 1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xl2, xr2, w2b, b1b, b2b, outt, doutt)
    d_xl = dxl[:, :S].astype(dt)
    d_xr = dxrt[:, :T]
    # per-sample param grads -> caller's param shape (sum over batch
    # when the param was shared)
    w2a, b1a, b2a = jnp.asarray(w2), jnp.asarray(b1), jnp.asarray(b2)
    d_w2 = dw2_b[:, 0, :] if w2a.ndim == 2 else jnp.sum(dw2_b[:, 0, :], 0)
    d_b1 = db1_b[:, 0, :] if b1a.ndim == 2 else jnp.sum(db1_b[:, 0, :], 0)
    d_b2 = db2_b[:, 0, 0] if b2a.ndim == 1 else jnp.sum(db2_b[:, 0, 0])
    return (d_xl, d_xr, d_w2.astype(w2a.dtype).reshape(w2a.shape),
            d_b1.astype(b1a.dtype).reshape(b1a.shape),
            d_b2.astype(b2a.dtype).reshape(b2a.shape))


flash_pairwise.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)

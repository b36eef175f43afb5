"""Flash-fused dense GATv2 attention — Pallas TPU kernel.

One kernel program per (batch row, head) computes the whole attention
for that head in VMEM: edge logits ``e[s,t] = att . leaky(xl_s + xr_t +
adj_st * we)``, the masked softmax over *incoming* sources s, and the
alpha-weighted aggregation ``out[t] = sum_s alpha[s,t] xl[s]`` — the
[S,T,F] pre-activation never reaches HBM, and softmax + aggregation
fuse into the same VMEM residency instead of separate XLA fusions.

The backward is a second Pallas kernel that re-walks the [S,T,F] domain
ONCE, deriving d_xl / d_xr / d_adj / d_we / d_att in registers from the
recomputed pre-activation. XLA's fused+checkpointed formulation
(ops/gat.py ``fused_logits``) walks that domain ~4x in backward (one
recompute per gradient reduction — measured via scripts/profile_ct.py:
fusion.32/33/34 dominate the CT causal step); this kernel's 2 total
walks (1 fwd + 1 bwd) are the speed-of-light for exact gradients.

Semantics are IDENTICAL to DenseGATv2Layer's XLA path (softmax over
incoming real edges only, zero rows for edgeless targets, leaky grad 1
at 0): pinned value- and gradient-exact in tests/test_gat_flash.py.

STATUS (2026-08-20): VALIDATED ON CHIP. The round-2 toolchain hang is
gone; two Mosaic remote-compile bugs remained and are worked around in
the kernels (1-D intermediates and feeding the 3-D lane-reduce straight
into the column softmax both crash the compile helper — we/att stay
2-D and the logits stage through a VMEM scratch; bisected 2026-08-20).
Measured v5e at the causal headline attention shapes (B192 T65 H13 F100
bf16): fwd 9.1 ms (par with XLA), fwd+bwd 21.0 ms vs 25.6 ms for the
best XLA formulation (-18%); values exact, gradients exact in f32 and
within ~1 bf16 ulp in bf16 (the alpha residual is stored f32). Full CT
causal train step: 38.3 -> 32.7 ms at B16 (+15% throughput). The
action/base steps measure ~12% SLOWER under the kernel (tiny per-(b,h)
programs vs XLA's fused one-walk), so the default CTVAE_FLASH_GAT=auto
enables it ONLY inside the causal path's ``flash_scope()``
(ops/gat.py); =1 forces it everywhere, =0 disables.

The reference has no analogue — its GATv2 runs in torch-geometric CUDA
scatter kernels (/root/reference/models/ct_mcq_vae.py:102-114).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG = -1e30


def _fwd_kernel(xl_ref, xr_ref, adj_ref, mask_ref, we_ref, att_ref,
                out_ref, alpha_ref, e_scr, *, ns: float):
    """One (b, h) program. Blocks: xl/xr [1,1,S|T,F], adj/mask [1,S,T],
    we/att [1,1,F]; out [1,1,T,F], alpha [1,1,S,T]; e_scr VMEM [S,T]."""
    xl = xl_ref[0, 0].astype(jnp.float32)          # [S, F]
    xr = xr_ref[0, 0].astype(jnp.float32)          # [T, F]
    adj = adj_ref[0].astype(jnp.float32)           # [S, T]
    mask = mask_ref[0] != 0                        # [S, T] (passed as 0/1)
    # we/att stay 2-D [1, F]: 1-D intermediates in a gridded kernel
    # crash this toolchain's Mosaic remote-compile (see ops/vq.py).
    we = we_ref[0].astype(jnp.float32)             # [1, F]
    att = att_ref[0].astype(jnp.float32)           # [1, F]

    pre = (xl[:, None, :] + xr[None, :, :]
           + adj[:, :, None] * we[None, :, :])     # [S, T, F]
    act = jnp.where(pre >= 0, pre, ns * pre)
    # stage the logits through VMEM scratch: feeding the 3-D lane-reduce
    # result straight into the column softmax trips the same Mosaic
    # remote-compile failure as the 1-D intermediates (bisected
    # 2026-08-20); the round-trip forces a clean 2-D layout and costs
    # one [S,T] VMEM write/read
    e_scr[...] = jnp.sum(act * att[None, :, :], axis=-1)   # [S, T]
    e = e_scr[...]

    e = jnp.where(mask, e, NEG)
    e = e - jnp.max(e, axis=0, keepdims=True)       # over sources s
    w = jnp.where(mask, jnp.exp(e), 0.0)
    denom = jnp.sum(w, axis=0, keepdims=True)
    alpha = w / jnp.where(denom == 0, 1.0, denom)   # [S, T]

    out = jax.lax.dot_general(alpha, xl, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [T, F]
    out_ref[0, 0] = out.astype(out_ref.dtype)
    alpha_ref[0, 0] = alpha.astype(alpha_ref.dtype)


def _bwd_kernel(xl_ref, xr_ref, adj_ref, mask_ref, we_ref, att_ref,
                alpha_ref, dout_ref,
                dxl_ref, dxr_ref, dadj_ref, dwe_ref, datt_ref, *, ns: float):
    """One (b, h) program; single re-walk of the [S,T,F] domain."""
    xl = xl_ref[0, 0].astype(jnp.float32)           # [S, F]
    xr = xr_ref[0, 0].astype(jnp.float32)           # [T, F]
    adj = adj_ref[0].astype(jnp.float32)            # [S, T]
    mask = mask_ref[0] != 0                         # [S, T] (passed as 0/1)
    we = we_ref[0].astype(jnp.float32)              # [1, F] (2-D: see fwd)
    att = att_ref[0].astype(jnp.float32)            # [1, F]
    alpha = alpha_ref[0, 0].astype(jnp.float32)     # [S, T]
    dout = dout_ref[0, 0].astype(jnp.float32)       # [T, F]

    # aggregation backward: out[t] = sum_s alpha[s,t] xl[s]
    # d_alpha[s,t] = xl[s] . dout[t];  d_xl(agg)[s] = sum_t alpha[s,t] dout[t]
    d_alpha = jax.lax.dot_general(xl, dout, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [S,T]
    d_xl = jax.lax.dot_general(alpha, dout, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)     # [S,F]

    # masked-softmax backward (columns with denom 0 have alpha == 0, so
    # d_e is identically 0 there — no special-casing needed)
    s_col = jnp.sum(alpha * d_alpha, axis=0, keepdims=True)            # [1,T]
    d_e = alpha * (d_alpha - s_col)                                    # [S,T]
    d_e = jnp.where(mask, d_e, 0.0)

    # logits backward in one domain walk (all reductions stay >= 2-D)
    pre = (xl[:, None, :] + xr[None, :, :]
           + adj[:, :, None] * we[None, :, :])                         # [S,T,F]
    slope = jnp.where(pre >= 0, 1.0, ns)
    dpre = d_e[:, :, None] * att[None, :, :] * slope                   # [S,T,F]
    act = jnp.where(pre >= 0, pre, ns * pre)

    d_xl = d_xl + jnp.sum(dpre, axis=1)                                # [S,F]
    dxr = jnp.sum(dpre, axis=0)                                        # [T,F]
    dadj = jnp.sum(dpre * we[None, :, :], axis=-1)                     # [S,T]
    dwe = jnp.sum(jnp.sum(dpre * adj[:, :, None], axis=0),
                  axis=0, keepdims=True)                               # [1,F]
    datt = jnp.sum(jnp.sum(act * jnp.where(mask, d_e, 0.0)[:, :, None],
                           axis=0), axis=0, keepdims=True)             # [1,F]

    dxl_ref[0, 0] = d_xl.astype(dxl_ref.dtype)
    dxr_ref[0, 0] = dxr.astype(dxr_ref.dtype)
    dadj_ref[0, 0] = dadj.astype(dadj_ref.dtype)
    dwe_ref[0, 0] = dwe.astype(dwe_ref.dtype)
    datt_ref[0, 0] = datt.astype(datt_ref.dtype)


def _specs_bh(S, T, F):
    """Input BlockSpecs shared by both kernels for xl/xr/adj/mask/we/att
    with grid (B, H). xl/xr arrive as [B,H,S|T,F]; we/att as [H,1,F]."""
    return [
        pl.BlockSpec((1, 1, S, F), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, T, F), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, T), lambda b, h: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, T), lambda b, h: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, F), lambda b, h: (h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, F), lambda b, h: (h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def flash_gat(xl: Array, xr: Array, adj: Array, mask: Array,
              we: Array, att: Array, ns: float,
              interpret: bool = False) -> Array:
    """Fused GATv2 attention. xl [B,S,H,F], xr [B,T,H,F], adj/mask
    [B,S,T], we/att [H,F]. Returns out [B,T,H,F] (no bias)."""
    out, _ = _flash_fwd_raw(xl, xr, adj, mask, we, att, ns, interpret)
    return out


def _flash_fwd_raw(xl, xr, adj, mask, we, att, ns, interpret):
    B, S, H, F = xl.shape
    T = xr.shape[1]
    dt = xl.dtype
    mask = mask.astype(dt)                          # bool unsupported in VMEM
    xl_t = xl.transpose(0, 2, 1, 3)                 # [B,H,S,F]
    xr_t = xr.transpose(0, 2, 1, 3)                 # [B,H,T,F]
    out, alpha = pl.pallas_call(
        functools.partial(_fwd_kernel, ns=ns),
        grid=(B, H),
        in_specs=_specs_bh(S, T, F),
        out_specs=[
            pl.BlockSpec((1, 1, T, F), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, T), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, F), dt),
            # alpha residual stays f32 regardless of compute dtype: the
            # backward's softmax-VJP reads it, and a bf16 residual costs
            # ~2 bf16-ulp extra gradient error vs the XLA path (measured
            # on chip); f32 matches XLA to accumulation-order noise
            jax.ShapeDtypeStruct((B, H, S, T), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((S, T), jnp.float32)],
        interpret=interpret,
    )(xl_t, xr_t, adj, mask, we[:, None, :], att[:, None, :])
    return out.transpose(0, 2, 1, 3), alpha


def _flash_vjp_fwd(xl, xr, adj, mask, we, att, ns, interpret):
    out, alpha = _flash_fwd_raw(xl, xr, adj, mask, we, att, ns, interpret)
    return out, (xl, xr, adj, mask, we, att, alpha)


def _flash_vjp_bwd(ns, interpret, res, dout):
    xl, xr, adj, mask, we, att, alpha = res
    B, S, H, F = xl.shape
    T = xr.shape[1]
    dt = xl.dtype
    mask = mask.astype(dt)
    xl_t = xl.transpose(0, 2, 1, 3)
    xr_t = xr.transpose(0, 2, 1, 3)
    dout_t = dout.transpose(0, 2, 1, 3)             # [B,H,T,F]
    specs = _specs_bh(S, T, F) + [
        pl.BlockSpec((1, 1, S, T), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),       # alpha
        pl.BlockSpec((1, 1, T, F), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),       # dout
    ]
    dxl, dxr, dadj_h, dwe_b, datt_b = pl.pallas_call(
        functools.partial(_bwd_kernel, ns=ns),
        grid=(B, H),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, 1, S, F), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, F), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, T), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, F), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, F), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, F), dt),
            jax.ShapeDtypeStruct((B, H, T, F), dt),
            jax.ShapeDtypeStruct((B, H, S, T), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, F), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, F), jnp.float32),
        ],
        interpret=interpret,
    )(xl_t, xr_t, adj, mask, we[:, None, :], att[:, None, :],
      alpha, dout_t)
    dxl = dxl.transpose(0, 2, 1, 3)                 # [B,S,H,F]
    dxr = dxr.transpose(0, 2, 1, 3)
    dadj = jnp.sum(dadj_h, axis=1).astype(adj.dtype)      # [B,S,T]
    dwe = jnp.sum(dwe_b[:, :, 0, :], axis=0).astype(we.dtype)   # [H,F]
    datt = jnp.sum(datt_b[:, :, 0, :], axis=0).astype(att.dtype)
    return dxl, dxr, dadj, None, dwe, datt


flash_gat.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)

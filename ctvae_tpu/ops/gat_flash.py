"""Flash-fused dense GATv2 attention — Pallas TPU kernel (v2 layout).

Round-4 redesign (round-3 VERDICT item 2). The v1 kernel ran one
program per (batch row, head): at the CT attention shapes (H=13 heads,
F=100 features) that is B*13 tiny programs whose [S,T,F] tiles waste
28% of the 128-lane registers (F=100) and whose per-program overhead
dominated — measured 12% SLOWER than XLA on the action/base modes and
6.8 ms fwd / 12.4 ms bwd inside the causal step (59% of the whole
step, scripts/profile_ct.py).

v2 folds ALL heads into the lane dimension and chunks targets instead:

* one program per (batch row, target chunk): grid (B, ceil(T/Tc)) —
  13x fewer programs, each 13x larger;
* every [.., H*F] array uses H*F (=1300) lanes: 1.5% pad waste instead
  of 28%;
* the per-head logit reduction e[t,s,h] = sum_f act[t,s,h,f] att[h,f]
  runs on the MXU as act[Tc*S, HF] @ A[HF, H] with the block-diagonal
  matrix A[h*F+f, h] = att[h,f] (and head-expansion back to HF lanes
  uses the 0/1 indicator E = A's sparsity pattern) — what was a VPU
  lane reduction is now a matmul;
* the in-kernel domain is [Tc, S, HF] (targets major, sources sublane,
  head*feature lanes): every BlockSpec's last two dims are then either
  full array dims (S, HF, H) or the 8-divisible chunk Tc, satisfying
  the Mosaic tiling rule with ZERO in-kernel transposes; adj/mask ride
  pre-transposed as [B, T, S].

The backward re-walks the [Tc,S,HF] domain ONCE per chunk, deriving
all five gradients with the same MXU tricks; d_xl / d_we / d_att
accumulate across target chunks by revisiting the same output block
(the TPU grid is sequential). Semantics are IDENTICAL to
DenseGATv2Layer's XLA path (softmax over incoming real edges only,
zero rows for edgeless targets, leaky grad 1 at 0): pinned value- and
gradient-exact in tests/test_gat_flash.py.

Mosaic remote-compile notes (bisected 2026-08-20, see ops/vq.py): 1-D
intermediates crash the toolchain — we/att ride as [1, HF]; reductions
keep keepdims until the final store; the HF->1 lane reduction for
d_adj stages through a VMEM scratch.

The reference has no analogue — its GATv2 runs in torch-geometric CUDA
scatter kernels (/root/reference/models/ct_mcq_vae.py:102-114).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG = -1e30


def _tc(T: int) -> int:
    """Target-chunk size: CTVAE_FLASH_TC overrides; default covers
    T<=32 in one program, else 16-row chunks (VMEM-bounded: the
    [Tc,S,HF] f32 workspaces are ~5.4 MB at the CT shapes).

    Always a multiple of 8: Tc is the sublane extent of the [1,Tc,HF]
    xr/dout blocks, and an 8-indivisible sublane extent at full HF lane
    width is the exact shape class that hangs this toolchain's Mosaic
    remote-compile (see _pad8). The env override is rounded up too, so
    no setting can reintroduce the hazard. Targets are padded to
    Tp = NT*Tc with mask-0 rows exactly like sources, so a Tc > T is
    semantically free."""
    env = os.environ.get("CTVAE_FLASH_TC")
    if env:
        tc = max(1, int(env))
    elif T <= 32:
        tc = T
    else:
        # largest chunk <= 24 rows that minimizes padding: ~24 rows
        # amortizes the per-chunk dxl/dwe/datt accumulator revisits
        # (chip sweep 2026-08-21: Tc 24 -> 13.5 ms fwd+bwd vs 16 ->
        # 15.3 at the causal shapes; 32+ blows VMEM), and dividing T's
        # rounded-up chunk count keeps Tp tight (T=65 -> Tc 24, Tp 72)
        tc = -(-T // -(-T // 24))
    tc = -(-tc // 8) * 8
    return min(tc, _pad8(T))


def _cdt(dt) -> jnp.dtype:
    """MXU input dtype for the in-kernel dots. Always f32: the
    [.,HF]@[HF,H] head-reduce matmuls are operand-streaming-bound (13
    of 128 output lanes live), so feeding them bf16 buys no MXU time
    while the act/alpha ``astype`` casts cost an extra walk of the big
    domain — measured +0.5 ms fwd+bwd at the causal shapes
    (2026-08-21 chip A/B: bf16 dots 15.6 ms vs f32 15.1 ms). Full-bf16
    elementwise is blocked outright by Mosaic ("unsupported shape
    cast" on bf16 [Tc,1,HF] broadcasts). Kept as a hook so a future
    toolchain can flip one line."""
    del dt
    return jnp.float32


def _sub_mult(cdt) -> int:
    """Sublane padding multiple. 8 for every dtype: the in-kernel
    temporaries are f32 regardless of cdt (tile (8,128)), and bf16
    INPUT blocks at 8-multiple sublane extents (S=72) are exactly what
    every round-4 bf16 run shipped — measured safe on this toolchain.
    (A 16-multiple was tried for bf16 and costs +11% domain at the CT
    shapes, S 72 -> 80, for no compile-safety gain.)"""
    del cdt
    return 8


def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


def _fwd_kernel(xl_ref, xr_ref, adjt_ref, maskt_ref, we_ref, att_ref,
                a_ref, e_ref, out_ref, alpha_ref, *, ns: float,
                cdt=jnp.float32):
    """One (b, tc) program. xl [1,S,HF], xr [1,Tc,HF], adjT/maskT
    [1,Tc,S], we/att [1,HF], A [HF,H], E [H,HF]; out [1,Tc,HF],
    alpha [1,Tc,S,H]. Domain [Tc,S,HF]: targets major, sources
    sublanes, head*feature lanes.

    ``cdt`` is the MXU input dtype: it follows the array dtype (bf16
    model -> bf16 matmul inputs at the full 197-TFLOP/s rate; f32
    model -> f32, bit-compatible with the pre-round-5 kernel). All
    elementwise work and every accumulator stay f32 — Mosaic's bf16
    relayout support cannot express the [Tc,1,HF] broadcasts this
    kernel needs (bisected 2026-08-21: "unsupported shape cast"
    vector<1x16x36xbf16> -> 16x1x36), and the VPU is f32-native anyway;
    the matmul accumulators are f32 via preferred_element_type, so the
    logits enter the softmax at f32."""
    xl = xl_ref[0].astype(jnp.float32)             # [S, HF]
    xr = xr_ref[0].astype(jnp.float32)             # [Tc, HF]
    adjt = adjt_ref[0].astype(jnp.float32)         # [Tc, S]
    # arithmetic masking throughout: mf is exactly 0/1, so e*mf +
    # NEG*(1-mf) == where(mask, e, NEG) bit-for-bit — and a where()
    # whose bool operand broadcasts a single lane over H crashes this
    # toolchain's Mosaic remote-compile (bisected 2026-08-21)
    mf = (maskt_ref[0].astype(jnp.float32) != 0
          ).astype(jnp.float32)[:, :, None]         # [Tc, S, 1]
    we = we_ref[...].astype(jnp.float32)           # [1, HF]
    A = a_ref[...].astype(cdt)                     # [HF, H]
    E = e_ref[...].astype(cdt)                     # [H, HF]
    Tc, S = adjt.shape
    HF = xl.shape[-1]

    pre = (xr[:, None, :] + xl[None, :, :]
           + adjt[:, :, None] * we[None, :, :])    # [Tc, S, HF]
    act = jnp.where(pre >= 0, pre, ns * pre)
    # per-head logit reduction on the MXU: [Tc*S, HF] @ [HF, H]
    e3 = jax.lax.dot_general(act.astype(cdt).reshape(Tc * S, HF), A,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).reshape(Tc, S, H := A.shape[1])
    e3 = e3 * mf + NEG * (1.0 - mf)
    e3 = e3 - jnp.max(e3, axis=1, keepdims=True)   # over sources s
    w = jnp.exp(e3) * mf
    denom = jnp.sum(w, axis=1, keepdims=True)      # [Tc, 1, H]
    alpha3 = w / (denom + (denom == 0).astype(jnp.float32))

    # aggregation: expand alpha back to HF lanes via the indicator
    # matmul, then one multiply+reduce walk of the [Tc,S,HF] domain
    # (f32 sum accumulator regardless of cdt)
    alpha_exp = jax.lax.dot_general(alpha3.astype(cdt).reshape(Tc * S, H),
                                    E, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).reshape(Tc, S, HF)
    out = jnp.sum(alpha_exp * xl[None, :, :], axis=1)   # [Tc, HF]
    out_ref[0] = out.astype(out_ref.dtype)
    alpha_ref[0] = alpha3.astype(alpha_ref.dtype)


def _bwd_kernel(xl_ref, xr_ref, adjt_ref, maskt_ref, we_ref, att_ref,
                a_ref, e_ref, alpha_ref, dout_ref,
                dxl_ref, dxr_ref, dadjt_ref, dwe_ref, datt_ref,
                dadj_scr, *, ns: float, cdt=jnp.float32):
    """One (b, tc) program; single re-walk of the [Tc,S,HF] domain.
    dxl/dwe/datt revisit one block per b, accumulating over tc.
    ``cdt`` as in _fwd_kernel: MXU dot inputs at the array dtype,
    everything else f32."""
    xl = xl_ref[0].astype(jnp.float32)             # [S, HF]
    xr = xr_ref[0].astype(jnp.float32)             # [Tc, HF]
    adjt = adjt_ref[0].astype(jnp.float32)         # [Tc, S]
    mf = (maskt_ref[0].astype(jnp.float32) != 0
          ).astype(jnp.float32)[:, :, None]         # [Tc, S, 1] (see fwd)
    we = we_ref[...].astype(jnp.float32)           # [1, HF]
    att = att_ref[...].astype(jnp.float32)         # [1, HF]
    Et = a_ref[...].astype(cdt)                    # [HF, H] (indicator)
    E = e_ref[...].astype(cdt)                     # [H, HF]
    alpha3 = alpha_ref[0].astype(jnp.float32)      # [Tc, S, H]
    dout = dout_ref[0].astype(jnp.float32)         # [Tc, HF]
    Tc, S = adjt.shape
    HF = xl.shape[-1]
    H = E.shape[0]

    # d_alpha[t,s,h] = sum_f xl[s,hf] dout[t,hf]  (MXU head-reduce)
    P = dout[:, None, :] * xl[None, :, :]          # [Tc, S, HF]
    d_alpha3 = jax.lax.dot_general(P.astype(cdt).reshape(Tc * S, HF), Et,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).reshape(Tc, S, H)
    # masked-softmax backward in f32 (denom-0 columns have alpha == 0)
    s_col = jnp.sum(alpha3 * d_alpha3, axis=1, keepdims=True)
    d_e3 = alpha3 * (d_alpha3 - s_col) * mf        # [Tc, S, H]

    # expand d_e back to HF lanes; recompute pre once
    d_e_exp = jax.lax.dot_general(d_e3.astype(cdt).reshape(Tc * S, H), E,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).reshape(Tc, S, HF)
    pre = (xr[:, None, :] + xl[None, :, :]
           + adjt[:, :, None] * we[None, :, :])
    slope = jnp.where(pre >= 0, 1.0, ns)
    act = jnp.where(pre >= 0, pre, ns * pre)
    dpre = d_e_exp * att[None, :, :] * slope       # [Tc, S, HF]

    alpha_exp = jax.lax.dot_general(alpha3.astype(cdt).reshape(Tc * S, H),
                                    E, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).reshape(Tc, S, HF)
    d_xl_c = (jnp.sum(dpre, axis=0)
              + jnp.sum(alpha_exp * dout[:, None, :], axis=0))  # [S,HF]
    dxr_c = jnp.sum(dpre, axis=1)                  # [Tc, HF]
    # d_adj: HF -> 1 lane reduction, staged through VMEM scratch (the
    # direct 3-D lane-reduce -> store pattern trips this toolchain's
    # Mosaic remote-compile; see module docstring)
    dadj_scr[...] = jnp.sum(dpre * we[None, :, :], axis=-1)     # [Tc,S]
    dadjt_ref[0] = dadj_scr[...].astype(dadjt_ref.dtype)
    dwe_c = jnp.sum(jnp.sum(dpre * adjt[:, :, None], axis=0),
                    axis=0, keepdims=True)                      # [1,HF]
    datt_c = jnp.sum(jnp.sum(act * d_e_exp, axis=0),
                     axis=0, keepdims=True)                     # [1,HF]

    tc = pl.program_id(1)

    @pl.when(tc == 0)
    def _init():
        dxl_ref[0] = d_xl_c.astype(dxl_ref.dtype)
        dwe_ref[0] = dwe_c.astype(dwe_ref.dtype)
        datt_ref[0] = datt_c.astype(datt_ref.dtype)

    @pl.when(tc != 0)
    def _acc():
        dxl_ref[0] = (dxl_ref[0].astype(jnp.float32)
                      + d_xl_c).astype(dxl_ref.dtype)
        dwe_ref[0] = (dwe_ref[0].astype(jnp.float32)
                      + dwe_c).astype(dwe_ref.dtype)
        datt_ref[0] = (datt_ref[0].astype(jnp.float32)
                       + datt_c).astype(datt_ref.dtype)

    dxr_ref[0] = dxr_c.astype(dxr_ref.dtype)


def _head_mats(we, att):
    """A [HF,H] = att folded into the head indicator; E [H,HF] = the
    0/1 indicator itself (built host-side so the kernels never
    transpose)."""
    H, F = att.shape
    eye = jnp.eye(H, dtype=jnp.float32)
    E = jnp.repeat(eye, F, axis=1)                     # [H, HF]
    A = E.T * att.astype(jnp.float32).reshape(-1, 1)   # [HF, H]
    return A, E


def _pad_t(x, Tp, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, Tp - x.shape[axis])
    return jnp.pad(x, pad) if Tp != x.shape[axis] else x


def _pad8(n: int) -> int:
    """Sources padded to a multiple of 8 sublanes: an odd S (65) at the
    full HF lane width hangs this toolchain's Mosaic remote-compile
    (bisected 2026-08-21: F=100,S=65 hangs; F=100,S=72 compiles in
    seconds). Padded source rows carry mask 0, so they contribute
    nothing to softmax, output, or any gradient."""
    return -(-n // 8) * 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def flash_gat(xl: Array, xr: Array, adj: Array, mask: Array,
              we: Array, att: Array, ns: float,
              interpret: bool = False) -> Array:
    """Fused GATv2 attention. xl [B,S,H,F], xr [B,T,H,F], adj/mask
    [B,S,T], we/att [H,F]. Returns out [B,T,H,F] (no bias)."""
    out, _ = _flash_fwd_raw(xl, xr, adj, mask, we, att, ns, interpret)
    return out


def _in_specs(S, Tc, HF, H):
    return [
        pl.BlockSpec((1, S, HF), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),           # xl
        pl.BlockSpec((1, Tc, HF), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),           # xr
        pl.BlockSpec((1, Tc, S), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),           # adjT
        pl.BlockSpec((1, Tc, S), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),           # maskT
        pl.BlockSpec((1, HF), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),           # we
        pl.BlockSpec((1, HF), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),           # att
        pl.BlockSpec((HF, H), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),           # A / Et
        pl.BlockSpec((H, HF), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),           # E
    ]


def _flash_fwd_raw(xl, xr, adj, mask, we, att, ns, interpret):
    B, S, H, F = xl.shape
    T = xr.shape[1]
    HF = H * F
    dt = xl.dtype
    cdt = _cdt(dt)
    km = _sub_mult(cdt)
    Tc = _round_up(_tc(T), km)
    NT = -(-T // Tc)
    Tp = NT * Tc
    Sp = _round_up(S, km)
    xl2 = _pad_t(xl.reshape(B, S, HF), Sp, 1)
    xr2 = _pad_t(xr.reshape(B, T, HF), Tp, 1)
    adjt = _pad_t(_pad_t(adj.transpose(0, 2, 1), Tp, 1), Sp, 2)
    maskt = _pad_t(_pad_t(mask.astype(dt).transpose(0, 2, 1), Tp, 1),
                   Sp, 2)
    A, E = _head_mats(we, att)
    out, alpha = pl.pallas_call(
        functools.partial(_fwd_kernel, ns=ns, cdt=cdt),
        grid=(B, NT),
        in_specs=_in_specs(Sp, Tc, HF, H),
        out_specs=[
            pl.BlockSpec((1, Tc, HF), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tc, Sp, H), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, HF), dt),
            # alpha residual stays f32 regardless of compute dtype: the
            # backward's softmax-VJP reads it; a bf16 residual costs ~2
            # bf16-ulp extra gradient error vs the XLA path (measured)
            jax.ShapeDtypeStruct((B, Tp, Sp, H), jnp.float32),
        ],
        interpret=interpret,
    )(xl2, xr2, adjt, maskt, we.reshape(1, HF), att.reshape(1, HF),
      A, E)
    return out[:, :T].reshape(B, T, H, F), alpha


def _flash_vjp_fwd(xl, xr, adj, mask, we, att, ns, interpret):
    out, alpha = _flash_fwd_raw(xl, xr, adj, mask, we, att, ns, interpret)
    return out, (xl, xr, adj, mask, we, att, alpha)


def _flash_vjp_bwd(ns, interpret, res, dout):
    xl, xr, adj, mask, we, att, alpha = res
    B, S, H, F = xl.shape
    T = xr.shape[1]
    HF = H * F
    dt = xl.dtype
    cdt = _cdt(dt)
    km = _sub_mult(cdt)
    Tc = _round_up(_tc(T), km)
    NT = -(-T // Tc)
    Tp = NT * Tc
    Sp = _round_up(S, km)
    xl2 = _pad_t(xl.reshape(B, S, HF), Sp, 1)
    xr2 = _pad_t(xr.reshape(B, T, HF), Tp, 1)
    adjt = _pad_t(_pad_t(adj.transpose(0, 2, 1), Tp, 1), Sp, 2)
    maskt = _pad_t(_pad_t(mask.astype(dt).transpose(0, 2, 1), Tp, 1),
                   Sp, 2)
    dout2 = _pad_t(dout.reshape(B, T, HF), Tp, 1)
    A, E = _head_mats(we, att)
    Et = E.T   # pure 0/1 indicator for the d_alpha head-reduce
    specs = _in_specs(Sp, Tc, HF, H) + [
        pl.BlockSpec((1, Tc, Sp, H), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),           # alpha
        pl.BlockSpec((1, Tc, HF), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),           # dout
    ]
    dxl, dxr, dadjt, dwe_b, datt_b = pl.pallas_call(
        functools.partial(_bwd_kernel, ns=ns, cdt=cdt),
        grid=(B, NT),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, Sp, HF), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # dxl (acc over t)
            pl.BlockSpec((1, Tc, HF), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tc, Sp), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),   # dadjT
            pl.BlockSpec((1, 1, HF), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # dwe (acc over t)
            pl.BlockSpec((1, 1, HF), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # datt (acc over t)
        ],
        out_shape=[
            # dxl accumulates across target chunks: keep the running
            # sum f32 (a bf16 read-modify-write per chunk compounds
            # rounding ~NT-fold); cast once host-side
            jax.ShapeDtypeStruct((B, Sp, HF), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp, HF), dt),
            jax.ShapeDtypeStruct((B, Tp, Sp), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, HF), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, HF), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Tc, Sp), jnp.float32)],
        interpret=interpret,
    )(xl2, xr2, adjt, maskt, we.reshape(1, HF), att.reshape(1, HF),
      Et, E, alpha, dout2)
    dxl = dxl[:, :S].reshape(B, S, H, F).astype(dt)
    dxr = dxr[:, :T].reshape(B, T, H, F)
    dadj = dadjt[:, :T, :S].transpose(0, 2, 1).astype(adj.dtype)
    dwe = jnp.sum(dwe_b[:, 0, :], axis=0).reshape(H, F).astype(we.dtype)
    datt = jnp.sum(datt_b[:, 0, :], axis=0).reshape(H, F).astype(att.dtype)
    return dxl, dxr, dadj, None, dwe, datt


flash_gat.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)

"""Optimizer construction from ``exp_params``.

Replicates the reference's ``configure_optimizers``
(/root/reference/experiment.py:152-187):

* Adam(LR, weight_decay) over either all parameters or the submodule named
  by ``update_parameters`` — partial freezing is done the JAX way with
  ``optax.masked`` over the param pytree (no DDP ``find_unused_parameters``
  analogue is needed under SPMD),
* optional second Adam(LR_2) over the submodule named by ``submodel``
  (adversarial models, e.g. FactorVAE's discriminator),
* optional per-epoch ``ExponentialLR`` decay via ``scheduler_gamma`` /
  ``scheduler_gamma_2`` — expressed as an optax schedule over *steps*
  given ``steps_per_epoch``,
* the PL Trainer knobs ``gradient_clip_val`` (torch ``clip_grad_norm_``
  semantics) and ``accumulate_grad_batches`` (k-microbatch gradient
  averaging via ``optax.MultiSteps``), routed here from
  ``trainer_params`` by ``run.py``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import optax


def _subtree_mask(params: Any, prefix: Optional[str]):
    """Boolean pytree: True for leaves under the top-level key ``prefix``."""
    if prefix is None:
        return jax.tree_util.tree_map(lambda _: True, params)
    flat = {k: jax.tree_util.tree_map(lambda _: k == prefix or k.startswith(prefix), v)
            for k, v in params.items()}
    return flat


def _exp_schedule(lr: float, gamma: float, steps_per_epoch: int):
    """Per-epoch ExponentialLR as an optax step schedule.

    ``gamma == 0.0`` must reproduce torch semantics — LR becomes 0 from
    the second epoch on (lr * 0**epoch). The reference's VQVAE config
    ships scheduler_gamma: 0.0 (/root/reference/configs/vq_vae.yaml:20)
    and its Trainer really does kill the LR after epoch 1; optax's
    exponential_decay would silently special-case 0 to a constant.
    """
    spe = max(1, steps_per_epoch)
    if gamma == 0.0:
        return lambda step: lr * (step < spe)
    return optax.exponential_decay(
        init_value=lr, transition_steps=spe, decay_rate=gamma,
        staircase=True)


def clip_grad_norm(max_norm: float) -> optax.GradientTransformation:
    """torch ``clip_grad_norm_`` semantics — the PL Trainer's
    ``gradient_clip_val`` knob, shipped by the reference's gammavae and
    infovae configs (/root/reference/configs/gammavae.yaml:22): scale
    every gradient by ``max_norm / (total_norm + 1e-6)`` when that
    factor is < 1. Differs from ``optax.clip_by_global_norm`` in the
    torch-default ``+1e-6`` denominator."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        leaves = jax.tree_util.tree_leaves(updates)
        total = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
        coef = jnp.minimum(max_norm / (total + 1e-6), 1.0)
        return jax.tree_util.tree_map(lambda g: g * coef, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _adam(lr: float, weight_decay: float, gamma: Optional[float],
          steps_per_epoch: int,
          clip: Optional[float] = None) -> optax.GradientTransformation:
    if gamma is not None:
        schedule = _exp_schedule(lr, gamma, steps_per_epoch)
    else:
        schedule = lr
    chain = []
    if clip:
        # PL clips raw gradients BEFORE the optimizer step, so the clip
        # precedes the coupled-L2 weight-decay addition.
        chain.append(clip_grad_norm(clip))
    if weight_decay:
        # torch ``Adam(weight_decay=wd)`` is *coupled* L2: ``wd * param``
        # is added to the gradient BEFORE the moment updates
        # (/root/reference/experiment.py:154-156 uses torch.optim.Adam,
        # not AdamW). optax.adamw would decay *after* normalization —
        # a silent semantic divergence — so chain the decay in front.
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.adam(schedule))
    return chain[0] if len(chain) == 1 else optax.chain(*chain)


def build_lr_schedules(exp_params: Dict[str, Any],
                       steps_per_epoch: int = 1) -> List[Any]:
    """Step -> learning-rate callables mirroring ``build_optimizers``'s
    schedules, for observability (the reference attaches a
    ``LearningRateMonitor`` callback, /root/reference/run.py:93)."""
    def sched(lr, gamma):
        if gamma is None:
            return lambda step: lr
        return _exp_schedule(lr, gamma, steps_per_epoch)
    accum = int(exp_params.get("accumulate_grad_batches", 1) or 1)
    if accum > 1:
        # the inner optimizer only counts real updates: global step k*i
        # .. k*i+k-1 all see the LR of optimizer step i
        steps_per_epoch = max(1, steps_per_epoch // accum)
        base = sched
        sched = lambda lr, gamma: (  # noqa: E731
            lambda step, _s=base(lr, gamma): _s(step // accum))
    out = [sched(exp_params.get("LR", 1e-3),
                 exp_params.get("scheduler_gamma"))]
    if exp_params.get("LR_2") is not None:
        out.append(sched(exp_params["LR_2"],
                         exp_params.get("scheduler_gamma_2")))
    return out


def build_optimizers(
    exp_params: Dict[str, Any],
    params: Any,
    steps_per_epoch: int = 1,
) -> List[optax.GradientTransformation]:
    """Returns a list of 1 or 2 gradient transformations."""
    lr = exp_params.get("LR", 1e-3)
    weight_decay = exp_params.get("weight_decay", 0.0)
    gamma = exp_params.get("scheduler_gamma")
    update_parameters = exp_params.get("update_parameters")
    # PL Trainer knob (run.py forwards it from trainer_params). Scope is
    # PER-OPTIMIZER, exactly like PL: Lightning clips each optimizer's
    # param groups, and with update_parameters/submodel the reference's
    # optimizer holds ONLY that submodule's params
    # (/root/reference/experiment.py:157,165) — so clipping inside the
    # optax.masked chain (norm over the trainable subtree) is the
    # faithful semantics, not a deviation.
    clip = exp_params.get("gradient_clip_val")
    # PL Trainer ``accumulate_grad_batches``: average k microbatch grads,
    # apply ONE optimizer step per k train steps (run.py routes the knob
    # from trainer_params). optax.MultiSteps holds the running mean; the
    # clip/decay/Adam chain — and the LR schedule's step count — only
    # advance on the k-th call, exactly Lightning's accumulation order
    # (clip at optimizer-step time, after averaging).
    accum = int(exp_params.get("accumulate_grad_batches", 1) or 1)
    if accum > 1:
        steps_per_epoch = max(1, steps_per_epoch // accum)

    tx = _adam(lr, weight_decay, gamma, steps_per_epoch, clip=clip)
    if update_parameters is not None:
        mask = _subtree_mask(params, update_parameters)
        tx = optax.chain(
            optax.masked(tx, mask),
            # zero out everything not in the trained submodule
            optax.masked(optax.set_to_zero(),
                         jax.tree_util.tree_map(lambda b: not b, mask)),
        )
    txs = [tx]

    if exp_params.get("LR_2") is not None:
        submodel = exp_params.get("submodel")
        gamma2 = exp_params.get("scheduler_gamma_2")
        tx2 = _adam(exp_params["LR_2"], 0.0, gamma2, steps_per_epoch,
                    clip=clip)
        if submodel is not None:
            mask2 = _subtree_mask(params, submodel)
            tx2 = optax.chain(
                optax.masked(tx2, mask2),
                optax.masked(optax.set_to_zero(),
                             jax.tree_util.tree_map(lambda b: not b, mask2)),
            )
        txs.append(tx2)
    if accum > 1:
        txs = [_multisteps(tx, accum) for tx in txs]
    return txs


def _multisteps(tx: optax.GradientTransformation,
                k: int) -> optax.GradientTransformation:
    """Wrap ``tx`` so it applies once per ``k`` calls, on the mean of the
    ``k`` gradients; intermediate calls return zero updates."""
    ms = optax.MultiSteps(tx, every_k_schedule=k)
    return optax.GradientTransformation(ms.init, ms.update)

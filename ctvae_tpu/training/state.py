"""Functional train state + jittable train/eval step factories.

This replaces the reference's PyTorch-Lightning ``VAEXperiment``
(/root/reference/experiment.py:17-187) hot path with a single pure
function: forward -> loss -> grad -> optax update. Everything the
reference does with Python-side mutable state (BatchNorm running stats,
annealing counters, two optimizers for adversarial models, partial
freezing via ``update_parameters``, frozen feature networks) is explicit
state here, so the whole step compiles once under ``jax.jit`` and runs
SPMD over a device mesh.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.base import BaseVAE, RNG_STREAMS

Array = jax.Array


class TrainState(struct.PyTreeNode):
    """All mutable training state as one pytree.

    ``model_state`` holds every non-``params`` variable collection
    (BatchNorm ``batch_stats``, EMA-quantizer ``vq_stats``, frozen
    feature-network constants, ...); only ``batch_stats`` and
    ``vq_stats`` are treated as mutable during the step.

    ``opt_states`` is a tuple to support adversarial models that train two
    parameter groups with two optimizers (reference FactorVAE,
    /root/reference/experiment.py:163-167); single-optimizer models use a
    1-tuple.
    """

    step: Array                    # global step, drives annealing schedules
    params: Any
    model_state: Dict[str, Any]    # non-params collections
    opt_states: Tuple[Any, ...]
    rng: Array                     # base PRNG key, folded with step each step


def model_rngs(base: Array, step: Array) -> Dict[str, Array]:
    """Per-step named PRNG streams for the model's stochastic ops."""
    key = jax.random.fold_in(base, step)
    keys = jax.random.split(key, len(RNG_STREAMS))
    return dict(zip(RNG_STREAMS, keys))


def _batch_kwargs(batch: Dict[str, Array], keys: Sequence[str]) -> Dict[str, Array]:
    return {k: batch[k] for k in keys if k in batch}


def create_train_state(
    model: BaseVAE,
    rng: Array,
    sample_batch: Dict[str, Array],
    txs: Sequence[optax.GradientTransformation],
    fwd_kwargs_keys: Sequence[str] = (),
) -> TrainState:
    """Initialize parameters with a sample batch and build opt states.

    The init itself is jitted — eager op-by-op initialization of a large
    model dispatches thousands of tiny kernels on TPU (observed 150+ s
    for CTMCQVAE; ~2 s jitted).
    """
    init_rngs = {"params": rng, **model_rngs(rng, jnp.array(0))}
    kwargs = _batch_kwargs(sample_batch, fwd_kwargs_keys)
    kw_names = sorted(kwargs)

    @jax.jit
    def _init(rngs, image, *kw_values):
        return model.init(rngs, image, train=True,
                          **dict(zip(kw_names, kw_values)))

    variables = _init(init_rngs, sample_batch["image"],
                      *[kwargs[k] for k in kw_names])
    variables = dict(variables)
    params = variables.pop("params")
    opt_states = tuple(tx.init(params) for tx in txs)
    return TrainState(step=jnp.array(0, jnp.int32), params=params,
                      model_state=variables, opt_states=opt_states, rng=rng)


def make_train_step(
    model: BaseVAE,
    txs: Sequence[optax.GradientTransformation],
    *,
    M_N: float,
    optimizer_idx: int = 0,
    fwd_kwargs_keys: Sequence[str] = ("labels",),
    static_fwd_kwargs: Optional[Dict[str, Any]] = None,
    watch_modules: bool = False,
) -> Callable[[TrainState, Dict[str, Array]], Tuple[TrainState, Dict[str, Array]]]:
    """Build a jittable train step.

    ``watch_modules=True`` adds per-top-level-module gradient and
    parameter norms (``grad_norm/<module>``, ``param_norm/<module>``)
    to the returned metrics — the per-parameter observability the
    reference gets from ``wb_logger.watch(model, log_freq=500)``
    (/root/reference/run.py:55). Computed inside the jitted step (one
    fused reduction per module, negligible next to the model step); the
    experiment layer throttles how often they are WRITTEN
    (``exp_params.watch_gradients``).

    The reference passes ``M_N=kld_weight`` plus ``optimizer_idx`` /
    ``batch_idx`` into every ``loss_function``
    (/root/reference/experiment.py:51-54); here ``M_N`` and
    ``optimizer_idx`` are compile-time constants of the step, and the
    ``batch_idx`` role (annealing schedules) is played by ``state.step``,
    which is also forwarded to the model as the ``step`` kwarg.
    """
    static_fwd_kwargs = dict(static_fwd_kwargs or {})
    tx = txs[optimizer_idx]

    def step_fn(state: TrainState, batch: Dict[str, Array]):
        rngs = model_rngs(state.rng, state.step)
        kwargs = _batch_kwargs(batch, fwd_kwargs_keys)
        kwargs.update(static_fwd_kwargs)
        # collections the forward pass may write: BatchNorm running stats
        # and (EMA-mode quantizers) the vq_stats codebook statistics
        mut_cols = [c for c in ("batch_stats", "vq_stats")
                    if c in state.model_state]

        def loss_fn(params):
            variables = {"params": params, **state.model_state}
            if mut_cols:
                outputs, mutated = model.apply(
                    variables, batch["image"], train=True, rngs=rngs,
                    step=state.step, mutable=mut_cols, **kwargs)
                new_ms = {**state.model_state, **mutated}
            else:
                outputs = model.apply(variables, batch["image"], train=True,
                                      rngs=rngs, step=state.step, **kwargs)
                new_ms = state.model_state
            losses = model.loss_function(
                outputs, M_N=M_N, step=state.step, train=True,
                optimizer_idx=optimizer_idx, rng=rngs["noise"])
            return losses["loss"], (losses, new_ms)

        (loss, (losses, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # observability stand-in for the reference's wandb.watch gradient
        # tracking (run.py:55): one fused reduction, logged every step
        losses["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_states[optimizer_idx],
                                     state.params)
        new_params = optax.apply_updates(state.params, updates)
        if watch_modules:
            # per-top-level-module norms: distinguishes a frozen
            # backbone (zero grads) from a live ct_layer in the CT
            # two-stage recipe, which one global scalar cannot
            for k, v in dict(grads).items():
                losses[f"grad_norm/{k}"] = optax.global_norm(v)
            for k, v in dict(new_params).items():
                losses[f"param_norm/{k}"] = optax.global_norm(v)
        opt_states = tuple(
            new_opt if i == optimizer_idx else s
            for i, s in enumerate(state.opt_states))
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  model_state=new_ms, opt_states=opt_states)
        return new_state, _split_scalars(losses)

    return step_fn


def make_multi_train_step(
    model: BaseVAE,
    txs: Sequence[optax.GradientTransformation],
    *,
    n_steps: int,
    M_N: float,
    optimizer_idx: int = 0,
    fwd_kwargs_keys: Sequence[str] = ("labels",),
    static_fwd_kwargs: Optional[Dict[str, Any]] = None,
    watch_modules: bool = False,
) -> Callable[[TrainState, Dict[str, Array]], Tuple[TrainState, Dict[str, Array]]]:
    """``n_steps`` train steps in ONE compiled program via ``lax.scan``.

    Takes a stacked batch dict (every leaf ``[n_steps, B, ...]``) and
    runs the same step as :func:`make_train_step` over it, returning the
    LAST step's metrics. One executable launch per ``n_steps`` steps:
    through a remote-chip tunnel, per-launch dispatch latency is a real
    per-step floor (measured ~5 ms/step on the causal CT step,
    BENCH_r05 ``ct_causal_breakdown_ms.dispatch_idle_ms``), and the
    scan amortizes it n_steps-fold. Semantics match n_steps sequential
    calls exactly: the per-step PRNG folds ``state.step``, which the
    scan body advances.

    No reference counterpart (a synchronous CUDA queue hides dispatch);
    this is TPU-tunnel/production hardening, used by bench.py's
    ``*_scan8`` tiers and ``exp_params.scan_steps``.
    """
    step_fn = make_train_step(model, txs, M_N=M_N,
                              optimizer_idx=optimizer_idx,
                              fwd_kwargs_keys=fwd_kwargs_keys,
                              static_fwd_kwargs=static_fwd_kwargs,
                              watch_modules=watch_modules)

    def multi_fn(state: TrainState, batches: Dict[str, Array]):
        state, metrics = jax.lax.scan(step_fn, state, batches,
                                      length=n_steps)
        return state, jax.tree_util.tree_map(lambda x: x[-1], metrics)

    return multi_fn


def make_eval_step(
    model: BaseVAE,
    *,
    M_N: float = 1.0,
    fwd_kwargs_keys: Sequence[str] = ("labels",),
    static_fwd_kwargs: Optional[Dict[str, Any]] = None,
):
    """Validation step: forward with running BN stats, loss with M_N=1.0
    (reference /root/reference/experiment.py:61-74)."""
    static_fwd_kwargs = dict(static_fwd_kwargs or {})

    def step_fn(state: TrainState, batch: Dict[str, Array]):
        rngs = model_rngs(state.rng, state.step + jnp.array(1 << 20, jnp.int32))
        kwargs = _batch_kwargs(batch, fwd_kwargs_keys)
        kwargs.update(static_fwd_kwargs)
        variables = {"params": state.params, **state.model_state}
        outputs = model.apply(variables, batch["image"], train=False,
                              rngs=rngs, step=state.step, **kwargs)
        losses = model.loss_function(outputs, M_N=M_N, step=state.step,
                                     train=False, optimizer_idx=0,
                                     rng=rngs["noise"])
        return _split_scalars(losses)

    return step_fn


def _split_scalars(losses: Dict[str, Any]) -> Dict[str, Array]:
    """Keep numeric entries (scalars plus image-like diagnostics); drop
    strings (the reference drops the ``mode`` key the same way,
    /root/reference/experiment.py:93-107)."""
    return {k: v for k, v in losses.items() if not isinstance(v, str)}

"""Mesh/sharding tests: pure-DP and DP x TP training steps on the
8-device virtual mesh, and the param-sharding rule engine."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ctvae_tpu.models import vae_models
from ctvae_tpu.parallel import (DATA_AXIS, MODEL_AXIS, REPLICA_AXIS,
                                batch_sharding, fsdp_shardings,
                                make_hybrid_mesh, make_mesh,
                                param_shardings, pin_state_shardings,
                                replicated, shard_batch, shard_params,
                                shard_params_fsdp)
from ctvae_tpu.training import create_train_state, make_train_step

FWD_KEYS = ("action", "input_y")


def _ct_model():
    return vae_models["CTMCQVAE"](
        in_channels=3, embedding_dim=8, action_dim=4, num_embeddings=8,
        hidden_dims=(8, 16), img_size=16, codebooks=2,
        causal_hidden_dims=(16, 8))


def _batch(model, b, img=16):
    rng = jax.random.PRNGKey(0)
    return {
        "image": jax.random.uniform(rng, (b, img, img, 3)),
        "input_y": jax.random.uniform(rng, (b, img, img, 3)),
        "action": jax.nn.one_hot(
            jax.random.randint(rng, (b,), 0, model.action_dim),
            model.action_dim),
    }


def test_param_shardings_rules(devices):
    mesh = make_mesh(devices, model_axis=2)
    model = _ct_model()
    batch = _batch(model, 8)
    state = create_train_state(model, jax.random.PRNGKey(0), batch,
                               [optax.adam(1e-3)], fwd_kwargs_keys=FWD_KEYS)
    shardings = param_shardings(jax.device_get(state.params), mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded, total = 0, 0
    for path, sh in flat:
        total += 1
        name = str(path[-1].key)
        spec = sh.spec
        if name in ("disc_w1l", "disc_w1r", "disc_b1", "embedding"):
            assert MODEL_AXIS in tuple(spec), (name, spec)
            sharded += 1
        else:
            assert all(s is None for s in tuple(spec)), (name, spec)
    assert sharded >= 5  # 3 discoverer leaves + 2 codebooks


def test_tp_step_matches_dp_step(devices):
    """One action-mode step on a (4,2) DP x TP mesh must produce the same
    loss as on the (8,1) pure-DP mesh — sharding is a layout, not math."""
    model = _ct_model()
    batch = _batch(model, 8)
    txs = [optax.adam(1e-3)]

    losses = {}
    for model_axis in (1, 2):
        mesh = make_mesh(devices, model_axis=model_axis)
        state = create_train_state(model, jax.random.PRNGKey(0), batch, txs,
                                   fwd_kwargs_keys=FWD_KEYS)
        with mesh:
            params = (shard_params(jax.device_get(state.params), mesh)
                      if model_axis > 1 else
                      jax.device_put(state.params, replicated(mesh)))
            opt_states = tuple(tx.init(params) for tx in txs)
            state = state.replace(
                params=params, opt_states=opt_states,
                step=jax.device_put(state.step, replicated(mesh)),
                rng=jax.device_put(state.rng, replicated(mesh)),
                model_state=jax.device_put(
                    jax.device_get(state.model_state), replicated(mesh)))
            sbatch = shard_batch(batch, mesh)
            step = jax.jit(make_train_step(
                model, txs, M_N=0.005, fwd_kwargs_keys=FWD_KEYS,
                static_fwd_kwargs={"mode": "action"}))
            state, metrics = step(state, sbatch)
            losses[model_axis] = float(metrics["loss"])
    np.testing.assert_allclose(losses[1], losses[2], rtol=1e-4)


def test_sp_step_matches_dp_step(devices):
    """Sequence parallelism (seq_axis="model": the CT attention/pairwise
    target-node axis sharded over a 4-way model axis) must produce the
    same loss as pure DP in every mode — the constraints change layout,
    not math — and the lowered step must actually carry the
    sharding-constraint ops (else SP silently degenerated to DP)."""
    batch = _batch(_ct_model(), 8)
    txs = [optax.adam(1e-3)]

    losses = {}
    for variant, (seq_axis, model_axis) in {
            "dp": (None, 1), "sp": (MODEL_AXIS, 4)}.items():
        model = vae_models["CTMCQVAE"](
            in_channels=3, embedding_dim=8, action_dim=4, num_embeddings=8,
            hidden_dims=(8, 16), img_size=16, codebooks=2,
            causal_hidden_dims=(16, 8), seq_axis=seq_axis)
        mesh = make_mesh(devices, model_axis=model_axis)
        state = create_train_state(model, jax.random.PRNGKey(0), batch, txs,
                                   fwd_kwargs_keys=FWD_KEYS)
        with mesh:
            sbatch = shard_batch(batch, mesh)
            state = jax.device_put(state, replicated(mesh))
            for mode in ("base", "action", "causal"):
                step = jax.jit(make_train_step(
                    model, txs, M_N=0.005, fwd_kwargs_keys=FWD_KEYS,
                    static_fwd_kwargs={"mode": mode}))
                n_constraints = step.lower(state, sbatch).as_text().count(
                    "sharding_constraint")
                if variant == "sp":
                    # every mode builds the O(S^2) pairwise + GAT domains
                    # (base's identity fast path replaces only the
                    # regularizer pass): 2 pairwise + >= 2 GAT sites
                    assert n_constraints >= 4, (mode, n_constraints)
                state, metrics = step(state, sbatch)
                losses[(variant, mode)] = float(metrics["loss"])
    for mode in ("base", "action", "causal"):
        np.testing.assert_allclose(losses[("dp", mode)],
                                   losses[("sp", mode)], rtol=1e-4,
                                   err_msg=mode)


def test_sp_shrinks_per_device_attention_memory(devices):
    """The point of sequence parallelism: on an IDENTICAL (2, 4) mesh,
    turning seq_axis on must cut the per-device temp memory of the
    causal train step (whose [A*B, S, T, H] attention workspaces
    dominate at S = 128) by ~the model-axis factor. Compile-only —
    XLA's memory analysis is the assertion, no step is executed."""
    temp = {}
    for variant in ("off", "sp"):
        model = vae_models["CTMCQVAE"](
            in_channels=3, embedding_dim=8, action_dim=4, num_embeddings=8,
            hidden_dims=(8, 16), img_size=32, codebooks=2,
            causal_hidden_dims=(32, 16),
            seq_axis=MODEL_AXIS if variant == "sp" else None)
        batch = _batch(model, 8, img=32)
        txs = [optax.adam(1e-3)]
        mesh = make_mesh(devices, model_axis=4)
        state = create_train_state(model, jax.random.PRNGKey(0), batch, txs,
                                   fwd_kwargs_keys=FWD_KEYS)
        with mesh:
            sbatch = shard_batch(batch, mesh)
            state = jax.device_put(state, replicated(mesh))
            step = jax.jit(make_train_step(
                model, txs, M_N=0.005, fwd_kwargs_keys=FWD_KEYS,
                static_fwd_kwargs={"mode": "causal"}))
            analysis = step.lower(state, sbatch).compile().memory_analysis()
            temp[variant] = analysis.temp_size_in_bytes
    # measured 474 MB -> 162 MB (2.9x) at these shapes; assert a safe 2x
    assert temp["sp"] * 2 < temp["off"], temp


def test_fsdp_shardings_split_large_leaves(devices):
    """Every leaf >= min_size with a divisible axis is split over `data`;
    TP-ruled leaves keep their `model` split and gain a `data` split on a
    different axis (ZeRO-3 composed with TP)."""
    mesh = make_mesh(devices, model_axis=2)
    model = _ct_model()
    batch = _batch(model, 8)
    state = create_train_state(model, jax.random.PRNGKey(0), batch,
                               [optax.adam(1e-3)], fwd_kwargs_keys=FWD_KEYS)
    params = jax.device_get(state.params)
    shardings = fsdp_shardings(params, mesh, min_size=64)
    n_data = n_both = 0
    for (path, sh), (_, leaf) in zip(
            jax.tree_util.tree_flatten_with_path(shardings)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        spec = tuple(sh.spec)
        axes = [a for a in spec if a is not None]
        if leaf.size < 64:
            assert DATA_AXIS not in axes, (path, spec)
        for ax, s in zip(spec, leaf.shape):
            if ax == DATA_AXIS:
                assert s % mesh.shape[DATA_AXIS] == 0, (path, spec)
            if ax == MODEL_AXIS:
                assert s % mesh.shape[MODEL_AXIS] == 0, (path, spec)
        n_data += DATA_AXIS in axes
        n_both += DATA_AXIS in axes and MODEL_AXIS in axes
    assert n_data >= 10   # the conv kernels and MLP weights all qualify
    assert n_both >= 1    # at least one leaf carries both splits


def test_fsdp_step_matches_dp_step(devices):
    """One action-mode step with params + Adam moments fully sharded over
    the 8-way data axis must produce the same loss as pure DP, and the
    updated params must come back with their FSDP layout intact."""
    model = _ct_model()
    batch = _batch(model, 8)
    txs = [optax.adam(1e-3)]
    mesh = make_mesh(devices)

    losses = {}
    for variant in ("dp", "fsdp"):
        state = create_train_state(model, jax.random.PRNGKey(0), batch, txs,
                                   fwd_kwargs_keys=FWD_KEYS)
        with mesh:
            params = (shard_params_fsdp(jax.device_get(state.params), mesh,
                                        min_size=64)
                      if variant == "fsdp" else
                      jax.device_put(state.params, replicated(mesh)))
            opt_states = tuple(tx.init(params) for tx in txs)
            state = state.replace(
                params=params, opt_states=opt_states,
                step=jax.device_put(state.step, replicated(mesh)),
                rng=jax.device_put(state.rng, replicated(mesh)),
                model_state=jax.device_put(
                    jax.device_get(state.model_state), replicated(mesh)))
            sbatch = shard_batch(batch, mesh)
            step_fn = make_train_step(
                model, txs, M_N=0.005, fwd_kwargs_keys=FWD_KEYS,
                static_fwd_kwargs={"mode": "action"})
            if variant == "fsdp":
                step_fn = pin_state_shardings(step_fn, state)
            step = jax.jit(step_fn)
            in_shardings = jax.tree_util.tree_map(
                lambda a: a.sharding, state.params)
            state, metrics = step(state, sbatch)
            losses[variant] = float(metrics["loss"])
            if variant == "fsdp":
                out_flat = jax.tree_util.tree_leaves(state.params)
                in_flat = jax.tree_util.tree_leaves(in_shardings)
                n_sharded = 0
                for leaf, sh in zip(out_flat, in_flat):
                    assert leaf.sharding.is_equivalent_to(sh, leaf.ndim), (
                        leaf.shape, leaf.sharding, sh)
                    n_sharded += not sh.is_fully_replicated
                assert n_sharded >= 10
    np.testing.assert_allclose(losses["dp"], losses["fsdp"], rtol=1e-4)


def test_hybrid_mesh_shapes_and_batch_spec(devices):
    """A 2-slice hybrid mesh is (replica=2, data=4, model=1) over 8
    devices, the batch sharding spans (replica, data) jointly, and FSDP
    shardings never touch the replica (DCN) axis — ZeRO all-gathers must
    stay on ICI."""
    mesh = make_hybrid_mesh(2, devices=devices)
    assert mesh.axis_names == (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS)
    assert mesh.shape[REPLICA_AXIS] == 2
    assert mesh.shape[DATA_AXIS] == 4
    assert mesh.shape[MODEL_AXIS] == 1
    assert tuple(batch_sharding(mesh).spec) == ((REPLICA_AXIS, DATA_AXIS),)

    model = _ct_model()
    batch = _batch(model, 8)
    state = create_train_state(model, jax.random.PRNGKey(0), batch,
                               [optax.adam(1e-3)], fwd_kwargs_keys=FWD_KEYS)
    shardings = fsdp_shardings(jax.device_get(state.params), mesh,
                               min_size=64)
    n_data = 0
    for _, sh in jax.tree_util.tree_flatten_with_path(shardings)[0]:
        axes = [a for a in tuple(sh.spec) if a is not None]
        assert REPLICA_AXIS not in axes, sh.spec
        n_data += DATA_AXIS in axes
    assert n_data >= 10


def test_hybrid_mesh_step_matches_dp_step(devices):
    """One action-mode step on the (2, 4, 1) hybrid multi-slice mesh
    must produce the same loss as on the flat (8, 1) DP mesh — the DCN
    replica axis only changes which links the gradient reduction rides.
    The hybrid_fsdp variant additionally ZeRO-shards params + Adam
    moments over the intra-slice data axis (the composition the README
    advertises) and must keep both the loss and the FSDP layout."""
    model = _ct_model()
    batch = _batch(model, 8)
    txs = [optax.adam(1e-3)]

    losses = {}
    for variant in ("flat", "hybrid", "hybrid_fsdp"):
        mesh = (make_mesh(devices) if variant == "flat"
                else make_hybrid_mesh(2, devices=devices))
        state = create_train_state(model, jax.random.PRNGKey(0), batch, txs,
                                   fwd_kwargs_keys=FWD_KEYS)
        with mesh:
            params = (shard_params_fsdp(jax.device_get(state.params), mesh,
                                        min_size=64)
                      if variant == "hybrid_fsdp" else
                      jax.device_put(state.params, replicated(mesh)))
            opt_states = tuple(tx.init(params) for tx in txs)
            state = state.replace(
                params=params, opt_states=opt_states,
                step=jax.device_put(state.step, replicated(mesh)),
                rng=jax.device_put(state.rng, replicated(mesh)),
                model_state=jax.device_put(
                    jax.device_get(state.model_state), replicated(mesh)))
            sbatch = shard_batch(batch, mesh)
            assert sbatch["image"].sharding.is_equivalent_to(
                batch_sharding(mesh), sbatch["image"].ndim)
            step_fn = make_train_step(
                model, txs, M_N=0.005, fwd_kwargs_keys=FWD_KEYS,
                static_fwd_kwargs={"mode": "action"})
            if variant == "hybrid_fsdp":
                step_fn = pin_state_shardings(step_fn, state)
            step = jax.jit(step_fn)
            in_shardings = jax.tree_util.tree_map(
                lambda a: a.sharding, state.params)
            state, metrics = step(state, sbatch)
            losses[variant] = float(metrics["loss"])
            if variant == "hybrid_fsdp":
                n_sharded = 0
                for leaf, sh in zip(
                        jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(in_shardings)):
                    assert leaf.sharding.is_equivalent_to(sh, leaf.ndim), (
                        leaf.shape, leaf.sharding, sh)
                    n_sharded += not sh.is_fully_replicated
                assert n_sharded >= 10
    np.testing.assert_allclose(losses["flat"], losses["hybrid"], rtol=1e-4)
    np.testing.assert_allclose(losses["flat"], losses["hybrid_fsdp"],
                               rtol=1e-4)

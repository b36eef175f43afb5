"""End-to-end orchestration tests: VAEXperiment fit/validate/checkpoint/
weights-only restore on the synthetic dataset — the integration coverage
the reference never had (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from ctvae_tpu.data import VAEDataset
from ctvae_tpu.models import build_model
from ctvae_tpu.training import VAEXperiment
from ctvae_tpu.utils import CheckpointManager, ExperimentLogger
from ctvae_tpu.utils.checkpoint import load_weights_only


def _tiny_experiment(tmp_path, dataset="Synthetic", model_params=None,
                     exp_params=None, logger=False):
    model = build_model(model_params or {
        "name": "VanillaVAE", "in_channels": 3, "latent_dim": 8,
        "hidden_dims": [8, 16], "img_size": 16})
    # limit=32: caps per-mode samples/epoch — on the 8-virtual-device
    # single-core CPU mesh, long CT epochs overrun XLA's 40 s collective
    # rendezvous timeout and abort the process
    data = VAEDataset(data_path="", dataset_name=dataset,
                      train_batch_size=16, val_batch_size=8,
                      patch_size=16, n=96, limit=32, val_limit=16)
    data.setup()
    lg = ExperimentLogger(str(tmp_path), "t") if logger else None
    ckpt = CheckpointManager(os.path.join(str(tmp_path), "ck"), top_k=2)
    exp = VAEXperiment(model, exp_params or {"LR": 1e-3,
                                             "kld_weight": 0.005},
                       data, logger=lg, ckpt_manager=ckpt, log_every=1)
    return exp, ckpt


def test_fit_trains_and_checkpoints(tmp_path):
    exp, ckpt = _tiny_experiment(tmp_path)
    val = exp.fit(max_epochs=2)
    assert "val_loss" in val and np.isfinite(val["val_loss"])
    assert os.path.isdir(os.path.join(ckpt.dir, "last"))
    with open(os.path.join(ckpt.dir, "index.json")) as f:
        index = json.load(f)
    assert len(index["best"]) >= 1
    # best checkpoint tracks the minimum monitored score over all epochs
    assert index["best"][0]["score"] <= val["val_Reconstruction_Loss"] + 1e-6


def test_watch_gradients_logs_per_module_norms(tmp_path):
    """exp_params.watch_gradients: N — per-top-level-module grad/param
    norms on their own N-step cadence (the reference's
    wb_logger.watch(model, log_freq=500), /root/reference/run.py:55)."""
    exp, _ = _tiny_experiment(
        tmp_path, logger=True,
        exp_params={"LR": 1e-3, "kld_weight": 0.005,
                    "watch_gradients": 2})
    calls = []
    orig = exp.logger.log_all
    exp.logger.log_all = lambda vals, step, **kw: (
        calls.append((step, dict(vals))), orig(vals, step, **kw))[-1]
    exp.fit(max_epochs=1)

    modules = set(exp.state.params.keys())
    assert modules, "expected top-level param modules"
    want = ({f"grad_norm/{m}" for m in modules}
            | {f"param_norm/{m}" for m in modules})
    train_calls = [(s, v) for s, v in calls if "loss" in v or any(
        k.startswith("grad_norm/") for k in v)]
    watched = [(s, v) for s, v in train_calls
               if any(k.startswith("grad_norm/") for k in v)]
    unwatched = [(s, v) for s, v in train_calls
                 if not any(k.startswith("grad_norm/") for k in v)
                 and "val_loss" not in v]
    assert watched and unwatched
    for s, v in watched:
        assert s % 2 == 0
        got = {k for k in v if k.startswith(("grad_norm/", "param_norm/"))}
        assert got == want, (got, want)
        for k in want:
            assert np.isfinite(v[k])
    # off-cadence steps never carry the per-module keys
    for s, v in unwatched:
        assert s % 2 == 1


def test_fit_fsdp_trains_and_resumes(tmp_path):
    """exp_params.sharding: fsdp — full orchestrated training with
    params + Adam moments ZeRO-sharded over the 8-device data axis:
    trains, keeps the sharded layout across steps, and a full-state
    resume restores INTO that layout."""
    import jax

    exp, ckpt = _tiny_experiment(
        tmp_path, exp_params={"LR": 1e-3, "kld_weight": 0.005,
                              "sharding": "fsdp", "fsdp_min_size": 64})
    val = exp.fit(max_epochs=1)
    assert np.isfinite(val["val_loss"])
    sharded = [p for p in jax.tree_util.tree_leaves(exp.state.params)
               if not p.sharding.is_fully_replicated]
    assert len(sharded) >= 5
    m_leaves = jax.tree_util.tree_leaves(exp.state.opt_states)
    assert any(hasattr(m, "sharding") and not m.sharding.is_fully_replicated
               for m in m_leaves)          # Adam moments sharded too

    exp2, _ = _tiny_experiment(
        tmp_path, exp_params={"LR": 1e-3, "kld_weight": 0.005,
                              "sharding": "fsdp", "fsdp_min_size": 64})
    first = next(iter(exp2.data.train_dataloader(0)))
    exp2.setup(first)
    exp2.restore_full_state("last")
    for a, b in zip(jax.tree_util.tree_leaves(exp.state.params),
                    jax.tree_util.tree_leaves(exp2.state.params)):
        assert b.sharding.is_equivalent_to(a.sharding, b.ndim)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # DP run over the same data/seed reaches the same loss (rtol covers
    # reduce-scatter vs all-reduce summation-order drift over an epoch;
    # the strict single-step pin lives in test_parallel.py)
    exp3, _ = _tiny_experiment(tmp_path / "dp")
    val3 = exp3.fit(max_epochs=1)
    np.testing.assert_allclose(val["val_loss"], val3["val_loss"],
                               rtol=2e-3)


def test_fit_hybrid_mesh_trains(tmp_path):
    """exp_params.dcn_replicas: 2 — the orchestrator builds the hybrid
    (replica, data, model) multi-slice mesh and trains on it, composed
    with FSDP keyed off the intra-slice data axis only."""
    import jax

    from ctvae_tpu.parallel import DATA_AXIS, REPLICA_AXIS

    exp, _ = _tiny_experiment(
        tmp_path, exp_params={"LR": 1e-3, "kld_weight": 0.005,
                              "dcn_replicas": 2, "sharding": "fsdp",
                              "fsdp_min_size": 64})
    assert exp.mesh.shape[REPLICA_AXIS] == 2
    assert exp.mesh.shape[DATA_AXIS] == 4
    val = exp.fit(max_epochs=1)
    assert np.isfinite(val["val_loss"])
    n_sharded = 0
    for p in jax.tree_util.tree_leaves(exp.state.params):
        spec = getattr(p.sharding, "spec", ())
        axes = [a for t in spec if t is not None
                for a in (t if isinstance(t, tuple) else (t,))]
        assert REPLICA_AXIS not in axes, spec
        n_sharded += DATA_AXIS in axes
    assert n_sharded >= 5


def test_fit_sp_trains_all_modes(tmp_path):
    """exp_params.sharding: sp — sequence parallelism through the full
    orchestrated loop (run.py injects the model's seq_axis the same
    way): the mesh grows a model axis, the CT attention domains carry
    their shard_dim constraints (resolved by the mesh context the
    trainer now enters around each step), params stay replicated, and
    training over every batch mode stays finite."""
    import jax

    from ctvae_tpu.parallel import DATA_AXIS, MODEL_AXIS

    exp, _ = _tiny_experiment(
        tmp_path, dataset="TSynthetic",
        model_params={"name": "CTMCQVAE", "in_channels": 3,
                      "embedding_dim": 8, "action_dim": 8,
                      "num_embeddings": 8, "hidden_dims": [8, 16],
                      "img_size": 16, "codebooks": 2,
                      "causal_hidden_dims": [16, 8],
                      "seq_axis": "model"},
        exp_params={"LR": 1e-3, "kld_weight": 0.005, "sharding": "sp"})
    assert exp.mesh.shape[MODEL_AXIS] == 2
    assert exp.mesh.shape[DATA_AXIS] == 4
    exp.data.train_batch_size = 8
    exp.data.val_batch_size = 8
    val = exp.fit(max_epochs=1)
    assert np.isfinite(val["val_loss"])
    assert val["val_mode_id"] > 0.5, val   # every mode dispatched
    # SP shards activations, not weights
    assert all(p.sharding.is_fully_replicated
               for p in jax.tree_util.tree_leaves(exp.state.params))


def test_weights_only_restore_roundtrip(tmp_path):
    exp, ckpt = _tiny_experiment(tmp_path)
    exp.fit(max_epochs=1)
    import jax
    trained = jax.device_get(exp.state.params)

    exp2, _ = _tiny_experiment(tmp_path / "b")
    first = next(iter(exp2.data.train_dataloader(0)))
    exp2.setup(first)
    exp2.load_weights(os.path.join(ckpt.dir, "last"))
    restored = jax.device_get(exp2.state.params)
    leaves_a = jax.tree_util.tree_leaves(trained)
    leaves_b = jax.tree_util.tree_leaves(restored)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_weights_only_partial_merge(tmp_path):
    """Leaves missing from the checkpoint keep their fresh init — the
    reference's strict=False semantics (run.py:88)."""
    params = {"enc": {"w": np.zeros((2, 2), np.float32)},
              "extra": {"w": np.full((3,), 7.0, np.float32)}}
    import orbax.checkpoint as ocp
    path = os.path.join(str(tmp_path), "w")
    ocp.PyTreeCheckpointer().save(path, {"params": {
        "enc": {"w": np.ones((2, 2), np.float32)},
        "shape_mismatch": {"w": np.ones((9,), np.float32)}}})
    merged = load_weights_only(path, params)
    np.testing.assert_array_equal(merged["enc"]["w"], 1.0)
    np.testing.assert_array_equal(merged["extra"]["w"], 7.0)


def test_fit_transition_model_all_modes(tmp_path):
    """CTMCQVAE through the full loop on TSynthetic: every batch mode
    must actually DISPATCH (regression: a missing FORWARD_MODES
    attribute once made the trainer silently run every batch in base
    mode — caught because val_mode_id averaged exactly 0)."""
    exp, _ = _tiny_experiment(
        tmp_path, dataset="TSynthetic",
        model_params={"name": "CTMCQVAE", "in_channels": 3,
                      "embedding_dim": 8, "action_dim": 8,
                      "num_embeddings": 8, "hidden_dims": [8, 16],
                      "img_size": 16, "codebooks": 2,
                      "causal_hidden_dims": [16, 8]},
        exp_params={"LR": 1e-3, "kld_weight": 0.005,
                    "update_parameters": "ct_layer"})
    exp.data.train_batch_size = 8
    exp.data.val_batch_size = 8
    val = exp.fit(max_epochs=1)
    assert np.isfinite(val["val_loss"])
    # mode dispatch: action(1)/causal(2) batches dominate TSynthetic, so
    # the mean mode id must be well above 0; causal metrics must exist
    # and only come from causal batches
    assert val["val_mode_id"] > 0.5, val
    assert "val_causal_acc" in val
    from ctvae_tpu.training.experiment import _has_modes
    assert _has_modes(exp.model)


def test_logger_routes_scalars_and_images(tmp_path):
    lg = ExperimentLogger(str(tmp_path), "route")
    scalars = lg.log_all({"loss": np.float32(1.5),
                          "ct_adjacency": np.random.rand(4, 4),
                          "mode": "action"}, step=1)
    assert scalars == {"loss": 1.5}
    lg.finish()
    files = os.listdir(lg.log_dir)
    assert any(f.startswith("events") for f in files)


def test_full_state_resume_roundtrip(tmp_path):
    """Full-state restore: params, optimizer state, AND the step counter
    survive (the reference's trainer_params.resume_from_checkpoint)."""
    import jax

    exp, ckpt = _tiny_experiment(tmp_path)
    exp.fit(max_epochs=1)
    step_before = int(exp.state.step)
    assert step_before > 0

    exp2, _ = _tiny_experiment(tmp_path / "b")
    first = next(iter(exp2.data.train_dataloader(0)))
    exp2.setup(first)
    restored = ckpt.restore(jax.device_get(exp2.state), which="last")
    assert int(restored.step) == step_before
    a = jax.tree_util.tree_leaves(jax.device_get(exp.state.opt_states))
    b = jax.tree_util.tree_leaves(restored.opt_states)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_full_state_resume_continues_to_max_epochs_total(tmp_path):
    """Resume must continue the epoch count: a run resumed at epoch 2
    with max_epochs=3 trains exactly ONE more epoch (PL semantics,
    /root/reference/run.py:91-101 + README.md:89), with the LR schedule
    picking up at its restored step position."""
    ep = {"LR": 1e-3, "kld_weight": 0.005, "scheduler_gamma": 0.5}
    exp, ckpt = _tiny_experiment(tmp_path, exp_params=dict(ep))
    exp.fit(max_epochs=2)
    spe = exp.data.steps_per_epoch()
    assert int(exp.state.step) == 2 * spe

    exp2, _ = _tiny_experiment(tmp_path, exp_params=dict(ep))
    first = next(iter(exp2.data.train_dataloader(0)))
    exp2.setup(first)
    exp2.restore_full_state("last")
    assert exp2.start_epoch == 2
    assert exp2.global_step == 2 * spe
    # LR schedule position continues: per-epoch ExponentialLR has
    # decayed twice at the restored step
    np.testing.assert_allclose(float(exp2.lr_schedules[0](exp2.global_step)),
                               1e-3 * 0.5 ** 2, rtol=1e-6)
    # restored state is mesh-replicated like every other state
    assert exp2.state.step.sharding is not None

    exp2.fit(max_epochs=3)           # exactly one more epoch
    assert int(exp2.state.step) == 3 * spe

    exp3, _ = _tiny_experiment(tmp_path, exp_params=dict(ep))
    first = next(iter(exp3.data.train_dataloader(0)))
    exp3.setup(first)
    exp3.restore_full_state("last")
    exp3.fit(max_epochs=3)           # already at max_epochs: no-op
    assert int(exp3.state.step) == 3 * spe


def test_adam_weight_decay_matches_torch_coupled_l2():
    """Nonzero exp_params.weight_decay must reproduce torch
    ``Adam(weight_decay=wd)`` — coupled L2 added to the gradient BEFORE
    the moment updates (/root/reference/experiment.py:154-156) — not
    optax.adamw's decoupled decay, which diverges after the first step."""
    import jax.numpy as jnp
    import optax
    import torch

    from ctvae_tpu.training.optimizers import build_optimizers

    wd, lr = 0.1, 0.01
    init = np.array([0.5, -1.2, 2.0, 0.03], np.float64)
    grads = np.random.RandomState(0).randn(6, 4)

    tp = torch.nn.Parameter(torch.tensor(init))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    params = {"w": jnp.asarray(init, jnp.float32)}
    tx = build_optimizers({"LR": lr, "weight_decay": wd}, params)[0]
    st = tx.init(params)
    for g in grads:
        updates, st = tx.update({"w": jnp.asarray(g, jnp.float32)}, st,
                                params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=2e-5, atol=2e-6)


def test_accumulate_grad_batches_optimizer_semantics():
    """``accumulate_grad_batches: k`` (PL Trainer knob) must hold params
    fixed for k-1 calls, then apply exactly the accum=1 update computed
    from the MEAN of the k gradients — Lightning's averaging semantics —
    with the LR schedule advancing once per *optimizer* step."""
    import jax.numpy as jnp
    import optax

    from ctvae_tpu.training.optimizers import (build_lr_schedules,
                                               build_optimizers)

    lr, gamma, spe = 0.01, 0.5, 4     # 4 microbatches/epoch, accum 2
    init = {"w": jnp.asarray([0.5, -1.2, 2.0, 0.03], jnp.float32)}
    gs = [jnp.asarray(g, jnp.float32)
          for g in np.random.RandomState(1).randn(8, 4)]

    ep_accum = {"LR": lr, "scheduler_gamma": gamma,
                "accumulate_grad_batches": 2}
    tx = build_optimizers(ep_accum, init, steps_per_epoch=spe)[0]
    params, st = dict(init), tx.init(init)
    trace = []
    for g in gs:
        updates, st = tx.update({"w": g}, st, params)
        params = optax.apply_updates(params, updates)
        trace.append(np.asarray(params["w"]).copy())
    # microbatch 0, 2, 4, ... leave params untouched
    np.testing.assert_array_equal(trace[0], np.asarray(init["w"]))
    np.testing.assert_array_equal(trace[2], trace[1])

    # reference: accum=1 on the pairwise-mean grads, 2 opt steps/epoch
    tx1 = build_optimizers({"LR": lr, "scheduler_gamma": gamma}, init,
                           steps_per_epoch=spe // 2)[0]
    params1, st1 = dict(init), tx1.init(init)
    for g2 in [(gs[i] + gs[i + 1]) / 2 for i in range(0, 8, 2)]:
        updates, st1 = tx1.update({"w": g2}, st1, params1)
        params1 = optax.apply_updates(params1, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               np.asarray(params1["w"]), rtol=1e-6)

    # the logged LR mirrors the inner schedule: decays once per epoch
    # of 4 microbatches (= 2 optimizer steps)
    sched = build_lr_schedules(ep_accum, steps_per_epoch=spe)[0]
    assert float(sched(0)) == float(sched(3))
    np.testing.assert_allclose(float(sched(0)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(sched(4)), lr * gamma, rtol=1e-6)


def test_accumulate_grad_batches_train_step_boundaries():
    """Through the real jitted train step: with accum=2 the params only
    move on even step counts (BN stats still update every microbatch,
    like Lightning)."""
    import chex
    import jax
    import optax

    from ctvae_tpu.models import vae_models
    from ctvae_tpu.training import create_train_state, make_train_step
    from ctvae_tpu.training.optimizers import build_optimizers

    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=8,
                                     hidden_dims=(8, 16), img_size=16)
    rng = jax.random.PRNGKey(0)
    batch = {"image": jax.random.uniform(rng, (4, 16, 16, 3))}
    state = create_train_state(
        model, rng, batch,
        [optax.adam(1e-3)])   # placeholder; rebuilt below with accum
    txs = build_optimizers({"LR": 1e-3, "accumulate_grad_batches": 2},
                           state.params)
    state = state.replace(opt_states=tuple(tx.init(state.params)
                                           for tx in txs))
    step = jax.jit(make_train_step(model, txs, M_N=0.005,
                                   fwd_kwargs_keys=()))
    p0 = jax.device_get(state.params)
    bn0 = jax.device_get(state.model_state["batch_stats"])
    state, _ = step(state, batch)
    p1 = jax.device_get(state.params)
    bn1 = jax.device_get(state.model_state["batch_stats"])
    chex.assert_trees_all_equal(p0, p1)          # boundary not reached
    with pytest.raises(AssertionError):          # BN moved anyway
        chex.assert_trees_all_equal(bn0, bn1)
    state, _ = step(state, batch)
    p2 = jax.device_get(state.params)
    with pytest.raises(AssertionError):          # k-th call applied
        chex.assert_trees_all_equal(p1, p2)


def test_async_checkpointing_matches_sync(tmp_path):
    """async_save overlaps the disk write with training; the on-disk
    result (last + top-k index) must be identical to sync mode, wait()
    must join the in-flight write, and restore() must never race it."""
    from ctvae_tpu.utils import CheckpointManager

    state = {"params": {"w": np.arange(8, dtype=np.float32)},
             "step": np.int32(5)}

    sync = CheckpointManager(str(tmp_path / "sync"), top_k=1)
    sync.save(state, 5, metrics={"val_Reconstruction_Loss": 0.5})

    asy = CheckpointManager(str(tmp_path / "async"), top_k=1,
                            async_save=True)
    asy.save(state, 5, metrics={"val_Reconstruction_Loss": 0.5})
    # second save must serialize behind the first
    state2 = {"params": {"w": np.arange(8, dtype=np.float32) * 2},
              "step": np.int32(9)}
    asy.save(state2, 9, metrics={"val_Reconstruction_Loss": 0.25})
    asy.wait()

    with open(os.path.join(asy.dir, "index.json")) as f:
        idx = json.load(f)
    assert [e["step"] for e in idx["best"]] == [9]
    got = asy.restore(state, which="last")
    np.testing.assert_array_equal(got["params"]["w"],
                                  state2["params"]["w"])
    # restore without an explicit wait() also works (implicit join)
    asy.save(state, 11)
    got = asy.restore(state, which="last")
    np.testing.assert_array_equal(got["params"]["w"],
                                  state["params"]["w"])

    # a failed background write must surface at the next wait(), not
    # read as success
    def boom(host_state, step, metrics):
        raise RuntimeError("disk full")

    asy._write = boom
    asy.save(state, 12)
    with pytest.raises(RuntimeError, match="disk full"):
        asy.wait()
    asy.wait()  # the exception is raised once, then cleared


def test_checkpoint_writes_are_atomic(tmp_path):
    """'last' is replaced via tmp-dir + rename swap: no intermediate
    state of a save can lose the previous complete checkpoint to a hard
    kill (real preemption is SIGKILL), and restore() falls back to the
    parked '.old' directory if the kill landed between the two renames."""
    from ctvae_tpu.utils import CheckpointManager

    s1 = {"params": {"w": np.arange(4, dtype=np.float32)}}
    s2 = {"params": {"w": np.arange(4, dtype=np.float32) * 3}}

    cm = CheckpointManager(str(tmp_path / "ck"), top_k=1)
    cm.save(s1, 1, metrics={"val_Reconstruction_Loss": 1.0})
    cm.save(s2, 2, metrics={"val_Reconstruction_Loss": 0.5})
    # a completed save leaves no swap debris
    assert sorted(d for d in os.listdir(cm.dir) if d.startswith("last")) \
        == ["last"]
    assert not any(d.endswith((".tmp", ".old")) for d in os.listdir(cm.dir))

    # kill between the two renames: old checkpoint parked at last.old
    last = os.path.join(cm.dir, "last")
    os.rename(last, last + ".old")
    got = cm.restore(s1, which="last")
    np.testing.assert_array_equal(got["params"]["w"], s2["params"]["w"])

    # kill mid-save-to-tmp: garbage last.tmp must not break the next save
    os.rename(last + ".old", last)
    os.makedirs(last + ".tmp")
    with open(os.path.join(last + ".tmp", "garbage"), "w") as f:
        f.write("truncated write")
    cm.save(s1, 3, metrics={"val_Reconstruction_Loss": 0.4})
    got = cm.restore(s1, which="last")
    np.testing.assert_array_equal(got["params"]["w"], s1["params"]["w"])
    assert not os.path.exists(last + ".tmp")


def test_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM-style preemption: request_stop() mid-fit must write a
    resumable 'last' checkpoint, break the epoch loop, and a full-state
    resume must continue to max_epochs TOTAL from the stop epoch. The
    reference has no recovery path (SURVEY.md §5)."""
    import signal

    exp, ckpt = _tiny_experiment(tmp_path)

    # stop after the first epoch's training pass
    orig = exp.train_epoch
    epochs_run = []

    def train_and_stop(epoch):
        out = orig(epoch)
        epochs_run.append(epoch)
        exp.request_stop()
        return out

    exp.train_epoch = train_and_stop
    exp.fit(max_epochs=4)
    assert epochs_run == [0]                 # broke out after epoch 0
    assert os.path.isdir(os.path.join(ckpt.dir, "last"))

    # resume: trains the REMAINING epochs (1..3), like PL
    exp2, _ = _tiny_experiment(tmp_path / "resume")
    first = next(iter(exp2.data.train_dataloader(0)))
    exp2.setup(first)
    exp2.ckpt = ckpt                         # point restore at stage-1 dir
    exp2.restore_full_state("last")
    assert exp2.start_epoch == 1
    val = exp2.fit(max_epochs=3)
    assert np.isfinite(val["val_loss"])

    # the signal handler itself: SIGTERM sets the flag, nothing dies
    from ctvae_tpu.training import install_preemption_handler
    exp3, _ = _tiny_experiment(tmp_path / "sig")
    install_preemption_handler(exp3)
    os.kill(os.getpid(), signal.SIGTERM)
    # the handler runs at the next bytecode boundary in the main thread
    for _ in range(1000):
        if exp3._stop_requested:
            break
    assert exp3._stop_requested
    signal.signal(signal.SIGTERM, signal.SIG_DFL)


def test_gradient_clip_val_matches_torch_clip_grad_norm():
    """trainer_params.gradient_clip_val (shipped by the reference's
    gammavae/infovae configs) must reproduce PL's behavior — torch
    ``clip_grad_norm_(max_norm)`` on the raw gradients before the Adam
    step, incl. the +1e-6 denominator — over a trajectory that engages
    both the clipped and unclipped branches."""
    import jax.numpy as jnp
    import optax
    import torch

    from ctvae_tpu.training.optimizers import build_optimizers

    lr, max_norm = 0.01, 0.8
    init = np.array([0.5, -1.2, 2.0, 0.03], np.float64)
    rs = np.random.RandomState(1)
    # alternate large grads (clipped) and tiny grads (coef > 1, no-op)
    grads = [g * (5.0 if i % 2 == 0 else 0.01)
             for i, g in enumerate(rs.randn(6, 4))]

    tp = torch.nn.Parameter(torch.tensor(init))
    topt = torch.optim.Adam([tp], lr=lr)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([tp], max_norm)
        topt.step()

    params = {"w": jnp.asarray(init, jnp.float32)}
    tx = build_optimizers({"LR": lr, "gradient_clip_val": max_norm},
                          params)[0]
    st = tx.init(params)
    for g in grads:
        updates, st = tx.update({"w": jnp.asarray(g, jnp.float32)}, st,
                                params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=2e-5, atol=2e-6)


def test_scheduler_gamma_zero_matches_torch_semantics():
    """scheduler_gamma: 0.0 (the reference VQVAE config quirk,
    /root/reference/configs/vq_vae.yaml:20) must kill the LR from the
    second epoch on, exactly like torch ExponentialLR(gamma=0.0) —
    optax's exponential_decay would silently turn it into a constant."""
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ctvae_tpu.training.optimizers import (build_lr_schedules,
                                               build_optimizers)

    scheds = build_lr_schedules({"LR": 0.005, "scheduler_gamma": 0.0},
                                steps_per_epoch=10)
    assert float(scheds[0](0)) == 0.005
    assert float(scheds[0](9)) == 0.005
    assert float(scheds[0](10)) == 0.0
    assert float(scheds[0](99)) == 0.0

    # and the actual optimizer stops moving params after epoch 1
    params = {"w": jnp.ones((3,))}
    tx = build_optimizers({"LR": 0.005, "scheduler_gamma": 0.0}, params,
                          steps_per_epoch=2)[0]
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    p = params
    for i in range(4):
        updates, state = tx.update(g, state, p)
        before = p["w"].copy()
        p = optax.apply_updates(p, updates)
        moved = float(jnp.max(jnp.abs(p["w"] - before)))
        if i < 2:
            assert moved > 0, i
        else:
            np.testing.assert_allclose(moved, 0.0, atol=1e-12)


def test_fit_fsdp_with_ema_quantizer(tmp_path):
    """EMA codebooks compose with FSDP: the vq_stats collection stays
    replicated (it is EMA-written, not gradient-trained), moves during
    fit, and survives a full-state resume into the sharded layout."""
    import jax

    mp = {"name": "VQVAE", "in_channels": 3, "embedding_dim": 8,
          "num_embeddings": 16, "hidden_dims": [8, 16], "img_size": 16,
          "ema": True, "revive_threshold": 0.01}
    exp, _ = _tiny_experiment(
        tmp_path, model_params=mp,
        exp_params={"LR": 1e-3, "kld_weight": 0.005,
                    "sharding": "fsdp", "fsdp_min_size": 64})
    before = jax.device_get(exp.setup(
        next(iter(exp.data.train_dataloader(0)))).model_state["vq_stats"])
    val = exp.fit(max_epochs=1)
    assert np.isfinite(val["val_loss"])
    assert 1.0 <= val["val_Codebook_Perplexity"] <= 16.0
    after = jax.device_get(exp.state.model_state["vq_stats"])
    assert any(
        not np.allclose(b, a)
        for b, a in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)))
    for leaf in jax.tree_util.tree_leaves(exp.state.model_state):
        assert leaf.sharding.is_fully_replicated

    exp2, _ = _tiny_experiment(
        tmp_path, model_params=mp,
        exp_params={"LR": 1e-3, "kld_weight": 0.005,
                    "sharding": "fsdp", "fsdp_min_size": 64})
    exp2.setup(next(iter(exp2.data.train_dataloader(0))))
    exp2.restore_full_state("last")
    for a, b in zip(
            jax.tree_util.tree_leaves(after),
            jax.tree_util.tree_leaves(
                jax.device_get(exp2.state.model_state["vq_stats"]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

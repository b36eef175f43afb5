#!/usr/bin/env python
"""Seeded end-to-end loss-trajectory parity driver.

Trains the torch reference and ctvae_tpu SIDE BY SIDE in float64 with
transplanted initial weights, identical data, identical batch order,
identical optimizer hyperparameters (Adam + per-epoch ExponentialLR, the
reference experiment.py:152-187 recipe), and identical injected
randomness (reparameterization noise shared through a queue; Gumbel
samplers replaced by the same deterministic threshold on both sides) for
2 full epochs. Prints ONE JSON line with both per-step loss
trajectories. A drift anywhere — optimizer semantics, annealing, BN
statistics, loss composition, conv padding, quantizer ties — shows up as
a per-step divergence far above float64 noise.

Run (the pytest wrapper does this):
    JAX_PLATFORMS=cpu python tests/e2e_trajectory_driver.py vanilla
Models: vanilla (north-star configs/vae.yaml shape), vqvae, ct (all
three batch modes interleaved, north-star configs/ct_mcq_vae.yaml
shape at toy size).
"""

import json
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
import torch  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _pyg_install import (install_torch_geometric,  # noqa: E402
                          install_torchvision_stub)

install_torchvision_stub()
install_torch_geometric()
sys.path.insert(0, "/root/reference")
# repo root last: the reference's `models` package must win that name,
# ctvae_tpu only exists at the repo root
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch_transplant as tt  # noqa: E402

torch.set_default_dtype(torch.float64)

EPOCHS = 2
STEPS_PER_EPOCH = 5
LR = 0.005
SCHED_GAMMA = 0.9
KLD_WEIGHT = 0.00025


def _nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def _build_tx(params):
    """The repo's own optimizer factory — the code path run.py uses."""
    from ctvae_tpu.training.optimizers import build_optimizers
    return build_optimizers({"LR": LR, "scheduler_gamma": SCHED_GAMMA},
                            params, steps_per_epoch=STEPS_PER_EPOCH)[0]


class Queue:
    def __init__(self, arrays):
        self.items = list(arrays)
        self.i = 0

    def pop(self, shape=None):
        v = self.items[self.i]
        self.i += 1
        if shape is not None:
            assert tuple(v.shape) == tuple(shape), (v.shape, shape)
        return v


# ---------------------------------------------------------------------------
# VanillaVAE
# ---------------------------------------------------------------------------

def run_vanilla():
    import importlib
    ref_mod = importlib.import_module("models.vanilla_vae")
    from ctvae_tpu.models import vae_models

    B, IMG, LATENT = 4, 64, 10
    HDIMS = [32, 64, 128, 256, 512]
    n_steps = EPOCHS * STEPS_PER_EPOCH
    rng = np.random.default_rng(0)
    batches = [rng.uniform(size=(B, IMG, IMG, 3)) for _ in range(n_steps)]
    eps = [rng.standard_normal((B, LATENT)) for _ in range(n_steps)]

    torch.manual_seed(0)
    ref = ref_mod.VanillaVAE(3, LATENT).double()
    params, batch_stats = tt.vanilla_vae(ref, LATENT, HDIMS, IMG)

    # ---- torch side ----
    opt = torch.optim.Adam(ref.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=SCHED_GAMMA)
    tq = Queue([torch.from_numpy(e) for e in eps])
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t, **kw: tq.pop(t.shape)
    t_losses = []
    try:
        ref.train()
        step = 0
        for _ in range(EPOCHS):
            for _ in range(STEPS_PER_EPOCH):
                x = _nchw(batches[step])
                out = ref.forward(x)
                losses = ref.loss_function(*out, M_N=KLD_WEIGHT)
                opt.zero_grad()
                losses["loss"].backward()
                opt.step()
                t_losses.append(float(losses["loss"]))
                step += 1
            sched.step()
    finally:
        torch.randn_like = orig_randn_like

    # ---- jax side ----
    import ctvae_tpu.models.gaussian_base as gb
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=LATENT,
                                     img_size=IMG, dtype=jnp.float64)
    jq = Queue([jnp.asarray(e) for e in eps])
    orig_reparam = gb.reparameterize
    gb.reparameterize = lambda r, mu, lv: mu + jnp.exp(0.5 * lv) * jq.pop(mu.shape)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    tx = _build_tx(params)
    opt_state = tx.init(params)
    rngs = {s: jax.random.PRNGKey(i) for i, s in
            enumerate(("reparam", "gumbel", "noise", "dropout"))}
    j_losses = []
    try:
        for step in range(n_steps):
            x = jnp.asarray(batches[step])

            def loss_fn(p, bs):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs}, x, train=True,
                    rngs=rngs, mutable=["batch_stats"])
                losses = model.loss_function(out, M_N=KLD_WEIGHT)
                return losses["loss"], mut["batch_stats"]

            (loss, batch_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            j_losses.append(float(loss))
    finally:
        gb.reparameterize = orig_reparam
    return t_losses, j_losses


# ---------------------------------------------------------------------------
# DFCVAE — perceptual loss through a shared VGG19-bn weight set
# ---------------------------------------------------------------------------

def run_dfc():
    """DFCVAE trajectory with IDENTICAL VGG19-bn feature weights on both
    sides: the torchvision-format fixture from test_vgg_parity is handed
    to the reference ctor (its torchvision import is a stub on this
    host) and its saved state_dict is loaded into our frozen collection
    via the production ``load_vgg19_bn_weights`` path.

    The reference ctor puts the feature net in eval mode
    (/root/reference/models/dfcvae.py:87) but a later ``model.train()``
    — which Lightning issues every epoch — silently flips its BatchNorms
    back to train mode. We reproduce the ctor's *intent* (frozen
    eval-mode features, as ours implements) by re-calling
    ``feature_network.eval()`` after ``ref.train()``."""
    import importlib
    import tempfile

    from test_vgg_parity import TorchVGG19BN
    import ctvae_tpu.models.gaussian_base as gb
    from ctvae_tpu.models import vae_models
    from ctvae_tpu.models.vgg import load_vgg19_bn_weights

    # B=2 and one 5-step epoch: the float64 VGG19 forward+backward is
    # ~100x the cost of any other zoo model; 5 Adam steps already pin
    # the full perceptual-loss gradient path.
    B, IMG, LATENT = 2, 64, 10
    HDIMS = [32, 64, 128, 256, 512]
    n_steps = STEPS_PER_EPOCH
    rng = np.random.default_rng(31)
    batches = [rng.uniform(size=(B, IMG, IMG, 3)) for _ in range(n_steps)]
    eps = [rng.standard_normal((B, LATENT)) for _ in range(n_steps)]

    torch.manual_seed(31)
    vgg = TorchVGG19BN().double()
    ref_mod = importlib.import_module("models.dfcvae")
    ref_mod.vgg19_bn = lambda pretrained=True: vgg
    ref = ref_mod.DFCVAE(3, LATENT).double()
    params, batch_stats = tt.vanilla_vae(ref, LATENT, HDIMS, IMG)
    with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
        vgg_path = f.name
    torch.save(vgg.state_dict(), vgg_path)

    # ---- torch side ----
    opt = torch.optim.Adam(ref.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=SCHED_GAMMA)
    tq = Queue([torch.from_numpy(e) for e in eps])
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t, **kw: tq.pop(t.shape)
    t_losses = []
    try:
        ref.train()
        ref.feature_network.eval()
        for step in range(n_steps):
            x = _nchw(batches[step])
            out = ref.forward(x)
            losses = ref.loss_function(*out, M_N=KLD_WEIGHT)
            opt.zero_grad()
            losses["loss"].backward()
            opt.step()
            t_losses.append(float(losses["loss"]))
        sched.step()
    finally:
        torch.randn_like = orig_randn_like

    # ---- jax side ----
    model = vae_models["DFCVAE"](in_channels=3, latent_dim=LATENT,
                                 img_size=IMG, dtype=jnp.float64)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "reparam": jax.random.PRNGKey(1)},
                           jnp.zeros((1, IMG, IMG, 3)), train=True)
    frozen = {"feature_network": load_vgg19_bn_weights(
        dict(variables["frozen"]["feature_network"]), vgg_path)}

    jq = Queue([jnp.asarray(e) for e in eps])
    orig_reparam = gb.reparameterize
    gb.reparameterize = (lambda r, mu, lv:
                         mu + jnp.exp(0.5 * lv) * jq.pop(mu.shape))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    tx = _build_tx(params)
    opt_state = tx.init(params)
    rngs = {s: jax.random.PRNGKey(i) for i, s in
            enumerate(("reparam", "gumbel", "noise", "dropout"))}
    j_losses = []
    try:
        for step in range(n_steps):
            x = jnp.asarray(batches[step])

            def loss_fn(p, bs):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs, "frozen": frozen},
                    x, train=True, rngs=rngs, mutable=["batch_stats"])
                losses = model.loss_function(out, M_N=KLD_WEIGHT)
                return losses["loss"], mut["batch_stats"]

            (loss, batch_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            j_losses.append(float(loss))
    finally:
        gb.reparameterize = orig_reparam
    return t_losses, j_losses


# ---------------------------------------------------------------------------
# VQVAE
# ---------------------------------------------------------------------------

def run_vqvae(mcq=False):
    """VQVAE, or (mcq=True) MCQVAE with 2 codebooks in the reference's
    exact overlapping-slice mode (mcq_vae.py:104,117 quirk,
    quantizers.py slicing='overlap')."""
    import importlib
    ref_mod = importlib.import_module(
        "models.mcq_vae" if mcq else "models.vq_vae")
    from ctvae_tpu.models import vae_models

    B, IMG, D, K = 4, 16, 8, 8
    HDIMS = [16, 32]
    n_steps = EPOCHS * STEPS_PER_EPOCH
    rng = np.random.default_rng(1)
    batches = [rng.uniform(size=(B, IMG, IMG, 3)) for _ in range(n_steps)]

    torch.manual_seed(1)
    if mcq:
        ref = ref_mod.MCQVAE(in_channels=3, embedding_dim=D,
                             num_embeddings=K, hidden_dims=list(HDIMS),
                             img_size=IMG, codebooks=2).double()
        vq_p = tt.multi_codebook_vq(ref.vq_layer)
    else:
        ref = ref_mod.VQVAE(in_channels=3, embedding_dim=D,
                            num_embeddings=K, hidden_dims=list(HDIMS),
                            img_size=IMG).double()
        vq_p = {"embedding": tt.t2n(ref.vq_layer.embedding.weight)}
    enc_p = tt.vq_encoder(tt.flatten_sequential(ref.encoder))
    dec_p = tt.vq_decoder(tt.flatten_sequential(ref.decoder))
    params = {"encoder": enc_p, "decoder": dec_p, "vq_layer": vq_p}

    opt = torch.optim.Adam(ref.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=SCHED_GAMMA)
    t_losses = []
    ref.train()
    step = 0
    for _ in range(EPOCHS):
        for _ in range(STEPS_PER_EPOCH):
            x = _nchw(batches[step])
            out = ref.forward(x)
            losses = ref.loss_function(*out, M_N=KLD_WEIGHT)
            opt.zero_grad()
            losses["loss"].backward()
            opt.step()
            t_losses.append(float(losses["loss"]))
            step += 1
        sched.step()

    if mcq:
        model = vae_models["MCQVAE"](in_channels=3, embedding_dim=D,
                                     num_embeddings=K, hidden_dims=HDIMS,
                                     img_size=IMG, codebooks=2,
                                     slicing="overlap", dtype=jnp.float64)
    else:
        model = vae_models["VQVAE"](in_channels=3, embedding_dim=D,
                                    num_embeddings=K, hidden_dims=HDIMS,
                                    img_size=IMG, dtype=jnp.float64)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    tx = _build_tx(params)
    opt_state = tx.init(params)
    rngs = {s: jax.random.PRNGKey(i) for i, s in
            enumerate(("reparam", "gumbel", "noise", "dropout"))}
    j_losses = []
    for step in range(n_steps):
        x = jnp.asarray(batches[step])

        def loss_fn(p):
            out = model.apply({"params": p}, x, train=True, rngs=rngs)
            return model.loss_function(out, M_N=KLD_WEIGHT)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        j_losses.append(float(loss))
    return t_losses, j_losses


# ---------------------------------------------------------------------------
# FactorVAE — the dual-optimizer adversarial protocol
# ---------------------------------------------------------------------------

def run_fvae():
    """Pins the two-phase parameter updates over a full trajectory.

    Reference protocol (PL automatic optimization + retain_first_backpass,
    /root/reference/experiment.py:37,44-59 + models/fvae.py:150-201):
    per batch, TWO forwards; phase 0 (Adam over ALL params incl. the
    discriminator) trains the VAE loss and stashes ``D_z_reserve``;
    phase 1 (Adam over the discriminator) backprops the false-class term
    through the RETAINED phase-0 graph — i.e. at pre-update params and
    phase-0's z — plus the true-class term on fresh z.

    ctvae_tpu's functional restructure evaluates the false-class term at
    CURRENT params on the phase-1 z (fvae.py module docstring). The
    driver therefore runs THREE trainings: torch-exact (reference
    protocol), torch-CONTROL implementing the functional semantics in
    torch, and jax. jax must track the control within fp tolerance; the
    exact-vs-control gap IS the documented protocol deviation, measured.
    """
    import importlib
    ref_mod = importlib.import_module("models.fvae")
    import ctvae_tpu.models.fvae as jfvae
    import ctvae_tpu.models.gaussian_base as gb
    from ctvae_tpu.models import vae_models
    from ctvae_tpu.training.optimizers import build_optimizers

    B, IMG, LATENT, GAMMA = 4, 64, 10, 6.4
    LR2 = 0.004
    HDIMS = [32, 64, 128, 256, 512]
    n_steps = EPOCHS * STEPS_PER_EPOCH
    rng = np.random.default_rng(3)
    batches = [rng.uniform(size=(B, IMG, IMG, 3)) for _ in range(n_steps)]
    eps = [rng.standard_normal((B, LATENT)) for _ in range(2 * n_steps)]
    perms = [np.stack([rng.permutation(LATENT) for _ in range(B)])
             for _ in range(n_steps)]

    torch.manual_seed(3)
    ref = ref_mod.FactorVAE(3, LATENT, gamma=GAMMA).double()
    params, batch_stats = tt.vanilla_vae(ref, LATENT, HDIMS, IMG)
    disc_p, disc_s = {}, {}
    lin_idx = bn_idx = 0
    for m in ref.discriminator:
        tname = type(m).__name__
        if tname == "Linear":
            disc_p[f"Dense_{lin_idx}"] = tt.linear(m)
            lin_idx += 1
        elif tname == "BatchNorm1d":
            p, s = tt.bn(m)
            disc_p[f"BatchNorm_{bn_idx}"] = p
            disc_s[f"BatchNorm_{bn_idx}"] = s
            bn_idx += 1
    params["discriminator"] = disc_p
    batch_stats["discriminator"] = disc_s

    def make_perm_fn(queue):
        def perm_fn(z):
            Bz, Dz = z.size()
            p = torch.from_numpy(queue.pop((Bz, Dz)))
            return torch.gather(z, 1, p)
        return perm_fn

    def torch_run(model_ref, exact):
        opt0 = torch.optim.Adam(model_ref.parameters(), lr=LR)
        sched = torch.optim.lr_scheduler.ExponentialLR(
            opt0, gamma=SCHED_GAMMA)
        opt1 = torch.optim.Adam(model_ref.discriminator.parameters(),
                                lr=LR2)
        eq = Queue([torch.from_numpy(e) for e in eps])
        pq = Queue(list(perms))
        orig_randn_like = torch.randn_like
        torch.randn_like = lambda t, **kw: eq.pop(t.shape)
        model_ref.permute_latent = make_perm_fn(pq)
        losses_out = []
        model_ref.train()
        try:
            step = 0
            for _ in range(EPOCHS):
                for _ in range(STEPS_PER_EPOCH):
                    x = _nchw(batches[step])
                    F = torch.nn.functional
                    disc_params = list(
                        model_ref.discriminator.parameters())
                    out0 = model_ref.forward(x)
                    l0 = model_ref.loss_function(*out0, M_N=KLD_WEIGHT,
                                                 optimizer_idx=0)
                    if exact:
                        # the reference backprops the false-class term
                        # through the RETAINED phase-0 graph — i.e. the
                        # gradient at PRE-update params on phase-0's z.
                        # (torch 2.x's version counter rejects the
                        # literal stale-graph backward the cu102-era
                        # stack allowed; computing the same gradient
                        # before opt0.step() is mathematically the
                        # identical protocol.)
                        Bz = x.size(0)
                        false_loss = 0.5 * F.cross_entropy(
                            model_ref.D_z_reserve if hasattr(
                                model_ref, "D_z_reserve") else None,
                            torch.zeros(Bz, dtype=torch.long))
                        g_false = torch.autograd.grad(
                            false_loss, disc_params, retain_graph=True,
                            allow_unused=True)
                    opt0.zero_grad()
                    l0["loss"].backward()
                    opt0.step()
                    out1 = model_ref.forward(x)
                    z1 = out1[4].detach()
                    Bz = z1.size(0)
                    D_perm = model_ref.discriminator(
                        model_ref.permute_latent(z1))
                    true_loss = 0.5 * F.cross_entropy(
                        D_perm, torch.ones(Bz, dtype=torch.long))
                    if exact:
                        opt1.zero_grad()
                        true_loss.backward()
                        with torch.no_grad():
                            for p, gf in zip(disc_params, g_false):
                                if gf is not None:
                                    p.grad = (gf if p.grad is None
                                              else p.grad + gf)
                        l1_val = float(false_loss) + float(true_loss)
                    else:
                        # functional semantics: false term at CURRENT
                        # params on this phase's z
                        D_z = model_ref.discriminator(z1)
                        false_loss2 = 0.5 * F.cross_entropy(
                            D_z, torch.zeros(Bz, dtype=torch.long))
                        opt1.zero_grad()
                        (false_loss2 + true_loss).backward()
                        l1_val = float(false_loss2) + float(true_loss)
                    opt1.step()
                    losses_out.append((float(l0["loss"]), l1_val))
                    step += 1
                sched.step()
        finally:
            torch.randn_like = orig_randn_like
        return losses_out

    t_exact = torch_run(ref, exact=True)
    torch.manual_seed(3)
    ref2 = ref_mod.FactorVAE(3, LATENT, gamma=GAMMA).double()
    t_control = torch_run(ref2, exact=False)

    # ---- jax side (production protocol) ----
    model = vae_models["FactorVAE"](in_channels=3, latent_dim=LATENT,
                                    gamma=GAMMA, img_size=IMG,
                                    dtype=jnp.float64)
    jeq = Queue([jnp.asarray(e) for e in eps])
    orig_reparam = gb.reparameterize
    orig_perm = jfvae.permute_latent

    # jax forward calls permute_latent in BOTH phases; only the phase-1
    # value reaches a loss (phase-0's D_z_perm output is unused), so the
    # step's perm is simply reused for both calls.
    perm_state = {"calls": 0}

    def jax_perm(r, z):
        idx = perm_state["calls"] // 2
        perm_state["calls"] += 1
        return jnp.take_along_axis(z, jnp.asarray(perms[idx]), axis=1)

    jfvae.permute_latent = jax_perm
    gb.reparameterize = lambda r, mu, lv: mu + jnp.exp(0.5 * lv) * jeq.pop(mu.shape)
    jfvae.reparameterize = gb.reparameterize

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    txs = build_optimizers({"LR": LR, "scheduler_gamma": SCHED_GAMMA,
                            "LR_2": LR2, "submodel": "discriminator"},
                           params, steps_per_epoch=STEPS_PER_EPOCH)
    opt_states = [tx.init(params) for tx in txs]
    rngs = {s: jax.random.PRNGKey(i) for i, s in
            enumerate(("reparam", "gumbel", "noise", "dropout"))}
    j_losses = []
    try:
        for step in range(n_steps):
            x = jnp.asarray(batches[step])
            pair = []
            for oi in (0, 1):
                def loss_fn(p, bs):
                    out, mut = model.apply(
                        {"params": p, "batch_stats": bs}, x, train=True,
                        rngs=rngs, mutable=["batch_stats"])
                    l = model.loss_function(out, M_N=KLD_WEIGHT,
                                            optimizer_idx=oi)
                    return l["loss"], mut["batch_stats"]

                (loss, batch_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch_stats)
                updates, opt_states[oi] = txs[oi].update(
                    grads, opt_states[oi], params)
                params = optax.apply_updates(params, updates)
                pair.append(float(loss))
            j_losses.append(tuple(pair))
    finally:
        gb.reparameterize = orig_reparam
        jfvae.reparameterize = orig_reparam
        jfvae.permute_latent = orig_perm

    def flat(pairs):
        return [v for pair in pairs for v in pair]

    return flat(t_exact), flat(j_losses), flat(t_control)


# ---------------------------------------------------------------------------
# CTMCQVAE — all three modes interleaved
# ---------------------------------------------------------------------------

def run_ct():
    import importlib
    ref_mod = importlib.import_module("models.ct_mcq_vae")
    import ctvae_tpu.models.ct_vae as ct_mod
    from ctvae_tpu.models import vae_models

    B, IMG, D, K, A, C = 4, 16, 8, 8, 4, 2
    HDIMS = [16, 32]
    CHDIMS = [16, 8]
    GAMMA = 1.5
    n_steps = EPOCHS * STEPS_PER_EPOCH
    S = (IMG // 4) ** 2 * C                      # K*h*w causal variables

    rng = np.random.default_rng(2)
    batches, batches_y, actions, modes = [], [], [], []
    for i in range(n_steps):
        batches.append(rng.uniform(size=(B, IMG, IMG, 3)))
        batches_y.append(rng.uniform(size=(B, IMG, IMG, 3)))
        actions.append(np.eye(A)[rng.integers(0, A, B)].astype(np.float64))
        modes.append(("base", "action", "causal")[i % 3])
    # adjacency-KL random targets: one [B, S*S] draw per forward_action
    # call (A calls per causal step on the torch side; our vectorized
    # side consumes the same values as one [A*B, S*S] draw)
    kl_targets = [rng.uniform(size=(A, B, S * S)) for _ in range(n_steps)]

    torch.manual_seed(2)
    ref = ref_mod.CTMCQVAE(in_channels=3, embedding_dim=D, action_dim=A,
                           num_embeddings=K, hidden_dims=list(HDIMS),
                           causal_hidden_dims=list(CHDIMS), gamma=GAMMA,
                           img_size=IMG, codebooks=C).double()
    ref.ct_layer.pos_encoding.dropout.p = 0.0

    params = {
        "encoder": tt.vq_encoder(tt.flatten_sequential(ref.encoder)),
        "decoder": tt.vq_decoder(tt.flatten_sequential(ref.decoder)),
        "vq_layer": tt.multi_codebook_vq(ref.vq_layer),
        "ct_layer": tt.causal_transition(ref.ct_layer, K, A),
    }

    # deterministic "sampling" on both sides
    orig_gumbel = torch.nn.functional.gumbel_softmax
    torch.nn.functional.gumbel_softmax = \
        lambda logits, tau=1.0, hard=True, **kw: torch.nn.functional.one_hot(
            logits.argmax(dim=-1), logits.size(-1)).to(logits.dtype)
    orig_st = ct_mod.st_bernoulli_gumbel
    ct_mod.st_bernoulli_gumbel = \
        lambda r, probs, tau=1.0: (probs > 0.5).astype(probs.dtype)

    # shared adjacency-KL targets
    t_kl = {"step": 0, "call": 0}
    orig_rand = torch.rand

    def fake_rand(*shape, **kw):
        if shape and isinstance(shape[0], (tuple, torch.Size)):
            shape = tuple(shape[0])
        tgt = kl_targets[t_kl["step"]]
        v = tgt.reshape(-1, tgt.shape[-1])[
            t_kl["call"] * shape[0]:(t_kl["call"] + 1) * shape[0]]
        t_kl["call"] += 1
        assert v.shape == tuple(shape), (v.shape, shape)
        return torch.from_numpy(v.copy())

    torch.rand = fake_rand

    # the reference hard-codes .to(dtype=torch.float32) in two places
    # (ct_mcq_vae.py:118 action repeat, :480 one-hot preprocess) — keep
    # the float64 run pure by promoting those requests
    orig_to = torch.Tensor.to

    def fake_to(self, *args, **kwargs):
        args = tuple(torch.float64 if a is torch.float32 else a
                     for a in args)
        if kwargs.get("dtype") is torch.float32:
            kwargs = {**kwargs, "dtype": torch.float64}
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = fake_to

    class OptaxOrderAdam:
        """Adam with optax's exact elementwise op order, in torch.
        Mathematically identical to torch.optim.Adam; rounds differently
        (optax: m = (1-b1)*g + b1*m then m_hat/(sqrt(v_hat)+eps); torch
        fuses differently). Used as the CONTROL run: it bounds how much
        of the torch-vs-jax trajectory gap is pure optimizer rounding
        amplified by the CT model's sharp nonlinearities."""

        def __init__(self, params, b1=0.9, b2=0.999, eps=1e-8):
            self.params = [p for p in params if p.requires_grad]
            self.m = [torch.zeros_like(p) for p in self.params]
            self.v = [torch.zeros_like(p) for p in self.params]
            self.b1, self.b2, self.eps = b1, b2, eps
            self.t = 0

        @torch.no_grad()
        def step(self, lr):
            self.t += 1
            bc1 = 1 - self.b1 ** self.t
            bc2 = 1 - self.b2 ** self.t
            for i, p in enumerate(self.params):
                g = p.grad
                if g is None:
                    continue
                self.m[i] = (1 - self.b1) * g + self.b1 * self.m[i]
                self.v[i] = (1 - self.b2) * (g * g) + self.b2 * self.v[i]
                m_hat = self.m[i] / bc1
                v_hat = self.v[i] / bc2
                p -= lr * (m_hat / (torch.sqrt(v_hat) + self.eps))

        def zero_grad(self):
            for p in self.params:
                p.grad = None

    def torch_run(model_ref, optax_order=False):
        """One full torch training run; ``optax_order=True`` swaps
        torch.optim.Adam for the optax-op-order control optimizer."""
        if optax_order:
            opt = OptaxOrderAdam(model_ref.parameters())
        else:
            opt = torch.optim.Adam(model_ref.parameters(), lr=LR)
            sched = torch.optim.lr_scheduler.ExponentialLR(
                opt, gamma=SCHED_GAMMA)
        losses_out = []
        model_ref.train()
        step = 0
        for epoch in range(EPOCHS):
            for _ in range(STEPS_PER_EPOCH):
                t_kl["step"], t_kl["call"] = step, 0
                mode = modes[step]
                out = model_ref.forward(
                    _nchw(batches[step]), input_y=_nchw(batches_y[step]),
                    action=torch.from_numpy(actions[step]), mode=mode)
                losses = model_ref.loss_function(*out, M_N=KLD_WEIGHT)
                opt.zero_grad()
                losses["loss"].backward()
                if optax_order:
                    opt.step(LR * SCHED_GAMMA ** epoch)
                else:
                    opt.step()
                losses_out.append(float(losses["loss"]))
                step += 1
            if not optax_order:
                sched.step()
        return losses_out

    try:
        t_losses = torch_run(ref)
        # control: same torch model/data, optax-op-order Adam — any
        # divergence here is optimizer ROUNDING amplified by the model,
        # the exact effect separating the jax run from torch.optim.Adam
        torch.manual_seed(2)
        ref2 = ref_mod.CTMCQVAE(
            in_channels=3, embedding_dim=D, action_dim=A,
            num_embeddings=K, hidden_dims=list(HDIMS),
            causal_hidden_dims=list(CHDIMS), gamma=GAMMA,
            img_size=IMG, codebooks=C).double()
        ref2.ct_layer.pos_encoding.dropout.p = 0.0
        c_losses = torch_run(ref2, optax_order=True)
    finally:
        torch.nn.functional.gumbel_softmax = orig_gumbel
        torch.rand = orig_rand
        torch.Tensor.to = orig_to

    # ---- jax side ----
    model = vae_models["CTMCQVAE"](
        in_channels=3, embedding_dim=D, action_dim=A, num_embeddings=K,
        hidden_dims=HDIMS, causal_hidden_dims=CHDIMS, gamma=GAMMA,
        img_size=IMG, codebooks=C, slicing="overlap", ct_dropout_rate=0.0,
        dtype=jnp.float64)

    j_kl = {"step": 0}
    orig_uniform = jax.random.uniform

    def fake_uniform(key, shape=(), *a, **kw):
        # only intercept the adjacency-KL target draw ([*, S*S]); other
        # uniform calls (flax's abstract shape-validation of param init
        # fns) pass through untouched
        if len(shape) == 2 and shape[-1] == S * S:
            tgt = kl_targets[j_kl["step"]]
            flat = tgt.reshape(-1, tgt.shape[-1])[:shape[0]]
            assert flat.shape == tuple(shape), (flat.shape, shape)
            return jnp.asarray(flat)
        return orig_uniform(key, shape, *a, **kw)

    jax.random.uniform = fake_uniform

    params = jax.tree_util.tree_map(jnp.asarray, params)
    tx = _build_tx(params)
    opt_state = tx.init(params)
    rngs = {s: jax.random.PRNGKey(i) for i, s in
            enumerate(("reparam", "gumbel", "noise", "dropout"))}
    j_losses = []
    try:
        for step in range(n_steps):
            j_kl["step"] = step
            mode = modes[step]
            x = jnp.asarray(batches[step])
            y = jnp.asarray(batches_y[step])
            act = jnp.asarray(actions[step])

            def loss_fn(p):
                out = model.apply({"params": p}, x, input_y=y, action=act,
                                  mode=mode, train=True, rngs=rngs)
                return model.loss_function(out)["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            j_losses.append(float(loss))
    finally:
        jax.random.uniform = orig_uniform
    return t_losses, j_losses, c_losses


# ---------------------------------------------------------------------------
# BetaVAE loss_type='B' — capacity annealing driven by the step counter
# ---------------------------------------------------------------------------

def run_betab():
    """The reference's class-level ``num_iter`` counter
    (/root/reference/models/beta_vae.py:10,132,147) vs ctvae_tpu's
    explicit ``step`` input: the annealed capacity C must advance
    identically, or the |kld - C| loss drifts from step 1."""
    import importlib
    ref_mod = importlib.import_module("models.beta_vae")
    from ctvae_tpu.models import vae_models

    B, IMG, LATENT = 4, 64, 10
    HDIMS = [32, 64, 128, 256, 512]
    n_steps = EPOCHS * STEPS_PER_EPOCH
    rng = np.random.default_rng(4)
    batches = [rng.uniform(size=(B, IMG, IMG, 3)) for _ in range(n_steps)]
    eps = [rng.standard_normal((B, LATENT)) for _ in range(n_steps)]

    torch.manual_seed(4)
    ref_mod.BetaVAE.num_iter = 0   # class-level counter: hard reset
    # C_stop_iter small enough that C actually moves within 10 steps
    ref = ref_mod.BetaVAE(3, LATENT, loss_type="B", gamma=10.0,
                          max_capacity=25, Capacity_max_iter=20).double()
    params, batch_stats = tt.vanilla_vae(ref, LATENT, HDIMS, IMG)

    # ---- torch side ----
    opt = torch.optim.Adam(ref.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=SCHED_GAMMA)
    tq = Queue([torch.from_numpy(e) for e in eps])
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t, **kw: tq.pop(t.shape)
    t_losses = []
    try:
        ref.train()
        step = 0
        for _ in range(EPOCHS):
            for _ in range(STEPS_PER_EPOCH):
                x = _nchw(batches[step])
                out = ref.forward(x)
                losses = ref.loss_function(*out, M_N=KLD_WEIGHT)
                opt.zero_grad()
                losses["loss"].backward()
                opt.step()
                t_losses.append(float(losses["loss"]))
                step += 1
            sched.step()
    finally:
        torch.randn_like = orig_randn_like

    # ---- jax side ----
    import ctvae_tpu.models.gaussian_base as gb
    model = vae_models["BetaVAE"](in_channels=3, latent_dim=LATENT,
                                  img_size=IMG, loss_type="B", gamma=10.0,
                                  max_capacity=25.0, Capacity_max_iter=20,
                                  dtype=jnp.float64)
    jq = Queue([jnp.asarray(e) for e in eps])
    orig_reparam = gb.reparameterize
    gb.reparameterize = lambda r, mu, lv: mu + jnp.exp(0.5 * lv) * jq.pop(mu.shape)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    tx = _build_tx(params)
    opt_state = tx.init(params)
    rngs = {s: jax.random.PRNGKey(i) for i, s in
            enumerate(("reparam", "gumbel", "noise", "dropout"))}
    j_losses = []
    try:
        for step in range(n_steps):
            x = jnp.asarray(batches[step])

            def loss_fn(p, bs):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs}, x, train=True,
                    rngs=rngs, mutable=["batch_stats"])
                losses = model.loss_function(out, M_N=KLD_WEIGHT, step=step)
                return losses["loss"], mut["batch_stats"]

            (loss, batch_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            j_losses.append(float(loss))
    finally:
        gb.reparameterize = orig_reparam
    return t_losses, j_losses


# ---------------------------------------------------------------------------
# Generic standard-backbone zoo runner — one spec per model
# ---------------------------------------------------------------------------

def _patch_reparam(*modules):
    """Replace ``reparameterize`` in the given ctvae_tpu model modules
    with a queue pop (models import it into their own namespace)."""
    def apply(queues):
        import importlib
        q = queues["eps"]
        def fake(r, mu, lv):
            return mu + jnp.exp(0.5 * lv) * q.pop(mu.shape)
        saved = []
        for name in modules:
            mod = importlib.import_module(name)
            saved.append((mod, mod.reparameterize))
            mod.reparameterize = fake
        return lambda: [setattr(m, "reparameterize", o) for m, o in saved]
    return apply


def _patch_reparam_seq(module, names):
    """Round-robin reparameterize patch for hierarchical models that
    draw several eps of different shapes per step (HVAE z2->z1, LVAE
    top-down rungs), matching the reference's torch.randn_like call
    order."""
    def apply(queues):
        import importlib
        qs = [queues[n] for n in names]
        state = {"i": 0}

        def fake(r, mu, lv):
            q = qs[state["i"] % len(qs)]
            state["i"] += 1
            return mu + jnp.exp(0.5 * lv) * q.pop(mu.shape)
        mod = importlib.import_module(module)
        orig = mod.reparameterize
        mod.reparameterize = fake
        return lambda: setattr(mod, "reparameterize", orig)
    return apply


def _patch_gumbel(*modules):
    """Replace ``gumbel_softmax_sample`` with the same formula fed by the
    shared uniform queue (reference cat_vae.py:124-129 draws
    ``torch.rand_like``)."""
    def apply(queues):
        import importlib
        q = queues["u"]
        def fake(rng, logits, tau, eps=1e-7):
            u = q.pop(logits.shape)
            g = -jnp.log(-jnp.log(u + eps) + eps)
            return jax.nn.softmax((logits + g) / tau, axis=-1)
        saved = []
        for name in modules:
            mod = importlib.import_module(name)
            saved.append((mod, mod.gumbel_softmax_sample))
            mod.gumbel_softmax_sample = fake
        return lambda: [setattr(m, "gumbel_softmax_sample", o)
                        for m, o in saved]
    return apply


def _call_hook(fn, step, extra):
    """Invoke a spec hook with (step, extra) or legacy (step)."""
    if fn is None:
        return {}
    try:
        return fn(step, extra)
    except TypeError:
        return fn(step)


def _patch_gamma_reparam():
    """GammaVAE shape-augmentation sampling, fed by the shared eps queue:
    the raw Gamma(alpha_sg + B, 1) draw is replaced by h(alpha_sg+B, eps)
    on BOTH sides (same closed form, same eps), so the inv_h -> h gradient
    path, the beta scaling, and the Gamma-Gamma KL are what's under test
    (reference gamma_vae.py:116-136)."""
    def apply(queues):
        from ctvae_tpu.models.gamma_vae import GammaVAE
        q = queues["eps"]
        orig = GammaVAE.reparameterize

        def fake(self, rng, alpha, beta):
            a_sg = jax.lax.stop_gradient(alpha) + self.gamma_shape
            z_hat = jax.lax.stop_gradient(
                GammaVAE.h_func(a_sg, q.pop(alpha.shape)))
            eps = GammaVAE.inv_h_func(alpha + self.gamma_shape, z_hat)
            return GammaVAE.h_func(alpha + self.gamma_shape, eps) / beta
        GammaVAE.reparameterize = fake
        return lambda: setattr(GammaVAE, "reparameterize", orig)
    return apply


def _gamma_torch_patch(ref_mod):
    """Mirror of _patch_gamma_reparam on the reference side: Gamma.sample
    becomes h(concentration, eps) with eps popped from the shared queue
    (via the already-patched torch.randn)."""
    class FakeGamma:
        def __init__(self, concentration, rate):
            self.c = concentration

        def sample(self):
            eps = torch.randn(*self.c.shape)
            return ((self.c - 1. / 3.)
                    * (1 + eps / torch.sqrt(9. * self.c - 3.)) ** 3).detach()
    ref_mod.Gamma = FakeGamma


def _vamp_torch_patch(ref_mod):
    """The reference VampVAE loss unconditionally calls .cuda(device)
    on its pseudo-input (vampvae.py:145) — identity it out for CPU."""
    torch.Tensor.cuda = lambda self, *a, **kw: self


def _cvae_torch_patch(ref_mod):
    """The reference CVAE downcasts labels with .float() (cvae.py:120),
    which under a float64 run would feed float32 into double Linears.
    Cast-to-working-dtype instead (ours upcasts, never downcasts)."""
    torch.Tensor.float = lambda self: self.to(torch.get_default_dtype())


def _mssim_float64_window(ref_mod):
    """Two minimal precision/stability patches on the reference MSSIM:

    1. The reference window is cast to float32 (mssim_vae.py:210), which
       torch cannot convolve with float64 images. Widen the
       float32-ROUNDED taps back to float64 — ops/ssim.py widens its own
       float32 window to the input dtype the same way, so both
       frameworks convolve with bitwise-identical taps.
    2. Enable the reference's own commented-out normalize stabilization
       (mssim_vae.py:271-274, "(x+1)/2 to avoid NaNs during training
       unstable models"): without it BOTH frameworks NaN at step 0 on
       randomly-initialized reconstructions (negative ssim/cs raised to
       fractional powers). ctvae_tpu ships normalize=True as the default
       for exactly this reason, so the trajectory test certifies the
       shipped semantics. The per-scale ssim/cs math is untouched (the
       wrapper below calls the reference's own ``ssim``)."""
    import torch.nn.functional as F
    M = ref_mod.MSSIM
    orig = M.create_window
    M.create_window = lambda self, ws, ch: orig(self, ws, ch).double()

    def forward_normalized(self, img1, img2):
        # reference MSSIM.forward (mssim_vae.py:250-280) with the
        # normalize branch enabled; everything else verbatim semantics
        weights = torch.tensor(
            [0.0448, 0.2856, 0.3001, 0.2363, 0.1333],
            dtype=img1.dtype, device=img1.device)
        mssim, mcs = [], []
        for _ in range(weights.shape[0]):
            sim, cs = self.ssim(img1, img2, self.window_size,
                                self.in_channels, self.size_average)
            mssim.append(sim)
            mcs.append(cs)
            img1 = F.avg_pool2d(img1, (2, 2))
            img2 = F.avg_pool2d(img2, (2, 2))
        mssim = (torch.stack(mssim) + 1) / 2
        mcs = (torch.stack(mcs) + 1) / 2
        pow1 = mcs ** weights
        pow2 = mssim ** weights
        return 1 - torch.prod(pow1[:-1] * pow2[-1])

    M.forward = forward_normalized


STD_SPECS = {
    # name: reference ctor module/class/kwargs, ours registry kwargs,
    # per-step noise draws in the reference's torch call order
    # ("eps" = reparameterization, "prior_z" = MMD/SWD prior sample,
    # "proj" = SWAE random projections, "u" = Gumbel uniform), optional
    # torch-side patch / extra shapes / fwd & loss kwargs hooks.
    "betah": dict(ref_module="beta_vae", ref_cls="BetaVAE",
                  ref_kw=dict(loss_type="H", beta=4.0),
                  ours="BetaVAE", ours_kw=dict(loss_type="H", beta=4.0),
                  draws=("eps",), seed=11),
    "iwae": dict(ref_module="iwae", ref_cls="IWAE",
                 ref_kw=dict(num_samples=5),
                 ours="IWAE", ours_kw=dict(num_samples=5),
                 draws=("eps",), shapes=lambda B, D: {"eps": (B, 5, D)},
                 jax_noise=(_patch_reparam("ctvae_tpu.models.iwae"),),
                 seed=19),
    "miwae": dict(ref_module="miwae", ref_cls="MIWAE",
                  ref_kw=dict(num_samples=4, num_estimates=3),
                  ours="MIWAE", ours_kw=dict(num_samples=4,
                                             num_estimates=3),
                  draws=("eps",),
                  shapes=lambda B, D: {"eps": (B, 3, 4, D)},
                  jax_noise=(_patch_reparam("ctvae_tpu.models.miwae"),),
                  seed=20),
    "cat": dict(ref_module="cat_vae", ref_cls="CategoricalVAE",
                ref_kw=dict(categorical_dim=8, temperature=0.5, alpha=30.0),
                ours="CategoricalVAE",
                ours_kw=dict(categorical_dim=8, temperature=0.5, alpha=30.0),
                transplant="deterministic",
                draws=("u",), uniform=("u",),
                shapes=lambda B, D: {"u": (B, D, 8)},
                jax_noise=(_patch_gumbel("ctvae_tpu.models.cat_vae"),),
                fwd_kw=lambda step: {"step": step},
                torch_loss_kw=lambda step: {"batch_idx": step},
                seed=21),
    "joint": dict(ref_module="joint_vae", ref_cls="JointVAE",
                  ref_kw=dict(categorical_dim=8, latent_num_iter=20,
                              categorical_num_iter=20),
                  ours="JointVAE",
                  ours_kw=dict(categorical_dim=8, latent_num_iter=20,
                               categorical_num_iter=20),
                  transplant="joint",
                  draws=("eps", "u"), uniform=("u",),
                  shapes=lambda B, D: {"u": (B, 8)},
                  jax_noise=(
                      _patch_reparam("ctvae_tpu.models.joint_vae"),
                      _patch_gumbel("ctvae_tpu.models.joint_vae"),),
                  torch_loss_kw=lambda step: {"batch_idx": step},
                  torch_patch=lambda ref_mod: setattr(
                      ref_mod.JointVAE, "num_iter", 1),
                  seed=22),
    "dip": dict(ref_module="dip_vae", ref_cls="DIPVAE", ref_kw={},
                # the reference-exact scalar E[Sigma] quirk (dip_vae.py:152)
                ours="DIPVAE", ours_kw=dict(variance_term="reference"),
                draws=("eps",), seed=12, lr=1e-4),
    "logcosh": dict(ref_module="logcosh_vae", ref_cls="LogCoshVAE",
                    ref_kw=dict(alpha=10.0, beta=1.0),
                    ours="LogCoshVAE", ours_kw=dict(alpha=10.0, beta=1.0),
                    draws=("eps",), seed=13),
    "mssim": dict(ref_module="mssim_vae", ref_cls="MSSIMVAE", ref_kw={},
                  # reference-exact inverted window; normalize=True is the
                  # shipped default (see _mssim_float64_window on why)
                  ours="MSSIMVAE",
                  ours_kw=dict(window_mode="reference", normalize=True),
                  # LR 1e-3: the multi-scale pow chain amplifies rounding
                  # ~10x/step at LR 5e-3 (step 0 matches at 1e-16)
                  draws=("eps",), seed=14, lr=1e-3,
                  torch_patch=_mssim_float64_window),
    "wae_imq": dict(ref_module="wae_mmd", ref_cls="WAE_MMD",
                    ref_kw=dict(kernel_type="imq", reg_weight=100,
                                latent_var=2.0),
                    ours="WAE_MMD",
                    ours_kw=dict(kernel_type="imq", reg_weight=100.0,
                                 latent_var=2.0),
                    deterministic=True, draws=("prior_z",), seed=15),
    "wae_rbf": dict(ref_module="wae_mmd", ref_cls="WAE_MMD",
                    ref_kw=dict(kernel_type="rbf", reg_weight=100,
                                latent_var=2.0),
                    ours="WAE_MMD",
                    ours_kw=dict(kernel_type="rbf", reg_weight=100.0,
                                 latent_var=2.0),
                    deterministic=True, draws=("prior_z",), seed=16),
    # LR 1e-4: the sort-based SWD has a permutation (non-smooth) gradient;
    # at LR 5e-3 float-level noise flips sort orders within a few steps
    # and amplifies chaotically (step 0 still matches at 1e-15)
    "swae": dict(ref_module="swae", ref_cls="SWAE",
                 ref_kw=dict(reg_weight=100, wasserstein_deg=2.0,
                             num_projections=50, projection_dist="normal"),
                 ours="SWAE",
                 ours_kw=dict(reg_weight=100.0, wasserstein_deg=2.0,
                              num_projections=50, projection_dist="normal"),
                 deterministic=True, draws=("prior_z", "proj"), seed=17,
                 lr=1e-4),
    "info": dict(ref_module="info_vae", ref_cls="InfoVAE",
                 ours="InfoVAE",
                 ref_kw=dict(alpha=-0.5, beta=5.0, reg_weight=110,
                             kernel_type="imq", latent_var=2.0),
                 ours_kw=dict(alpha=-0.5, beta=5.0, reg_weight=110.0,
                              kernel_type="imq", latent_var=2.0),
                 draws=("eps", "prior_z"), seed=18),
    # LR 1e-4: at 5e-3 the VampVAE objective itself explodes (E_log_q is
    # unbounded below; BOTH frameworks reach -1e102 by step 7, tracking
    # each other until rounding amplifies through the blow-up)
    "vamp": dict(ref_module="vampvae", ref_cls="VampVAE",
                 ref_kw=dict(num_components=50),
                 ours="VampVAE", ours_kw=dict(num_components=50),
                 transplant="vamp", draws=("eps",), seed=23, lr=1e-4,
                 torch_patch=_vamp_torch_patch),
    "cvae": dict(ref_module="cvae", ref_cls="ConditionalVAE",
                 ref_args=lambda latent: (3, 40, latent),
                 ref_kw={}, ours="ConditionalVAE",
                 ours_kw=dict(num_classes=40),
                 transplant="cvae", draws=("eps",), seed=24,
                 torch_patch=_cvae_torch_patch,
                 jax_noise=(_patch_reparam("ctvae_tpu.models.cvae"),),
                 make_extra=lambda rng, B, n: {
                     "labels": (rng.uniform(size=(n, B, 40)) < 0.5)
                     .astype(np.float64)},
                 torch_fwd_kw=lambda step, extra: {
                     "labels": torch.from_numpy(extra["labels"][step])},
                 fwd_kw=lambda step, extra: {
                     "labels": jnp.asarray(extra["labels"][step])}),
    "gamma": dict(ref_module="gamma_vae", ref_cls="GammaVAE",
                  ref_kw=dict(gamma_shape=8.0, prior_shape=2.0,
                              prior_rate=1.0),
                  ours="GammaVAE",
                  ours_kw=dict(gamma_shape=8.0, prior_shape=2.0,
                               prior_rate=1.0),
                  transplant="gamma", draws=("eps",), seed=25, lr=1e-4,
                  jax_noise=(_patch_gamma_reparam(),),
                  torch_patch=_gamma_torch_patch),
    # LR 1e-4 for the two hierarchical models: at the shipped 5e-3 both
    # objectives blow up within 2-3 Adam steps in BOTH frameworks
    # (documented in PARITY.md); a tame LR keeps 10 steps comparable.
    "hvae": dict(ref_module="hvae", ref_cls="HVAE",
                 ref_args=lambda latent: (3, 16, 8),
                 ref_kw={}, ours="HVAE",
                 ours_ctor=lambda vm, img: vm["HVAE"](
                     in_channels=3, latent1_dim=16, latent2_dim=8,
                     img_size=img, dtype=jnp.float64),
                 transplant="hvae",
                 draws=("eps", "eps2"),
                 shapes=lambda B, D: {"eps": (B, 8), "eps2": (B, 16)},
                 jax_noise=(_patch_reparam_seq("ctvae_tpu.models.hvae",
                                               ("eps", "eps2")),),
                 seed=27, lr=1e-4),
    "lvae": dict(ref_module="lvae", ref_cls="LVAE",
                 ref_args=lambda latent: (3, [4, 8, 16, 32, 128],
                                          [32, 64, 128, 256, 512]),
                 ref_kw={}, ours="LVAE",
                 ours_ctor=lambda vm, img: vm["LVAE"](
                     in_channels=3, latent_dims=(4, 8, 16, 32, 128),
                     hidden_dims=(32, 64, 128, 256, 512),
                     img_size=img, dtype=jnp.float64),
                 transplant="lvae",
                 draws=("eps", "eps2", "eps3", "eps4", "eps5"),
                 shapes=lambda B, D: {"eps": (B, 128), "eps2": (B, 32),
                                      "eps3": (B, 16), "eps4": (B, 8),
                                      "eps5": (B, 4)},
                 jax_noise=(_patch_reparam_seq(
                     "ctvae_tpu.models.lvae",
                     ("eps", "eps2", "eps3", "eps4", "eps5")),),
                 seed=28, lr=1e-4),
    "betatc": dict(ref_module="betatc_vae", ref_cls="BetaTCVAE",
                   ref_kw=dict(anneal_steps=200, alpha=1.0, beta=6.0,
                               gamma=1.0),
                   ours="BetaTCVAE",
                   ours_kw=dict(anneal_steps=200, alpha=1.0, beta=6.0,
                                gamma=1.0),
                   transplant="betatc", hdims=[32, 32, 32, 32],
                   draws=("eps",), seed=26,
                   jax_noise=(
                       _patch_reparam("ctvae_tpu.models.betatc_vae"),)),
}


def run_standard(key):
    """One trajectory run for a standard-backbone zoo model: transplant,
    shared data/noise, the reference optimizer recipe, per-step losses."""
    import importlib
    spec = STD_SPECS[key]
    ref_mod = importlib.import_module(f"models.{spec['ref_module']}")
    from ctvae_tpu.models import vae_models

    B, IMG, LATENT, NPROJ = 4, 64, 10, 50
    HDIMS = spec.get("hdims", [32, 64, 128, 256, 512])
    lr = spec.get("lr", LR)
    n_steps = EPOCHS * STEPS_PER_EPOCH
    shapes = {"eps": (B, LATENT), "prior_z": (B, LATENT),
              "proj": (NPROJ, LATENT)}
    if "shapes" in spec:
        shapes.update(spec["shapes"](B, LATENT))
    uniform = set(spec.get("uniform", ()))
    rng = np.random.default_rng(spec["seed"])
    batches = [rng.uniform(size=(B, IMG, IMG, 3)) for _ in range(n_steps)]
    noise = [{name: (rng.uniform(size=shapes[name]) if name in uniform
                     else rng.standard_normal(shapes[name]))
              for name in spec["draws"]} for _ in range(n_steps)]
    extra = (spec["make_extra"](rng, B, n_steps)
             if "make_extra" in spec else None)

    torch.manual_seed(spec["seed"])
    args = spec["ref_args"](LATENT) if "ref_args" in spec else (3, LATENT)
    ref = getattr(ref_mod, spec["ref_cls"])(*args,
                                            **spec["ref_kw"]).double()
    if "torch_patch" in spec:
        spec["torch_patch"](ref_mod)
    transplants = {"vanilla": tt.vanilla_vae,
                   "deterministic": tt.deterministic_vae,
                   "joint": tt.joint_vae,
                   "vamp": tt.vamp_vae,
                   "cvae": tt.conditional_vae,
                   "gamma": tt.gamma_vae,
                   "betatc": lambda r, d, hd, img: tt.betatc_vae(r, hd,
                                                                 img),
                   "hvae": lambda r, d, hd, img: tt.hvae(r, hd, img),
                   "lvae": lambda r, d, hd, img: tt.lvae(r, hd, img)}
    tname = spec.get("transplant",
                     "deterministic" if spec.get("deterministic")
                     else "vanilla")
    params, batch_stats = transplants[tname](ref, LATENT, HDIMS, IMG)
    has_bn = bool(batch_stats)

    # ---- torch side: every rand-family draw pops the shared queue in
    # call order (reparam/Gumbel in forward; prior_z/proj inside the loss)
    opt = torch.optim.Adam(ref.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=SCHED_GAMMA)
    flat = [v for st in noise for v in st.values()]
    tq = Queue([torch.from_numpy(v) for v in flat])
    orig = (torch.randn_like, torch.randn, torch.rand_like)
    torch.randn_like = lambda t, **kw: tq.pop(t.shape)
    torch.randn = lambda *shape, **kw: tq.pop(shape)
    torch.rand_like = lambda t, **kw: tq.pop(t.shape)
    t_losses = []
    try:
        ref.train()
        step = 0
        for _ in range(EPOCHS):
            for _ in range(STEPS_PER_EPOCH):
                x = _nchw(batches[step])
                out = ref.forward(
                    x, **_call_hook(spec.get("torch_fwd_kw"), step, extra))
                t_loss_kw = (spec["torch_loss_kw"](step)
                             if "torch_loss_kw" in spec else {})
                losses = ref.loss_function(*out, M_N=KLD_WEIGHT,
                                           **t_loss_kw)
                opt.zero_grad()
                losses["loss"].backward()
                opt.step()
                t_losses.append(float(losses["loss"]))
                step += 1
            sched.step()
    finally:
        torch.randn_like, torch.randn, torch.rand_like = orig

    # ---- jax side: eps/Gumbel via module patches; prior_z/proj via the
    # loss functions' explicit injection kwargs
    import ctvae_tpu.models.gaussian_base as gb
    from ctvae_tpu.training.optimizers import build_optimizers
    if "ours_ctor" in spec:
        model = spec["ours_ctor"](vae_models, IMG)
    else:
        model = vae_models[spec["ours"]](in_channels=3, latent_dim=LATENT,
                                         img_size=IMG, dtype=jnp.float64,
                                         **spec["ours_kw"])
    queues = {name: Queue([jnp.asarray(st[name]) for st in noise])
              for name in spec["draws"]}
    restores = []
    if "eps" in spec["draws"]:
        eps_q = queues["eps"]
        orig_reparam = gb.reparameterize
        gb.reparameterize = (lambda r, mu, lv:
                             mu + jnp.exp(0.5 * lv) * eps_q.pop(mu.shape))
        restores.append(lambda: setattr(gb, "reparameterize", orig_reparam))
    for patcher in spec.get("jax_noise", ()):
        restores.append(patcher(queues))

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    tx = build_optimizers({"LR": lr, "scheduler_gamma": SCHED_GAMMA},
                          params, steps_per_epoch=STEPS_PER_EPOCH)[0]
    opt_state = tx.init(params)
    rngs = {s: jax.random.PRNGKey(i) for i, s in
            enumerate(("reparam", "gumbel", "noise", "dropout"))}
    j_losses = []
    try:
        for step in range(n_steps):
            x = jnp.asarray(batches[step])
            fwd_kw = _call_hook(spec.get("fwd_kw"), step, extra)
            loss_kw = {"M_N": KLD_WEIGHT, "step": step}
            if "prior_z" in spec["draws"]:
                loss_kw["prior_z"] = jnp.asarray(noise[step]["prior_z"])
            if "proj" in spec["draws"]:
                raw = noise[step]["proj"]
                loss_kw["proj"] = jnp.asarray(
                    raw / np.linalg.norm(raw, axis=1, keepdims=True))

            def loss_fn(p, bs):
                variables = {"params": p}
                if has_bn:
                    variables["batch_stats"] = bs
                out, mut = model.apply(
                    variables, x, train=True,
                    rngs=rngs, mutable=["batch_stats"], **fwd_kw)
                losses = model.loss_function(out, **loss_kw)
                return losses["loss"], mut.get("batch_stats", bs)

            (loss, batch_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            j_losses.append(float(loss))
    finally:
        for r in restores:
            r()
    return t_losses, j_losses


RUNNERS = {"vanilla": run_vanilla, "vqvae": run_vqvae, "ct": run_ct,
           "fvae": run_fvae, "betab": run_betab,
           "mcq": lambda: run_vqvae(mcq=True), "dfc": run_dfc,
           **{k: (lambda k=k: run_standard(k)) for k in STD_SPECS}}


def run_one(which):
    out = RUNNERS[which]()
    t_losses, j_losses = out[0], out[1]
    rel = [abs(a - b) / max(abs(a), 1e-12)
           for a, b in zip(t_losses, j_losses)]
    payload = {
        "model": which, "steps": len(t_losses),
        "torch_losses": t_losses, "jax_losses": j_losses,
        "rel_diffs": rel, "max_rel_diff": max(rel),
        "torch_first": t_losses[0], "torch_last": t_losses[-1],
    }
    if len(out) > 2:  # optimizer-rounding control (CT only)
        c = out[2]
        payload["control_losses"] = c
        payload["control_rel_diffs"] = [
            abs(a - b) / max(abs(a), 1e-12)
            for a, b in zip(t_losses, c)]
        payload["control_max_rel"] = max(payload["control_rel_diffs"])
        # jax vs the optax-op-order torch control: SAME update math and
        # op order -> must stay tight; only XLA-vs-torch kernel rounding
        # separates them
        payload["jax_vs_control_rel"] = [
            abs(a - b) / max(abs(a), 1e-12)
            for a, b in zip(c, j_losses)]
    return payload


def main():
    """One JSON line per requested model. Comma-separate keys to
    amortize interpreter + import startup over many trajectory runs
    (the zoo test runs all STD_SPECS keys in one subprocess)."""
    which = sys.argv[1] if len(sys.argv) > 1 else "vanilla"
    for key in which.split(","):
        print(json.dumps(run_one(key)), flush=True)


if __name__ == "__main__":
    main()

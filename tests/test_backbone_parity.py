"""Full forward-pass parity of the conv backbones vs the reference
torch models with transplanted weights — the layer the round-1 suite
never pinned (loss functions were compared on fixed inputs; the conv
stacks themselves were not). This is what certifies torch-exact
padding: Conv k3s2 needs explicit (1,1) (XLA 'SAME' pads (0,1)),
ConvTranspose k3s2p1op1 needs (1,2) + kernel flip, k4s2p1 == 'SAME'.

Reference: /root/reference/models/vanilla_vae.py:24-75 (standard
backbone), mcq_vae.py:161-239 (VQ backbone), vq_vae.py:57-70
(ResidualLayer: Conv3x3 -> ReLU -> Conv1x1, no pre-activation).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import torch_transplant as tt  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_models():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    from _pyg_install import (install_torch_geometric,
                              install_torchvision_stub)
    install_torchvision_stub()
    install_torch_geometric()
    sys.path.insert(0, REF)
    try:
        import importlib
        yield {"vanilla": importlib.import_module("models.vanilla_vae"),
               "mcq": importlib.import_module("models.mcq_vae")}
    finally:
        sys.path.remove(REF)


def test_vanilla_backbone_forward_parity(ref_models):
    """encode -> mu/log_var and decode(mu) with transplanted weights at
    the north-star config (64x64, hidden [32,...,512])."""
    from ctvae_tpu.models import vae_models

    torch.manual_seed(0)
    ref = ref_models["vanilla"].VanillaVAE(3, 10)
    ref.eval()

    ours = vae_models["VanillaVAE"](in_channels=3, latent_dim=10,
                                    img_size=64)
    params, batch_stats = tt.vanilla_vae(ref, 10, [32, 64, 128, 256, 512],
                                         64)
    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        r_mu, r_lv = ref.encode(tx)
        r_dec = ref.decode(r_mu)

    o_mu, o_lv = ours.apply(variables, jnp.asarray(x), train=False,
                            method=ours.encode)
    np.testing.assert_allclose(np.asarray(o_mu), r_mu.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_lv), r_lv.numpy(),
                               rtol=1e-4, atol=1e-5)
    o_dec = ours.apply(variables, o_mu, train=False, method=ours.decode)
    np.testing.assert_allclose(np.asarray(o_dec).transpose(0, 3, 1, 2),
                               r_dec.numpy(), rtol=1e-3, atol=1e-4)


def test_vanilla_backbone_train_mode_parity(ref_models):
    """Train-mode forward (batch-stat normalization) must also match —
    this is what the e2e trajectory test trains through. (Running-stat
    *updates* differ by design: torch stores unbiased running_var, flax
    biased; normalization in train mode uses biased batch stats on both
    sides.)"""
    from ctvae_tpu.models import vae_models

    torch.manual_seed(1)
    ref = ref_models["vanilla"].VanillaVAE(3, 10)
    ref.train()

    ours = vae_models["VanillaVAE"](in_channels=3, latent_dim=10,
                                    img_size=64)
    params, batch_stats = tt.vanilla_vae(ref, 10, [32, 64, 128, 256, 512],
                                         64)

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(4, 64, 64, 3)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        r_mu, r_lv = ref.encode(tx)

    (o_mu, o_lv), _ = vae_models["VanillaVAE"](
        in_channels=3, latent_dim=10, img_size=64).apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        train=True, method=ours.encode, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o_mu), r_mu.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_lv), r_lv.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_vq_backbone_forward_parity(ref_models):
    """The MCQ/VQ encoder + decoder stacks (k4s2 convs, 6 residual
    layers, 1x1 embedding conv / mirrored decoder)."""
    from ctvae_tpu.models.backbones import VQDecoder, VQEncoder

    torch.manual_seed(2)
    ref = ref_models["mcq"].MCQVAE(in_channels=3, embedding_dim=8,
                                   num_embeddings=8, img_size=16,
                                   hidden_dims=[16, 32], codebooks=2)
    ref.eval()

    def flatten(seq):
        mods = []
        for m in seq:
            if type(m).__name__ == "Sequential":
                mods += list(m)
            else:
                mods.append(m)
        return mods

    enc_p = tt.vq_encoder(flatten(ref.encoder))
    dec_p = tt.vq_decoder(flatten(ref.decoder))

    rng = np.random.default_rng(2)
    x = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        r_lat = ref.encoder(tx)
        r_dec = ref.decoder(r_lat)

    enc = VQEncoder(hidden_dims=(16, 32), embedding_dim=8)
    o_lat = enc.apply({"params": enc_p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(o_lat).transpose(0, 3, 1, 2),
                               r_lat.numpy(), rtol=1e-4, atol=1e-5)

    dec = VQDecoder(hidden_dims=(16, 32), out_channels=3)
    o_dec = dec.apply({"params": dec_p}, o_lat)
    np.testing.assert_allclose(np.asarray(o_dec).transpose(0, 3, 1, 2),
                               r_dec.numpy(), rtol=1e-4, atol=1e-5)

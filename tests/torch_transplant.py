"""Full-model weight transplant: reference torch models -> ctvae_tpu
Flax param/batch_stats pytrees.

Layout conventions (verified numerically in tests/test_backbone_parity.py):
* Conv2d OIHW -> flax HWIO,
* ConvTranspose2d [in, out, kh, kw] -> flax (kh, kw, in, out) with the
  spatial taps FLIPPED (torch transposed conv correlates with the
  flipped kernel; flax ConvTranspose does not flip),
* Linear [out, in] -> kernel [in, out],
* heads/fc layers that consume a FLATTENED feature map must permute the
  input axis C-major (torch NCHW flatten) -> HWC-major (our NHWC
  flatten); producers (decoder_input) permute the output axis likewise.
"""

from __future__ import annotations

import numpy as np


def t2n(t):
    # .copy() matters: .numpy() SHARES memory with the tensor, and an
    # in-place optimizer step on the torch side would silently mutate
    # an un-copied transplant
    return t.detach().cpu().numpy().copy()


def conv(m):
    return {"kernel": t2n(m.weight).transpose(2, 3, 1, 0),
            "bias": t2n(m.bias)}


def conv_nobias(m):
    return {"kernel": t2n(m.weight).transpose(2, 3, 1, 0)}


def convT(m):
    k = t2n(m.weight).transpose(2, 3, 0, 1)  # [kh, kw, in, out]
    out = {"kernel": np.ascontiguousarray(k[::-1, ::-1])}
    if m.bias is not None:
        out["bias"] = t2n(m.bias)
    return out


def linear(m):
    return {"kernel": t2n(m.weight).T, "bias": t2n(m.bias)}


def linear_flat_in(m, c, h, w):
    """Linear over a flattened [C,h,w] feature map -> NHWC flatten."""
    W = t2n(m.weight)                      # [out, C*h*w]
    W = W.reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(W.shape[0], -1)
    return {"kernel": W.T, "bias": t2n(m.bias)}


def linear_flat_out(m, c, h, w):
    """Linear producing a flattened [C,h,w] map (viewed NCHW) -> NHWC."""
    W = t2n(m.weight)                      # [C*h*w, in]
    b = t2n(m.bias)
    W = W.reshape(c, h, w, -1).transpose(1, 2, 0, 3).reshape(-1, W.shape[1])
    b = b.reshape(c, h, w).transpose(1, 2, 0).reshape(-1)
    return {"kernel": W.T, "bias": b}


def bn(m):
    return ({"scale": t2n(m.weight), "bias": t2n(m.bias)},
            {"mean": t2n(m.running_mean), "var": t2n(m.running_var)})


def _enc_stack(seq):
    """[Conv-BN-LeakyReLU]* Sequential -> ConvEncoder params/stats."""
    enc_p, enc_s = {}, {}
    for i, block in enumerate(seq):
        p, s = bn(block[1])
        enc_p[f"ConvBNBlock_{i}"] = {"Conv_0": conv(block[0]),
                                     "BatchNorm_0": p}
        enc_s[f"ConvBNBlock_{i}"] = {"BatchNorm_0": s}
    return enc_p, enc_s


def _dec_stack(blocks, final_conv):
    """[ConvT-BN-LeakyReLU]* + final 3x3 conv -> ConvDecoder params."""
    dec_p, dec_s = {}, {}
    for i, block in enumerate(blocks):
        p, s = bn(block[1])
        dec_p[f"DeconvBNBlock_{i}"] = {"ConvTranspose_0": convT(block[0]),
                                       "BatchNorm_0": p}
        dec_s[f"DeconvBNBlock_{i}"] = {"BatchNorm_0": s}
    dec_p["Conv_0"] = conv(final_conv)
    return dec_p, dec_s


def _standard_backbone(ref, hidden_dims, img_size):
    """Encoder/decoder of the reference VanillaVAE-style backbone
    (vanilla_vae.py:24-75) -> (enc_p, enc_s, dec_in, dec_p, dec_s, c, hw)."""
    enc_p, enc_s = _enc_stack(ref.encoder)

    hw = img_size // (2 ** len(hidden_dims))
    c = hidden_dims[-1]
    di = ref.decoder_input
    if type(di).__name__ == "Sequential":   # GammaVAE wraps it (:50)
        di = di[0]
    dec_in = {"decoder_input": linear_flat_out(di, c, hw, hw)}

    dec_p, dec_s = _dec_stack(list(ref.decoder) + [ref.final_layer],
                              ref.final_layer[3])
    return enc_p, enc_s, dec_in, dec_p, dec_s, c, hw


def vanilla_vae(ref, latent_dim, hidden_dims, img_size):
    """Reference VanillaVAE-style backbone (vanilla_vae.py:24-75) ->
    (params, batch_stats) for StandardGaussianVAE subclasses."""
    enc_p, enc_s, dec_in, dec_p, dec_s, c, hw = _standard_backbone(
        ref, hidden_dims, img_size)
    head = {"fc_mu": linear_flat_in(ref.fc_mu, c, hw, hw),
            "fc_var": linear_flat_in(ref.fc_var, c, hw, hw)}
    params = {"encoder": enc_p, "head": head, "decoder_input": dec_in,
              "decoder": dec_p}
    batch_stats = {"encoder": enc_s, "decoder": dec_s}
    return params, batch_stats


def deterministic_vae(ref, latent_dim, hidden_dims, img_size):
    """WAE/SWAE/CategoricalVAE variant: single ``fc_z`` head, no
    Gaussian heads (wae_mmd.py:41, swae.py:44, cat_vae.py:47)."""
    enc_p, enc_s, dec_in, dec_p, dec_s, c, hw = _standard_backbone(
        ref, hidden_dims, img_size)
    params = {"encoder": enc_p,
              "fc_z": linear_flat_in(ref.fc_z, c, hw, hw),
              "decoder_input": dec_in, "decoder": dec_p}
    batch_stats = {"encoder": enc_s, "decoder": dec_s}
    return params, batch_stats


def joint_vae(ref, latent_dim, hidden_dims, img_size):
    """JointVAE: Gaussian heads + categorical ``fc_z`` head
    (joint_vae.py:68-70)."""
    params, batch_stats = vanilla_vae(ref, latent_dim, hidden_dims,
                                      img_size)
    hw = img_size // (2 ** len(hidden_dims))
    params["fc_z"] = linear_flat_in(ref.fc_z, hidden_dims[-1], hw, hw)
    return params, batch_stats


def vamp_vae(ref, latent_dim, hidden_dims, img_size):
    """VampVAE: vanilla backbone + pseudo-input embedder
    (vampvae.py:78-80). The reference views the embed output NCHW
    (vampvae.py:146-147) while ours reshapes NHWC, so the output axis is
    permuted exactly like a decoder_input."""
    params, batch_stats = vanilla_vae(ref, latent_dim, hidden_dims,
                                      img_size)
    c = ref.encoder[0][0].weight.shape[1]  # in_channels
    params["embed_pseudo"] = linear_flat_out(ref.embed_pseudo[0], c,
                                             img_size, img_size)
    return params, batch_stats


def conditional_vae(ref, latent_dim, hidden_dims, img_size):
    """ConditionalVAE: vanilla backbone + class/data embedders
    (cvae.py:22-23); the encoder's first conv consumes the extra label
    channel, which the generic conv transpose handles unchanged."""
    params, batch_stats = vanilla_vae(ref, latent_dim, hidden_dims,
                                      img_size)
    # ConditionalVAE's decoder_input is a bare Dense, not the nested
    # DecoderInput module of the StandardGaussianVAE family
    params["decoder_input"] = params["decoder_input"]["decoder_input"]
    params["embed_class"] = linear(ref.embed_class)
    params["embed_data"] = conv(ref.embed_data)
    return params, batch_stats


def betatc_vae(ref, hidden_dims, img_size):
    """BetaTCVAE's distinct BN-free backbone (betatc_vae.py:30-82):
    k4-s2 convs, fc(256) bottleneck, index-named flax modules."""
    hw = img_size // (2 ** len(hidden_dims))
    params = {f"enc_convs_{i}": conv(block[0])
              for i, block in enumerate(ref.encoder)}
    params["fc"] = linear_flat_in(ref.fc, hidden_dims[-1], hw, hw)
    params["fc_mu"] = linear(ref.fc_mu)
    params["fc_var"] = linear(ref.fc_var)
    params["decoder_input"] = linear_flat_out(ref.decoder_input,
                                              hidden_dims[-1], hw, hw)
    for i, block in enumerate(ref.decoder):
        params[f"dec_convs_{i}"] = convT(block[0])
    params["dec_final_up"] = convT(ref.final_layer[0])
    params["dec_final_conv"] = conv(ref.final_layer[2])
    return params, {}


def gamma_vae(ref, latent_dim, hidden_dims, img_size):
    """GammaVAE: vanilla backbone with top-level softmax heads
    (gamma_vae.py:43-46) and a DecoderInput submodule."""
    enc_p, enc_s, dec_in, dec_p, dec_s, c, hw = _standard_backbone(
        ref, hidden_dims, img_size)
    params = {"encoder": enc_p,
              # fc heads are Sequential(Linear, Softmax) (gamma_vae.py:43-46)
              "fc_mu": linear_flat_in(ref.fc_mu[0], c, hw, hw),
              "fc_var": linear_flat_in(ref.fc_var[0], c, hw, hw),
              "decoder_input": dec_in, "decoder": dec_p}
    batch_stats = {"encoder": enc_s, "decoder": dec_s}
    return params, batch_stats


def hvae(ref, hidden_dims, img_size):
    """HVAE (hvae.py:24-105): twin conv encoders, z2-code embedders,
    p(z1|z2) heads, channel-split debed linears, shared decoder."""
    hw = img_size // (2 ** len(hidden_dims))
    c = hidden_dims[-1]
    e2p, e2s = _enc_stack(ref.encoder_z2_layers)
    e1p, e1s = _enc_stack(ref.encoder_z1_layers)
    dp, ds = _dec_stack(list(ref.decoder) + [ref.final_layer],
                        ref.final_layer[3])
    params = {
        "encoder_z2_layers": e2p,
        "head_z2": {"fc_mu": linear_flat_in(ref.fc_z2_mu, c, hw, hw),
                    "fc_var": linear_flat_in(ref.fc_z2_var, c, hw, hw)},
        "embed_z2_code": linear(ref.embed_z2_code),
        "embed_data": conv(ref.embed_data),
        "encoder_z1_layers": e1p,
        "head_z1": {"fc_mu": linear_flat_in(ref.fc_z1_mu, c, hw, hw),
                    "fc_var": linear_flat_in(ref.fc_z1_var, c, hw, hw)},
        "recons_z1_mu": linear(ref.recons_z1_mu),
        "recons_z1_log_var": linear(ref.recons_z1_log_var),
        # debed outputs are the first/second half of the CHANNELS of the
        # NCHW-viewed feature map (hvae.py:183-185)
        "debed_z1_code": linear_flat_out(ref.debed_z1_code, c // 2, hw, hw),
        "debed_z2_code": linear_flat_out(ref.debed_z2_code, c // 2, hw, hw),
        "decoder": dp,
    }
    stats = {"encoder_z2_layers": e2s, "encoder_z1_layers": e1s,
             "decoder": ds}
    return params, stats


def lvae(ref, hidden_dims, img_size):
    """LVAE (lvae.py:12-132): per-rung EncoderBlocks, top-down
    LadderBlocks (Linear+BN1d+heads), 2x2-bottleneck decoder."""
    params, stats = {}, {}
    hw = img_size
    for i, blk in enumerate(ref.encoders):
        hw = (hw + 1) // 2              # conv_out_shape (lvae.py:9-10)
        ci = hidden_dims[i]
        p, s = bn(blk.encoder[1])
        params[f"encoders_{i}"] = {
            "Conv_0": conv(blk.encoder[0]), "BatchNorm_0": p,
            "encoder_mu": linear_flat_in(blk.encoder_mu, ci, hw, hw),
            "encoder_var": linear_flat_in(blk.encoder_var, ci, hw, hw)}
        stats[f"encoders_{i}"] = {"BatchNorm_0": s}
    for i, blk in enumerate(ref.ladders):
        p, s = bn(blk.decode[1])
        params[f"ladders_{i}"] = {
            "Dense_0": linear(blk.decode[0]), "BatchNorm_0": p,
            "fc_mu": linear(blk.fc_mu), "fc_var": linear(blk.fc_var)}
        stats[f"ladders_{i}"] = {"BatchNorm_0": s}
    # the reference hard-codes the 2x2 bottleneck view (lvae.py:168)
    params["decoder_input"] = linear_flat_out(ref.decoder_input,
                                              hidden_dims[-1], 2, 2)
    for i, block in enumerate(ref.decoder):
        p, s = bn(block[1])
        params[f"dec_blocks_{i}_0"] = convT(block[0])
        params[f"dec_blocks_{i}_1"] = p
        stats[f"dec_blocks_{i}_1"] = s
    p, s = bn(ref.final_layer[1])
    params["final_up"] = convT(ref.final_layer[0])
    params["final_bn"] = p
    stats["final_bn"] = s
    params["final_conv"] = conv(ref.final_layer[3])
    return params, stats


def vq_encoder(mods):
    """Ordered torch modules of the reference VQ/MCQ encoder
    (mcq_vae.py:161-194): [Conv(s2)...] + Conv3x3 + 6 residual blocks +
    Conv1x1 -> VQEncoder params."""
    convs = [m for m in mods if type(m).__name__ == "Conv2d"]
    res = [m for m in mods if type(m).__name__ == "ResidualLayer"]
    p = {}
    for i, m in enumerate(convs):
        p[f"Conv_{i}"] = conv(m)
    for i, r in enumerate(res):
        p[f"ResidualLayer_{i}"] = {
            "Conv_0": conv_nobias(r.resblock[0]),
            "Conv_1": conv_nobias(r.resblock[2]),
        }
    return p


def gatv2_conv(c):
    """pyg_fixture.GATv2Conv -> DenseGATv2Layer params."""
    return {
        "lin_l": {"kernel": t2n(c.lin_l.weight).T,
                  "bias": t2n(c.lin_l.bias)},
        "lin_r": {"kernel": t2n(c.lin_r.weight).T,
                  "bias": t2n(c.lin_r.bias)},
        "lin_edge": t2n(c.lin_edge.weight).T,
        "att": t2n(c.att)[0],
        "bias": t2n(c.bias),
    }


def causal_transition(ref, N, A):
    """Reference CausalTransition -> ctvae_tpu CausalTransition params
    (discoverers factored into left/right first-layer halves, mask MLP,
    a_dense, and every GATv2 layer of the graph_transitioner)."""
    H = ref.latent_dims[0]
    w1l = np.zeros((A + 1, N, H), np.float64)
    w1r = np.zeros((A + 1, N, H), np.float64)
    b1 = np.zeros((A + 1, H), np.float64)
    w2 = np.zeros((A + 1, H, 1), np.float64)
    b2 = np.zeros((A + 1, 1), np.float64)
    for i, disc in enumerate(ref.graph_discovers):
        lin1, lin2 = disc[0], disc[2]
        W = t2n(lin1.weight)                     # [H, 2N]
        w1l[i] = W[:, :N].T
        w1r[i] = W[:, N:].T
        b1[i] = t2n(lin1.bias)
        w2[i] = t2n(lin2.weight).T
        b2[i] = t2n(lin2.bias)
    mask_lin = ref.mask[0]
    params = {
        "disc_w1l": w1l, "disc_w1r": w1r, "disc_b1": b1,
        "disc_w2": w2, "disc_b2": b2,
        "mask_kernel": t2n(mask_lin.weight).T,
        "mask_bias": t2n(mask_lin.bias),
        "a_dense": linear(ref.a_dense),
    }
    convs = [m for m in ref.graph_transitioner._mods
             if type(m).__name__ == "GATv2Conv"]
    params["graph_transitioner"] = {
        f"DenseGATv2Layer_{i}": gatv2_conv(c) for i, c in enumerate(convs)}
    return params


def flatten_sequential(seq):
    mods = []
    for m in seq:
        if type(m).__name__ == "Sequential":
            mods += list(m)
        else:
            mods.append(m)
    return mods


def multi_codebook_vq(ref_vq):
    """Reference MultipleCodebookVectorQuantizer -> params."""
    return {f"quantizers_{i}": {"embedding": t2n(q.embedding.weight)}
            for i, q in enumerate(ref_vq.quantizers)}


def vq_decoder(mods):
    convs = [m for m in mods if type(m).__name__ == "Conv2d"]
    convTs = [m for m in mods if type(m).__name__ == "ConvTranspose2d"]
    res = [m for m in mods if type(m).__name__ == "ResidualLayer"]
    p = {}
    for i, m in enumerate(convs):
        p[f"Conv_{i}"] = conv(m)
    for i, m in enumerate(convTs):
        p[f"ConvTranspose_{i}"] = convT(m)
    for i, r in enumerate(res):
        p[f"ResidualLayer_{i}"] = {
            "Conv_0": conv_nobias(r.resblock[0]),
            "Conv_1": conv_nobias(r.resblock[2]),
        }
    return p

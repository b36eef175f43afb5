#!/usr/bin/env python
"""Apply CT-VAE actions to images and measure causal accuracy.

Script equivalent of the reference's ``apply_action.ipynb`` (cells 0-9):

1. load a trained CTMCQVAE from a checkpoint (weights-only restore),
2. grab an action-mode test batch,
3. iteratively apply every (+/-) action to one input image, saving the
   resulting image per action per step into ``images/<dataset>_<id>/``,
4. sweep the test set in causal mode and report mean ``causal_acc`` /
   ``causal_nodir_acc``.

Usage: ``python apply_action.py -c configs/ct_mcq_vae.yaml --ckpt <dir>``
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import yaml

ACTION_NAMES = {
    "TCeleba": ["5_o_Clock_Shadow", "Arched_Eyebrows", "Attractive",
                "Bags_Under_Eyes", "Bald", "Bangs", "Big_Lips", "Big_Nose",
                "Black_Hair", "Blond_Hair"],
    "TCars3D": ["elevation", "azimuth", "object_type"],
    "TShapes3D": ["floor_hue", "wall_hue", "object_hue", "scale", "shape",
                  "orientation"],
    "TDSprites": ["shape", "scale", "orientation", "position_x",
                  "position_y"],
    "TSprites": ["bottomwear", "topwear", "hair", "eyes", "shoes", "body",
                 "action", "rotation", "frame"],
    "TSynthetic": [f"f{i}" for i in range(4)],
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-c", default="configs/ct_mcq_vae.yaml")
    parser.add_argument("--ckpt", required=True,
                        help="checkpoint directory (orbax pytree)")
    parser.add_argument("--out", default="images/")
    parser.add_argument("--run-id", default="test0")
    parser.add_argument("--steps", type=int, default=5,
                        help="iterative action applications")
    parser.add_argument("--walk", metavar="WALKS,STEPS,DIMS", default=None,
                        help="also render random latent-space walks: hold "
                             "a base latent, re-randomize DIMS channels "
                             "per step (CTMCQVAE.walk)")
    parser.add_argument("--navigate", type=int, default=None,
                        metavar="STEPS",
                        help="also render a latent interpolation with "
                             "STEPS intermediates from a test image to "
                             "its transition target (CTMCQVAE.navigate)")
    args = parser.parse_args()

    with open(args.config) as f:
        config = yaml.safe_load(f)

    import jax
    import jax.numpy as jnp

    from ctvae_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    from ctvae_tpu.data import VAEDataset
    from ctvae_tpu.models import build_model
    from ctvae_tpu.models.base import RNG_STREAMS
    from ctvae_tpu.utils.checkpoint import load_weights_only
    from ctvae_tpu.utils.images import save_image

    model = build_model(config["model_params"])
    data = VAEDataset(**config["data_params"])
    data.setup()

    # init + weights-only restore (notebook cell 1's strip-prefix load)
    batch = None
    for b in data.test_dataloader(0):
        if b.get("mode") == "action":
            batch = b
            break
    assert batch is not None, "no action batches in the test split"

    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, **{s: jax.random.fold_in(rng, i + 1)
                              for i, s in enumerate(RNG_STREAMS)}}
    variables = model.init(rngs, jnp.asarray(batch["image"]),
                           action=jnp.asarray(batch["action"]),
                           input_y=jnp.asarray(batch["input_y"]),
                           mode="action", train=False)
    variables = dict(variables)
    variables["params"] = jax.tree_util.tree_map(
        jnp.asarray, load_weights_only(args.ckpt, variables["params"]))
    apply_rngs = {s: jax.random.PRNGKey(7 + i)
                  for i, s in enumerate(RNG_STREAMS)}

    dataset_name = config["data_params"].get("dataset_name", "TShapes3D")
    action_list = ACTION_NAMES.get(
        dataset_name,
        [f"a{i}" for i in range(model.action_dim // 2)])
    nb_actions = 2 * len(action_list)
    out_dir = os.path.join(args.out, f"{dataset_name}_{args.run_id}")
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def forward_action(x, input_y, action):
        return model.apply(variables, x, input_y=input_y, action=action,
                           mode="action", train=False,
                           rngs=apply_rngs)["recons"]

    @jax.jit
    def forward_causal(x, input_y, action):
        out = model.apply(variables, x, input_y=input_y, action=action,
                          mode="causal", train=False, rngs=apply_rngs)
        return out["metrics"]["causal_acc"], out["metrics"]["causal_nodir_acc"]

    # -- iterative action application (notebook cell 6) ------------------
    sample = jnp.asarray(batch["image"][:1])
    save_image(np.asarray(sample),
               os.path.join(out_dir, f"CT-VAE_input_{dataset_name}.png"),
               normalize=True)
    sample = jnp.repeat(sample, nb_actions, axis=0)
    actions = jax.nn.one_hot(jnp.arange(nb_actions), model.action_dim)
    for step in range(args.steps):
        sample = forward_action(sample, sample, actions)
        for sign_id, sign in enumerate(["+", "-"]):
            for a_id, a_name in enumerate(action_list):
                img = sample[sign_id * len(action_list) + a_id]
                save_image(np.asarray(img)[None],
                           os.path.join(out_dir,
                                        f"CT-VAE_output_{dataset_name}_"
                                        f"{a_name}_{sign}{step}.png"),
                           normalize=True)
    print(f"action rollout images -> {out_dir}")

    # -- latent traversals (reference ct_mcq_vae.py:643-713) -------------
    if args.walk:
        n_walks, n_steps, n_dims = (int(v) for v in args.walk.split(","))
        frames = model.apply(variables, n_steps, n_dims, n_walks,
                             train=False, rngs=apply_rngs,
                             method=model.walk)
        for w in range(n_walks):
            for s in range(n_steps):
                save_image(
                    np.asarray(frames[w * n_steps + s])[None],
                    os.path.join(out_dir,
                                 f"CT-VAE_walk{w}_step{s}.png"),
                    normalize=True)
        print(f"latent walk images -> {out_dir}")

    if args.navigate is not None:
        x0 = jnp.asarray(batch["image"][0])
        y0 = jnp.asarray(batch["input_y"][0])
        frames = model.apply(variables, x0, y0, args.navigate,
                             train=False, rngs=apply_rngs,
                             method=model.navigate)
        for s in range(frames.shape[0]):
            save_image(np.asarray(frames[s])[None],
                       os.path.join(out_dir,
                                    f"CT-VAE_navigate_{s}.png"),
                       normalize=True)
        print(f"navigate images ({frames.shape[0]} frames) -> {out_dir}")

    # -- causal accuracy sweep (notebook cell 9) -------------------------
    accs, nodirs = [], []
    for b in data.test_dataloader(0):
        if b.get("mode") != "causal":
            continue
        acc, nodir = forward_causal(jnp.asarray(b["image"]),
                                    jnp.asarray(b["input_y"]),
                                    jnp.asarray(b["action"]))
        accs.append(float(acc))
        nodirs.append(float(nodir))
    if accs:
        print(f"val causal_acc mean:       {np.mean(accs):.4f} over {len(accs)} batches")
        print(f"val causal_nodir_acc mean: {np.mean(nodirs):.4f}")
    else:
        print("no causal batches in the test split")


if __name__ == "__main__":
    main()

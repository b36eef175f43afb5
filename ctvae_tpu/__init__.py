"""ctvae_tpu — a TPU-native JAX/Flax framework with the capabilities of
Strong-AI-Lab/ct-vae (CT-VAE: Disentanglement of Latent Representations via
Sparse Causal Interventions, arXiv:2302.00869).

Design notes
------------
The reference is a PyTorch / PyTorch-Lightning research codebase. This
framework is a ground-up TPU-first redesign, not a port:

* models are pure-functional Flax ``linen`` modules in NHWC layout (TPU
  native); all stochastic ops take explicit PRNG streams,
* every stateful counter of the reference (BetaVAE capacity annealing,
  Gumbel temperature, JointVAE ramps) is an explicit ``step`` input so the
  whole train step stays jittable,
* the train step is a single ``jax.jit`` over a ``jax.sharding.Mesh`` —
  data parallelism comes from batch shardings + XLA collectives, not DDP,
* the hot quantization / pairwise-discovery ops have Pallas TPU kernels
  (see ``ctvae_tpu.ops``), with pure-XLA fallbacks used on CPU.
"""

__version__ = "0.1.0"

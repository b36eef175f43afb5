"""Model registry — name -> Flax module class.

Mirrors the reference registry ``vae_models``
(/root/reference/models/__init__.py:34-56) including the aliases
``VAE`` / ``GaussianVAE`` / ``CVAE`` / ``GumbelVAE`` (:29-32).
TwoStageVAE is commented out of the reference registry (:16) and is
likewise not registered here.
"""

from .base import BaseVAE
from .backbones import ResidualLayer
from .beta_vae import BetaVAE
from .betatc_vae import BetaTCVAE
from .cat_vae import CategoricalVAE
from .cvae import ConditionalVAE
from .dfcvae import DFCVAE
from .dip_vae import DIPVAE
from .fvae import FactorVAE
from .gamma_vae import GammaVAE
from .hvae import HVAE
from .info_vae import InfoVAE
from .iwae import IWAE
from .joint_vae import JointVAE
from .logcosh_vae import LogCoshVAE
from .lvae import LVAE
from .miwae import MIWAE
from .mssim_vae import MSSIMVAE
from .swae import SWAE
from .vampvae import VampVAE
from .vanilla_vae import VanillaVAE
from .wae_mmd import WAE_MMD
from .vq_vae import VQVAE
from .mcq_vae import MCQVAE
from .ct_vae import CausalTransition, CTMCQVAE
from .twostage_vae import TwoStageVAE
from .quantizers import MultipleCodebookVectorQuantizer, VectorQuantizerMS

vae_models = {
    "VQVAE": VQVAE,
    "MCQVAE": MCQVAE,
    "CTMCQVAE": CTMCQVAE,
    "HVAE": HVAE,
    "LVAE": LVAE,
    "IWAE": IWAE,
    "SWAE": SWAE,
    "MIWAE": MIWAE,
    "DFCVAE": DFCVAE,
    "DIPVAE": DIPVAE,
    "BetaVAE": BetaVAE,
    "InfoVAE": InfoVAE,
    "WAE_MMD": WAE_MMD,
    "VampVAE": VampVAE,
    "GammaVAE": GammaVAE,
    "MSSIMVAE": MSSIMVAE,
    "JointVAE": JointVAE,
    "BetaTCVAE": BetaTCVAE,
    "FactorVAE": FactorVAE,
    "LogCoshVAE": LogCoshVAE,
    "VanillaVAE": VanillaVAE,
    "ConditionalVAE": ConditionalVAE,
    "CategoricalVAE": CategoricalVAE,
}

# TwoStageVAE stays UNREGISTERED, mirroring the reference's disabled
# status (/root/reference/models/__init__.py:16 comments it out of the
# registry); `from ctvae_tpu.models import TwoStageVAE` to use it.

# Aliases (reference /root/reference/models/__init__.py:29-32)
vae_models["VAE"] = VanillaVAE
vae_models["GaussianVAE"] = VanillaVAE
vae_models["CVAE"] = ConditionalVAE
vae_models["GumbelVAE"] = CategoricalVAE


def build_model(model_params: dict) -> BaseVAE:
    """Instantiate a model from a ``model_params`` config section: the
    ``name`` key selects the class, everything else is passed as kwargs
    (reference run.py:52). ``dtype`` may be a string ("bfloat16",
    "float32", ...) for YAML-driven mixed precision."""
    params = dict(model_params)
    name = params.pop("name")
    cls = vae_models[name]
    # Drop keys the dataclass doesn't declare (the reference tolerates
    # extra YAML kwargs through **kwargs).
    fields = {f for f in cls.__dataclass_fields__}
    params = {k: v for k, v in params.items() if k in fields}
    for k in ("hidden_dims", "latent_dims", "causal_hidden_dims"):
        if k in params and params[k] is not None:
            params[k] = tuple(params[k])
    if isinstance(params.get("dtype"), str):
        import jax.numpy as jnp
        params["dtype"] = jnp.dtype(params["dtype"]).type
    return cls(**params)

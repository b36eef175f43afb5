"""Model registry — name -> Flax module class.

Mirrors the reference registry ``vae_models``
(/root/reference/models/__init__.py:34-56) including the aliases
``VAE`` / ``GaussianVAE`` / ``CVAE`` / ``GumbelVAE`` (:29-32).
Entries are appended as each model family lands.
"""

from .base import BaseVAE
from .backbones import ResidualLayer
from .vanilla_vae import VanillaVAE

vae_models = {
    "VanillaVAE": VanillaVAE,
}

# Aliases (reference /root/reference/models/__init__.py:29-32)
vae_models["VAE"] = VanillaVAE
vae_models["GaussianVAE"] = VanillaVAE


def build_model(model_params: dict) -> BaseVAE:
    """Instantiate a model from a ``model_params`` config section: the
    ``name`` key selects the class, everything else is passed as kwargs
    (reference run.py:52)."""
    params = dict(model_params)
    name = params.pop("name")
    cls = vae_models[name]
    # Drop keys the dataclass doesn't declare (the reference tolerates
    # extra YAML kwargs through **kwargs).
    fields = {f for f in cls.__dataclass_fields__}
    params = {k: v for k, v in params.items() if k in fields}
    if "hidden_dims" in params and params["hidden_dims"] is not None:
        params["hidden_dims"] = tuple(params["hidden_dims"])
    return cls(**params)

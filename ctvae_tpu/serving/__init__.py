"""Serving/export subsystem: trained models as self-contained StableHLO
artifacts (weights baked in, cpu+tpu lowerings, optional batch
polymorphism). See ``export.py``; CLI in ``scripts/export_model.py``."""

from .export import (INFERENCE_FNS, available_fns, export_fn, load_artifact,
                     make_inference_fn, save_artifact)

__all__ = ["INFERENCE_FNS", "available_fns", "export_fn", "load_artifact",
           "make_inference_fn", "save_artifact"]

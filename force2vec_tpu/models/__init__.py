"""Force models and reference (oracle) implementations."""

from force2vec_tpu.models.forces import FORCE_MODELS, ForceModel, get_model

__all__ = ["FORCE_MODELS", "ForceModel", "get_model"]

"""Model subsystem: the multimodal transformer as pure functions over a
parameter pytree."""

from .config import ModelConfig
from .init import count_params, init_params
from .param_count import estimate_model_params
from .sampler import generate_fast
from .transformer import forward, generate, total_loss

__all__ = [
    "ModelConfig",
    "count_params",
    "init_params",
    "estimate_model_params",
    "forward",
    "generate",
    "generate_fast",
    "total_loss",
]

"""trade-AId TPU — a TPU-native multimodal time-series transformer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
`tsnuk/trade-AId-multimodal-transformer` (PyTorch, single-device):

- schema-driven multimodal ingestion (``input_schemas.yaml`` + ``config.yaml``,
  reference: schema.py, config_manager.py, compatibility_layer.py)
- a registry/pipeline of data transforms (percent-change conversion, range
  scaling, exponential binning, augmentation; reference: data_utils.py,
  processing_registry.py, processing_pipeline.py)
- a causal multimodal transformer with per-modality self-attention and
  selective cross-attention between modality streams (reference: model.py)
- directional-prediction evaluation metrics (reference: training_utils.py)

The compute path is jit-compiled JAX with Pallas TPU kernels for the hot
attention ops; batch sampling is device-resident and file-boundary aware;
training scales over a `jax.sharding.Mesh` (data/tensor parallel) instead of
the reference's single-process loop.

Layout:
    config/    YAML + programmatic configuration, schemas, function registry
    data/      file ingestion, caching, vectorized transforms, vocab build
    sampling/  jit-compatible boundary-aware batch sampling + augmentation
    models/    the multimodal transformer (pure-pytree params, functional apply)
    ops/       Pallas TPU kernels and jnp reference implementations
    parallel/  device mesh construction, sharding rules, collectives
    train/     jitted train/eval steps, metrics, checkpointing, orchestration
    utils/     logging, timing, misc helpers
"""

__version__ = "0.1.0"

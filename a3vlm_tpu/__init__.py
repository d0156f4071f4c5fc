"""a3vlm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of A3VLM (Actionable Articulation-Aware Vision Language Model).

The package rebuilds, TPU-first, both halves of the reference
(changhaonan/A3VLM):

- the multimodal LLM stack (LLaMA-2 decoder + 4-encoder vision ensemble,
  ICI tensor parallelism via shardings, KV-cached generation, training), and
- the PartNet-Mobility data-generation pipeline (URDF -> renders -> 3D triad
  annotations -> VQA tasks).

Design: pure-functional models over parameter pytrees, one
``jax.sharding.Mesh(("data", "model"))``, sharding-annotated params, and
Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

"""dit4sr_tpu — a TPU-native text-aware diffusion super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of jinlovespho/DiT4SR
(reference mounted at /root/reference): real-world x4 image super-resolution on a
Stable Diffusion 3.5-medium MMDiT with an LR-latent control token stream, optional
OCR token branches, a TESTR text-spotting head, flow-matching training, and a
flow-match Euler sampler.

Design principles (TPU-first, not a port):
  * all image tensors are NHWC (TPU conv-native layout)
  * every compute-path op is jittable; samplers are `lax.scan` loops
  * parallelism is a `jax.sharding.Mesh` + NamedSharding, never per-library DDP
  * hot kernels (joint attention over [hq|control|ocr|text] streams, multi-scale
    deformable attention) have fused Pallas implementations with jnp references
  * configs are frozen dataclasses resolved before jit — no dynamic cfg threading
"""

__version__ = "0.1.0"

from dit4sr_tpu import config as config  # noqa: F401

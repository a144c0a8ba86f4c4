"""ConTEXTure-NeRF TPU: a TPU-native JAX/Pallas re-design of zaiisao/ConTEXTure-NeRF.

Text-guided mesh texturing: a 2-D NeRF texture field over UV space optimized by
Score Distillation Sampling against a Zero123++ multiview diffusion teacher with a
depth ControlNet, bootstrapped by SD2 depth-conditioned img2img on the front view.

This is not a port: the compute path is jax/XLA/pallas (MXU matmuls, fused
attention, tiled rasterization), geometry is rasterized once and cached as a pytree,
the SDS iteration is a single jitted graph with zero host round-trips, and
multi-chip scaling rides a `jax.sharding.Mesh` (views/batch axes over ICI).

Reference layer map: SURVEY.md §1; component inventory SURVEY.md §2.
"""

__version__ = "0.1.0"

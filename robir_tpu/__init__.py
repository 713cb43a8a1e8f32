"""RobIR-TPU: a TPU-native inverse-rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the RobIR
("SIRe-IR: Robust Inverse Rendering for High-Illumination Scenes") pipeline:

- Stage 1: NeuS SDF + radiance field as geometry/radiance prior, mesh export.
- Stage 2: staged estimation of normals (Norm), visibility + indirect
  illumination (Vis), spherical-Gaussian envmap + BRDF (PBR), and
  shadow/illumination removal (CESR).

Design stance (TPU-first, not a port):
- pure functions over parameter pytrees; no mutable modules,
- fixed shapes + masked dense compute (no boolean gather/scatter),
- `jax.grad` for SDF normals, `lax.scan/while_loop` for in-jit iteration,
- rays sharded over a `jax.sharding.Mesh` data axis; params replicated,
- Pallas kernels for the per-ray hot loops.
"""

__version__ = "0.1.0"

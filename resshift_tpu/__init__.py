"""ResShift-TPU: a TPU-native (JAX/XLA/Pallas) image-restoration framework.

Re-implements the full capability surface of the ResShift reference
(residual-shifting diffusion for SR / inpainting / face restoration) with a
TPU-first architecture: functional diffusion core, single-jit samplers with
`lax.scan`, NHWC Flax networks, Pallas window-attention kernels, and
`jax.sharding` data/tile parallelism over a device mesh.
"""

__version__ = "0.1.0"

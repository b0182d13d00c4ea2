"""text2nerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-driven 3D scene
generation framework with the capabilities of eckertzhang/Text2NeRF.

Subpackages
-----------
- ``ops``       : jitted compute primitives (rays, sampling, grid gathers,
                  volume rendering, DIBR splatting, image filters, losses).
- ``models``    : TensoRF radiance fields (VM-split / CP / fused-VM), shading
                  MLPs, spherical harmonics, pix2pix depth-merge UNet,
                  diffusion + CLIP architectures.
- ``data``      : scene state management, camera trajectory generators,
                  dataset loaders and image IO.
- ``services``  : generative prior services (text2img, inpainting, monocular
                  depth, depth merge, CLIP ranking) with hermetic fallbacks.
- ``engine``    : progressive training orchestrator, evaluation/rendering,
                  checkpointing, metrics.
- ``parallel``  : device-mesh construction and sharding strategies.
- ``native``    : C++ host-side kernels (sequential hole-fill) via ctypes.
"""

__version__ = "0.1.0"

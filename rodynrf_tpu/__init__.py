"""rodynrf_tpu — a TPU-native JAX framework for Robust Dynamic Radiance Fields.

A ground-up rebuild of the capabilities of facebookresearch/robust-dynrf
(CVPR 2023, "Robust Dynamic Radiance Fields") designed for TPU hardware:

- fields are functional parameter pytrees evaluated by XLA-fused plane/line
  samplers (optionally Pallas kernels) instead of eager `F.grid_sample` chains,
- the whole training iteration (7 render passes, ~20 loss terms, camera/focal
  refinement) is ONE jitted function,
- data parallelism over rays runs via `jax.sharding`/`shard_map` on a device
  mesh with replicated field parameters.

Layer map (mirrors SURVEY.md §7):
  core/      SE(3)/6D-rotation camera math, ray generation, NDC/contraction
  ops/       grid sampling, volume compositing, distortion loss, TV regs
  fields/    static + dynamic tensorial (VM-decomposed) radiance fields
  render/    ray samplers, dual-field render pipeline, flow induction
  train/     config, losses, jitted train step, trainer loop, checkpoints
  data/      nvidia/davis loaders and the synthetic test fixture
  eval/      metrics (PSNR/SSIM), evaluation and path rendering
  parallel/  mesh construction and sharded train step
"""

__version__ = "0.1.0"

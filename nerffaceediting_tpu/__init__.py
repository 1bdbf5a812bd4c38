"""nerffaceediting_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of NeRFFaceEditing.

A from-scratch framework with the capabilities of IGLICT/NeRFFaceEditing
(EG3D tri-plane 3D GAN + disentangled geometry/appearance editing), designed
for TPU hardware: functional pytree parameters, one jit-compiled device
program per workload, Pallas kernels for the hot tri-plane render path, and
`jax.sharding`-based data parallelism.

Layering (bottom → top), mirroring the reference layer map (SURVEY.md §1):
  ops/       XLA/Pallas compute primitives   (ref: torch_utils/ops/*)
  models/    StyleGAN2 backbone, decoders, SR, discriminator, BiSeNet
  render/    rays, tri-plane sampling, hierarchical importance renderer
  editing/   plane statistics, encode/decode, projector, mask palette
  parallel/  device mesh + sharded train/infer steps
  train/     losses, training loop, dataset, augmentation, stats
  io/        checkpointing (orbax) + torch-pickle converter
  apps/      gen_samples / gen_videos / calc_metrics CLIs
"""

__version__ = "0.1.0"

"""dpig_tpu — a TPU-native JAX/XLA framework for Disentangled Person Image Generation.

A ground-up re-design (not a port) of the capabilities of
charliememory/Disentangled-Person-Image-Generation (CVPR'18):

  * Stage-I: foreground/background/pose disentangled reconstruction
  * Stage-II: adversarial Gaussian->embedding samplers per factor
  * Inference: virtual person sampling, per-factor sampling, pose-guided
    transfer, pose interpolation
  * Data: Market-1501 (128x64) and DeepFashion (256x256) tfrecord pipelines
  * Eval: SSIM / masked-SSIM / PSNR / L1 / L2 / Inception Score

Design notes (TPU-first):
  * All tensors are NHWC; compute path is jit-compiled with static shapes.
  * Pose rendering is a single fused dense op (no scatter + 29 shifted adds
    as in the reference's utils.py:237-318) — O(B*H*W*K) VPU compare,
    optionally a Pallas kernel.
  * Training steps are mesh-polymorphic: batch sharded over a 1-axis
    `jax.sharding.Mesh`, params replicated, gradient all-reduce is inserted
    by XLA.
  * GAN G-step + critic iterations run inside ONE jitted step function.
"""

__version__ = "0.1.0"

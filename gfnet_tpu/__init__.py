"""gfnet_tpu — TPU-native dense-matching + homography-estimation engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of KN-Zhang/GFNet
("Adapting Dense Matching for Homography Estimation with Grid-based
Acceleration", CVPR 2025). The compute path is jax/jnp/pallas, laid out
NHWC/channels-last for the TPU vector lanes, with MXU-shaped matmuls for
correlation and resampling and `jax.sharding`-based data parallelism.

Layer map (each module cites the reference behavior it covers):
  core/      geometry: coordinate transforms, DLT, projective warps,
             robust on-device homography solving (replaces cv2.findHomography)
  ops/       numerics: matmul-based resize, bilinear grid sampling,
             global/local correlation, KDE density, attention
  models/    flax modules: DINOv2 ViT, cross-view decoder, FPN, ConvRefiner
  matcher/   the coarse-to-fine matching driver (forward / match / sample)
  data/      host-side dataset + random-homography synthesis
  train/     loss, optimizer, jit'd sharded train step, checkpointing
  parallel/  mesh + sharding helpers
  eval/      ACE/AUC benchmark harness
"""

__version__ = "0.1.0"

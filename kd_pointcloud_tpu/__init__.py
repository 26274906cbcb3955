"""kd_pointcloud_tpu — TPU-native scene-flow estimation + knowledge distillation.

A from-scratch JAX / XLA / Pallas rebuild of the capability surface of
yunminjin2/KD-PointCloud (Bi-PointFlowNet family): coarse-to-fine bidirectional
PointConv scene-flow networks, their compressed student family, the full KD loss
menu, and the FlyingThings3D / KITTI data + evaluation stack.

Design stance (see SURVEY.md §7):
  * channels-last (B, N, C) tensors everywhere — feature dim on TPU lanes;
  * one parameterized model family instead of the reference's N copied files;
  * fixed shapes by construction (8192-pt clouds, fixed FPS pyramid, fixed K)
    so everything jits once;
  * neighbor search / sampling as jittable ops (Pallas kernels for the hot
    paths) instead of a CUDA extension;
  * data parallelism via jax.sharding over a device mesh instead of
    torch.nn.DataParallel.
"""

__version__ = "0.1.0"

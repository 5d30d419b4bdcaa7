"""mask3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for 3D room-instance
segmentation, providing the capabilities of the reference CUDA/torch stack
(mvg-inatech/room-instance-segmentation-mask3d) re-designed TPU-first.

Subpackages
-----------
- ``sparse``   — the sparse-voxel substrate (the MinkowskiEngine replacement):
                 sorted-key coordinate sets, kernel maps, gather-matmul sparse
                 convolutions, pooling pyramids, segment norms.
- ``models``   — Res16UNet backbones and the Mask3D masked-transformer decoder.
- ``ops``      — standalone numeric ops: furthest-point sampling, LSAP
                 (Hungarian) matching, segment reductions, DBSCAN post-proc.
- ``data``     — datasets, voxelizing collation into static-shape batches,
                 augmentations, PLY/LAS IO, synthetic scene generation.
- ``train``    — training/eval orchestration: criterion, optimizer, loop,
                 checkpointing, logging, runtime metering.
- ``evalm``    — instance-segmentation metrics (mAP/AP50/AP25, precision/
                 recall/F1, mean matched IoU, SDR).
- ``parallel`` — device-mesh construction and sharding strategy.
- ``preprocess`` — offline dataset preparation (Structured3D panorama
                 unprojection, voxel downsampling, Matterport3D merge).
"""

__version__ = "0.1.0"

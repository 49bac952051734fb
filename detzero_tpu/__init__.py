"""detzero_tpu — TPU-native offboard 3D auto-labeling framework.

A ground-up JAX/XLA/Pallas re-design with the capability surface of
PJLab-ADG/DetZero (ICCV 2023): multi-frame CenterPoint detection with TTA+WBF
ensembling, offline forward+reverse multi-object tracking, transformer track
refinement (GRM geometry / PRM position / CRM confidence), and Waymo-metric
evaluation — compiled for TPU with pjit/shard_map data parallelism.
"""

__version__ = "0.1.0"

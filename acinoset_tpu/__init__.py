"""acinoset_tpu — a TPU-native multi-camera 3D pose estimation framework.

A from-scratch JAX/XLA rebuild of the capabilities of AcinoSet
(African-Robotics-Unit/AcinoSet): fisheye multi-camera calibration, DLT
triangulation of DeepLabCut 2D keypoints, EKF + RTS smoothing over a
kinematic skeleton state, and full-trajectory estimation (FTE) via a
batched collocation Gauss-Newton solver — all as pure, jit-able,
vmap-able JAX programs designed for TPU (MXU-batched linear algebra,
lax.scan time recursions, pjit/shard_map data parallelism over
trajectories).

Layering (mirrors the reference's de-facto layers, SURVEY.md §1):
  ops/       L0 numeric kernels: rotations, fisheye/pinhole camera, losses
  models/    skeleton kinematics (declarative FK), cheetah model constants
  solvers/   Levenberg-Marquardt, banded collocation GN (FTE), EKF scan
  pipeline/  tri / sba / ekf / fte entry points + data (de)serialization
  calib/     checkerboard corners, intrinsic & extrinsic calibration
  parallel/  device mesh + sharding helpers (data parallel over trajectories)
  eval/      reprojection RMSE / PCK / NRMSE metrics
"""

__version__ = "0.1.0"

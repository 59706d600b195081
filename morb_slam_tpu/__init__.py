"""morb_slam_tpu — a TPU-native visual(-inertial) SLAM framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of MORB_SLAM
(ORB-SLAM3): monocular / stereo / RGB-D SLAM with optional IMU, pinhole and
Kannala-Brandt fisheye cameras, multi-map Atlas, place recognition, loop
closing and global bundle adjustment — re-architected as batched array programs
over functional struct-of-arrays map state.
"""

__version__ = "0.1.0"

"""SfM / SLAM layer: two-view geometry, triangulation, bundle adjustment,
pose graphs — the north-star extension on top of the local-features
front-end (no counterpart in the reference library, which ends at
keypoints + descriptors; see BASELINE.md configs 3-5).

Everything is batched, statically-shaped, jit-compatible JAX:
- geometry: SO(3)/SE(3) exp/log, pinhole projection
- two_view: vectorized 8-point essential matrix + fixed-iteration RANSAC,
  pose recovery, DLT triangulation
- ba: Levenberg-Marquardt bundle adjustment with the Schur complement on
  dense camera systems and masked visibility
- pose_graph: Gauss-Newton pose-graph optimization over SE(3) constraints
- sim3: Sim(3) pose graph — scale-drift-aware monocular loop closure
- distributed: landmark-sharded BA — per-shard point solves +
  psum-reduced camera Hessian over the mesh (ICI collectives)
- sparse_ba: config-5-scale map-block-partitioned BA — track-blocked
  observation storage, camera-windowed one-hot matmuls, implicit-Schur
  preconditioned CG camera solve (no dense [C,P] mask, no [C*6,C*6])
"""

from . import (geometry, two_view, ba, pose_graph, sim3, distributed,
               sparse_ba, pipeline, odometry, io, datasets)

__all__ = ["geometry", "two_view", "ba", "pose_graph", "sim3",
           "distributed", "sparse_ba", "pipeline", "odometry", "io",
           "datasets"]

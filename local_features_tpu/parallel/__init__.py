"""Multi-chip scaling: data-parallel front-end over a device mesh.

The reference is strictly single-device / single-queue
(make_a_vulkan.rs:80-84); frames are processed one at a time.  The
TPU-native scaling model is batch-of-frames data parallelism: shard the
frame batch over a `jax.sharding.Mesh` and let each chip run the whole
(identical, statically-shaped) front-end on its shard — zero collectives
needed in the front-end itself.  Collectives enter with the SfM layer
(distributed bundle adjustment), not here.
"""

from .data_parallel import (
    make_mesh,
    batched_detect_extract,
    sharded_detect_extract,
)

__all__ = [
    "make_mesh",
    "batched_detect_extract",
    "sharded_detect_extract",
]

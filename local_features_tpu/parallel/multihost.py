"""Multi-host / multi-process bootstrap (SURVEY.md §5, §2c).

Single-process JAX owns every device of one host; scaling past one host
needs three things the rest of the framework can stay oblivious to:

1. **Process bootstrap** — `jax.distributed.initialize` so all processes
   agree on the global device set (`initialize` below, env-var driven the
   way TPU pod runtimes populate them).
2. **Topology-aware meshes** — collectives should ride ICI within a host
   (slice) and cross the slower DCN only on an explicitly-named outer
   axis (`hybrid_mesh`).
3. **Host-local -> global arrays** — each process holds its local shard;
   `host_local_to_global` assembles the global sharded array without
   any process ever materializing the full value.

Everything downstream (sharded front-end, landmark-sharded BA) already
takes a `Mesh` + `PartitionSpec`s, so a hybrid mesh from here drops
straight in: shard landmarks over the ICI axis, replicate (or
data-parallel frames) over the DCN axis.

Tested with real multiple processes on CPU (2 processes x 4 virtual
devices — tests/test_multihost.py); on TPU pods the same code path is
driven by the pod runtime's env vars.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Bootstrap this process into the global JAX runtime.

    Arguments default from the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); on Cloud TPU pods `jax.distributed.initialize`
    can infer everything and all arguments may stay None.  No-op when
    the process is already initialized or when nothing indicates a
    multi-process setup (so single-host runs never pay a handshake).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    try:                       # public API where available (jax >= 0.4.34)
        already = jax.distributed.is_initialized()
    except AttributeError:
        try:
            already = jax._src.distributed.global_state.client is not None
        except AttributeError:  # private layout moved: assume fresh
            already = False
    if already:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        # single-process / TPU-pod-auto case: only call into
        # jax.distributed when the platform can self-configure
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def hybrid_mesh(
    ici_axes: dict[str, int] | None = None,
    dcn_axes: dict[str, int] | None = None,
) -> Mesh:
    """Mesh whose outer axes cross hosts (DCN) and inner axes stay
    within a host's ICI domain.

    ``hybrid_mesh(ici_axes={"landmarks": 4}, dcn_axes={"replica": 2})``
    on 2 processes x 4 devices gives a [2, 4] mesh with axis names
    ("replica", "landmarks"): psum over "landmarks" never leaves a
    host.  With one process, dcn axes of size 1 are still legal so the
    same code runs everywhere.
    """
    from jax.experimental import mesh_utils

    ici_axes = dict(ici_axes or {})
    dcn_axes = dict(dcn_axes or {})
    n_dev = len(jax.devices())
    n_proc = jax.process_count()

    if not ici_axes:
        ici_axes = {"devices": n_dev // max(n_proc, 1)}
    ici_shape = list(ici_axes.values())
    axis_names = tuple(dcn_axes) + tuple(ici_axes)

    if n_proc > 1:
        dcn_shape = list(dcn_axes.values())
        if not dcn_shape:
            dcn_axes = {"dcn": n_proc}
            dcn_shape = [n_proc]
            axis_names = tuple(dcn_axes) + tuple(ici_axes)
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=[1] * len(dcn_shape) + ici_shape,
            dcn_mesh_shape=dcn_shape + [1] * len(ici_shape),
            # Multi-slice TPU pods carry distinct slice_index per ICI
            # slice (the natural DCN granule); on CPU/GPU every device
            # reports the same slice, so the process is the granule
            process_is_granule=len(
                {getattr(d, "slice_index", None) for d in jax.devices()}
            ) <= 1,
        )
        return Mesh(devices, axis_names)

    # single process: plain mesh, dcn axes (if named) have size 1
    shape = list(dcn_axes.values()) + ici_shape
    devices = mesh_utils.create_device_mesh(shape)
    return Mesh(devices, axis_names)


def host_local_to_global(
    mesh: Mesh, spec: PartitionSpec, local: np.ndarray
) -> jax.Array:
    """Assemble a global sharded array from per-process local shards.

    Thin wrapper over `multihost_utils.host_local_array_to_global_array`
    — kept as the single entry point so callers don't depend on the
    experimental module path.
    """
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        local, mesh, spec)


def replicate(mesh: Mesh, value: np.ndarray) -> jax.Array:
    """Replicate a host value across every device of the mesh (each
    process must pass the same value)."""
    return jax.device_put(value, NamedSharding(mesh, PartitionSpec()))


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-process barrier (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)

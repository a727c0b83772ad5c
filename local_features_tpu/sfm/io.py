"""Serialization of SfM state: checkpoint / resume for reconstructions.

The reference is a stateless per-frame library with no persistence beyond
its embedded PCA models (reference: mkd_ref.rs:26-31); SURVEY.md §5 flags
map/trajectory serialization as new engineering for the SfM layer.  The
format is a single .npz per object (portable, no pickle), with a `kind`
and `version` tag so files are self-describing.

Checkpointing matters for the long-sequence odometry path
(odometry.reconstruct_long_sequence): a crashed or preempted run can be
resumed from the last saved chunk boundary instead of re-running the
whole trajectory (see `save_odometry` / `load_odometry`).
"""

from __future__ import annotations

import numpy as np

from .odometry import OdometryResult
from .pipeline import Reconstruction

_FORMAT_VERSION = 1


def save_reconstruction(path: str, rec: Reconstruction) -> None:
    """Write a Reconstruction to `path` (.npz, no pickle)."""
    np.savez_compressed(
        path,
        kind="reconstruction",
        version=_FORMAT_VERSION,
        R=rec.R, t=rec.t, X=rec.X, uv=rec.uv, mask=rec.mask,
        cost=np.float64(rec.cost),
        cost_history=(rec.cost_history if rec.cost_history is not None
                      else np.zeros((0,), np.float64)),
    )


def load_reconstruction(path: str) -> Reconstruction:
    with np.load(path, allow_pickle=False) as f:
        _check_kind(f, "reconstruction", path)
        hist = f["cost_history"]
        return Reconstruction(
            R=f["R"], t=f["t"], X=f["X"], uv=f["uv"], mask=f["mask"],
            cost=float(f["cost"]),
            cost_history=hist if hist.size else None,
        )


def save_odometry(path: str, odo: OdometryResult) -> None:
    """Write an OdometryResult (trajectory + per-chunk reconstructions).

    Each chunk (a windowed Reconstruction) is stored under prefixed keys
    so the file stays pickle-free; `load_odometry` reassembles the list.
    """
    chunk_arrays = {}
    for i, rec in enumerate(odo.chunks):
        chunk_arrays[f"c{i}_R"] = rec.R
        chunk_arrays[f"c{i}_t"] = rec.t
        chunk_arrays[f"c{i}_X"] = rec.X
        chunk_arrays[f"c{i}_uv"] = rec.uv
        chunk_arrays[f"c{i}_mask"] = rec.mask
        chunk_arrays[f"c{i}_cost"] = np.float64(rec.cost)
    np.savez_compressed(
        path,
        kind="odometry",
        version=_FORMAT_VERSION,
        R=odo.R, t=odo.t,
        n_chunks=np.int64(len(odo.chunks)),
        **chunk_arrays,
    )


def load_odometry(path: str) -> OdometryResult:
    with np.load(path, allow_pickle=False) as f:
        _check_kind(f, "odometry", path)
        chunks = [
            Reconstruction(
                R=f[f"c{i}_R"], t=f[f"c{i}_t"], X=f[f"c{i}_X"],
                uv=f[f"c{i}_uv"], mask=f[f"c{i}_mask"],
                cost=float(f[f"c{i}_cost"]),
            )
            for i in range(int(f["n_chunks"]))
        ]
        return OdometryResult(R=f["R"], t=f["t"], chunks=chunks)


def _check_kind(f, expected: str, path: str) -> None:
    kind = str(f["kind"]) if "kind" in f else "<missing>"
    if kind != expected:
        raise ValueError(f"{path}: expected kind={expected!r}, got {kind!r}")
    version = int(f["version"]) if "version" in f else -1
    if version > _FORMAT_VERSION:
        raise ValueError(
            f"{path}: format version {version} newer than supported "
            f"{_FORMAT_VERSION}")

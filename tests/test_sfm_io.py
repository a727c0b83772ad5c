"""Round-trip tests for SfM checkpoint serialization (sfm/io.py)."""

import numpy as np
import pytest

from local_features_tpu.sfm.io import (
    load_odometry, load_reconstruction, save_odometry, save_reconstruction)
from local_features_tpu.sfm.odometry import OdometryResult
from local_features_tpu.sfm.pipeline import Reconstruction


def _fake_rec(rng, C=3, P=40):
    return Reconstruction(
        R=rng.standard_normal((C, 3, 3)).astype(np.float64),
        t=rng.standard_normal((C, 3)).astype(np.float64),
        X=rng.standard_normal((P, 3)).astype(np.float64),
        uv=rng.standard_normal((C, P, 2)).astype(np.float64),
        mask=rng.random((C, P)) > 0.5,
        cost=1.25,
        cost_history=np.array([5.0, 2.0, 1.25]),
    )


def test_reconstruction_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    rec = _fake_rec(rng)
    path = str(tmp_path / "rec.npz")
    save_reconstruction(path, rec)
    rec2 = load_reconstruction(path)
    for k in ("R", "t", "X", "uv", "mask"):
        np.testing.assert_array_equal(getattr(rec, k), getattr(rec2, k))
    assert rec2.cost == rec.cost
    np.testing.assert_array_equal(rec2.cost_history, rec.cost_history)


def test_reconstruction_no_history(tmp_path):
    rng = np.random.default_rng(1)
    rec = _fake_rec(rng)
    rec.cost_history = None
    path = str(tmp_path / "rec.npz")
    save_reconstruction(path, rec)
    assert load_reconstruction(path).cost_history is None


def test_odometry_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    chunks = [_fake_rec(rng, C=4, P=20), _fake_rec(rng, C=5, P=30)]
    odo = OdometryResult(
        R=rng.standard_normal((7, 3, 3)),
        t=rng.standard_normal((7, 3)),
        chunks=chunks,
    )
    path = str(tmp_path / "odo.npz")
    save_odometry(path, odo)
    odo2 = load_odometry(path)
    np.testing.assert_array_equal(odo2.R, odo.R)
    np.testing.assert_array_equal(odo2.t, odo.t)
    assert len(odo2.chunks) == 2
    for a, b in zip(odo.chunks, odo2.chunks):
        np.testing.assert_array_equal(a.X, b.X)
        np.testing.assert_array_equal(a.mask, b.mask)
        assert a.cost == b.cost


def test_kind_mismatch(tmp_path):
    rng = np.random.default_rng(3)
    path = str(tmp_path / "rec.npz")
    save_reconstruction(path, _fake_rec(rng))
    with pytest.raises(ValueError, match="expected kind"):
        load_odometry(path)

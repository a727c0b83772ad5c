"""Dataset loader + ATE harness tests over the vendored mini fixtures
(tests/data/{tum_mini,kitti_mini} — real TUM RGB-D / KITTI odometry
directory layouts written by scripts/make_dataset_fixtures.py from the
same deterministic trajectory)."""

from pathlib import Path

import numpy as np
import pytest

from local_features_tpu.sfm import datasets

DATA = Path(__file__).parent / "data"


def _intr():
    return np.array([float(v) for v in
                     (DATA / "tum_mini" / "intr.txt").read_text().split()],
                    np.float32)


def test_load_tum_mini():
    seq = datasets.load_tum_rgbd(DATA / "tum_mini", intr=_intr())
    assert len(seq) == 10
    assert seq.frames.shape == (10, 240, 320)
    assert seq.frames.dtype == np.float32
    assert 0.0 <= seq.frames.min() and seq.frames.max() <= 1.0
    assert seq.gt_centers.shape == (10, 3)
    assert seq.gt_R.shape == (10, 3, 3)
    # rotations are orthonormal
    RtR = np.einsum("fji,fjk->fik", seq.gt_R, seq.gt_R)
    np.testing.assert_allclose(
        RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    # timestamps strictly increasing, ~30 Hz
    assert (np.diff(seq.timestamps) > 0).all()


def test_tum_association_tolerance():
    # ground-truth rows are offset +4 ms from the image rows; a 1 ms
    # tolerance must therefore drop every frame's ground truth pairing
    seq = datasets.load_tum_rgbd(DATA / "tum_mini", max_difference=0.001,
                                 intr=_intr())
    assert len(seq) == 0 or seq.gt_centers.shape[0] == 0


def test_load_tum_stride_and_limit():
    seq = datasets.load_tum_rgbd(DATA / "tum_mini", max_frames=3, stride=2,
                                 intr=_intr())
    assert len(seq) == 3
    np.testing.assert_allclose(np.diff(seq.timestamps), 0.0666, atol=1e-3)


def test_load_kitti_mini():
    seq = datasets.load_kitti_odometry(DATA / "kitti_mini", seq="00")
    assert len(seq) == 10
    assert seq.frames.shape == (10, 240, 320)
    np.testing.assert_allclose(seq.intr, _intr(), rtol=1e-6)
    assert seq.gt_centers.shape == (10, 3)


def test_formats_agree():
    """Both fixtures encode the SAME trajectory: loaders must agree."""
    tum = datasets.load_tum_rgbd(DATA / "tum_mini", intr=_intr())
    kit = datasets.load_kitti_odometry(DATA / "kitti_mini")
    np.testing.assert_allclose(tum.gt_centers, kit.gt_centers, atol=1e-5)
    np.testing.assert_allclose(tum.gt_R, kit.gt_R, atol=1e-5)
    np.testing.assert_allclose(tum.frames, kit.frames, atol=1e-6)


def test_quat_to_rotmat_known_values():
    # 90 deg about z: (0, 0, sin45, cos45)
    s = np.sqrt(0.5)
    R = datasets.quat_to_rotmat(np.array([0.0, 0.0, s, s]))
    np.testing.assert_allclose(
        R, np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]), atol=1e-12)
    # identity
    np.testing.assert_allclose(
        datasets.quat_to_rotmat(np.array([0.0, 0.0, 0.0, 1.0])), np.eye(3),
        atol=1e-12)


def test_evaluate_ate_perfect_and_shifted():
    tum = datasets.load_tum_rgbd(DATA / "tum_mini", intr=_intr())
    # ground truth against itself: zero (up to alignment numerics)
    assert datasets.evaluate_ate(tum.gt_centers, tum) < 1e-5
    # similarity-transformed copy: still ~zero (Sim(3) alignment)
    Rz = datasets.quat_to_rotmat(np.array([0.0, 0.0, 0.6, 0.8]))
    warped = 2.5 * tum.gt_centers @ Rz.T + np.array([5.0, -3.0, 1.0])
    assert datasets.evaluate_ate(warped, tum) < 1e-4
    # corrupted copy: non-zero
    bad = tum.gt_centers + np.random.default_rng(0).normal(
        0, 0.5, tum.gt_centers.shape)
    assert datasets.evaluate_ate(bad, tum) > 0.05


@pytest.mark.slow
def test_odometry_on_tum_mini():
    """BASELINE config 4 end-to-end: real dataset format -> trajectory ->
    ATE vs ground truth."""
    from local_features_tpu.sfm.odometry import reconstruct_long_sequence

    seq = datasets.load_tum_rgbd(DATA / "tum_mini", intr=_intr())
    res = reconstruct_long_sequence(seq.frames, seq.intr, window=6,
                                    overlap=3, max_features=500, seed=1)
    ate = datasets.evaluate_ate(res, seq)
    extent = float(np.linalg.norm(
        seq.gt_centers - seq.gt_centers.mean(0), axis=1).max())
    # 10% gate: the PNG round-trip quantizes to 8-bit, which triples ATE
    # vs float frames (2.1% -> 6.8% on this trajectory) by adding noise
    # to subpixel refinement. The tight 5% precision gate lives in
    # test_odometry.py on float frames; this test pins the dataset
    # format -> trajectory -> ATE plumbing under realistic 8-bit input.
    assert ate < 0.10 * extent, (ate, extent)


@pytest.mark.slow
def test_batched_chain_on_dataset_fixtures():
    """Config-4 DEFAULT chain (reconstruct_sequence_batched) composed
    end-to-end over BOTH vendored dataset formats: loader -> batched
    front-end -> matching -> tracks -> init -> blocked sparse BA ->
    ATE.  The loaders were previously only tested in isolation; this
    pins the full plumbing on the real TUM/KITTI directory layouts."""
    from local_features_tpu.sfm.pipeline import reconstruct_sequence_batched

    for loader in (
        lambda: datasets.load_tum_rgbd(DATA / "tum_mini", intr=_intr()),
        lambda: datasets.load_kitti_odometry(DATA / "kitti_mini"),
    ):
        seq = loader()
        res = reconstruct_sequence_batched(
            seq.frames, seq.intr, max_features=500, seed=1,
            ba_iters=6, ba_rounds=2)
        assert res.R.shape == (len(seq), 3, 3)
        ate = datasets.evaluate_ate(res, seq)
        extent = float(np.linalg.norm(
            seq.gt_centers - seq.gt_centers.mean(0), axis=1).max())
        # same 10% gate rationale as test_odometry_on_tum_mini: the
        # 8-bit PNG round trip adds subpixel noise; the tight precision
        # gates live in test_chain_ate.py on float frames
        assert ate < 0.10 * extent, (ate, extent)

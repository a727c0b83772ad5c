"""Golden-parity tests for orientation assignment + keypoint compaction."""

import numpy as np
import jax.numpy as jnp

from local_features_tpu import golden
import local_features_tpu.ops.scale_space as jss
from local_features_tpu.ops.detect import detect_blobs
from local_features_tpu.ops.orientation import (
    keypoints_from_blobs,
    orientation_histograms,
)


def _setup(test_image):
    coarse_g = golden.scale_space(test_image, 4)
    fine_g = golden.fine_volume(coarse_g)
    blobs_g = golden.scan_extrema(fine_g)

    coarse_j = jss.scale_space(jnp.asarray(test_image), 4)
    fine_j = jss.fine_volume(coarse_j)
    blobs_j = detect_blobs(fine_j, max_blobs=256)
    return coarse_g, blobs_g, coarse_j, blobs_j


def test_orientations_match_golden(test_image):
    coarse_g, blobs_g, coarse_j, blobs_j = _setup(test_image)
    angles_j, peak_j = orientation_histograms(
        coarse_j, blobs_j.x, blobs_j.y, blobs_j.size, blobs_j.valid
    )
    angles_j = np.asarray(angles_j)
    peak_j = np.asarray(peak_j)
    valid = np.asarray(blobs_j.valid)

    checked = 0
    for i in np.flatnonzero(valid):
        bx = float(np.asarray(blobs_j.x)[i])
        by = float(np.asarray(blobs_j.y)[i])
        bs = float(np.asarray(blobs_j.size)[i])
        got = sorted(angles_j[i][peak_j[i]])
        want = sorted(golden.keypoint_orientations(coarse_g, bx, by, bs))
        assert len(got) == len(want), (i, got, want)
        np.testing.assert_allclose(got, want, atol=0.05)
        checked += 1
    assert checked > 3


def test_keypoint_compaction(test_image):
    _, _, coarse_j, blobs_j = _setup(test_image)
    kps = keypoints_from_blobs(coarse_j, blobs_j, max_keypoints=128)
    valid = np.asarray(kps.valid)
    n = int(kps.n_total)
    assert n >= int(np.asarray(blobs_j.valid).sum())  # >=1 orientation each
    # valid slots form a prefix
    assert valid[: valid.sum()].all() and not valid[valid.sum():].any()
    # keypoints inherit blob position/size
    bx = np.asarray(blobs_j.x)
    bidx = np.asarray(kps.blob_idx)[valid]
    np.testing.assert_allclose(np.asarray(kps.x)[valid], bx[bidx])


def test_keypoint_capacity_drop(test_image):
    _, _, coarse_j, blobs_j = _setup(test_image)
    full = keypoints_from_blobs(coarse_j, blobs_j, max_keypoints=512)
    n_total = int(full.n_total)
    cap = max(1, n_total - 3)
    capped = keypoints_from_blobs(coarse_j, blobs_j, max_keypoints=cap)
    assert int(capped.n_dropped) == n_total - cap
    assert int(np.asarray(capped.valid).sum()) == cap


def test_pallas_orientation_path_matches_gather(test_image):
    """Decimated-plane Pallas orientation (interpret) == gather path."""
    import numpy as np
    import jax.numpy as jnp
    from local_features_tpu.ops.orientation import orientation_histograms

    coarse = jss.scale_space(jnp.asarray(test_image), 4)
    blobs = detect_blobs(jss.fine_volume(coarse), max_blobs=256)
    a1, p1 = orientation_histograms(coarse, blobs.x, blobs.y, blobs.size,
                                    blobs.valid, use_pallas=False)
    a2, p2 = orientation_histograms(coarse, blobs.x, blobs.y, blobs.size,
                                    blobs.valid, use_pallas=True,
                                    interpret=True)
    v = np.asarray(blobs.valid)
    assert np.array_equal(np.asarray(p1)[v], np.asarray(p2)[v])
    pk = np.asarray(p1)[v]
    d = np.abs(np.asarray(a1)[v] - np.asarray(a2)[v])[pk]
    assert d.size == 0 or d.max() < 1e-4

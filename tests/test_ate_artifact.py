"""Pin the committed ATE_r03.json artifact (BASELINE config-4 evidence:
120-frame 640x480 real-texture circuit through full windowed odometry,
scripts/make_ate_artifact.py).

This does NOT re-run the 40-minute reconstruction; it asserts the
committed artifact's integrity — all variants present, finite, and
within the accuracy envelope the pipeline demonstrably achieves — so a
regenerated artifact that regressed (e.g. the NaN the Sim(3) robust-GN
fix addressed) fails CI instead of shipping silently.
"""

import json
import os

import pytest

_PATH = os.path.join(os.path.dirname(__file__), "..", "ATE_r03.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(_PATH):
        pytest.skip("ATE artifact not generated yet")
    with open(_PATH) as fh:
        return json.load(fh)


def test_ate_artifact_structure(artifact):
    seq = artifact["sequence"]
    assert seq["n_frames"] >= 100
    assert seq["resolution"] == [480, 640]
    assert seq["trajectory_length"] > 0
    for key in ("odometry", "odometry+loop_tracks", "odometry+sim3_loops"):
        rec = artifact["results"][key]
        assert rec["ate_rmse"] == rec["ate_rmse"], f"{key} ATE is NaN"
        assert rec["wall_time_s"] > 0


def test_ate_artifact_accuracy_envelope(artifact):
    res = artifact["results"]
    # plain windowed odometry: monocular scale drift, bounded
    assert res["odometry"]["ate_pct_of_trajectory"] < 20.0
    # loop closure must IMPROVE on plain odometry, and the best loop
    # mode must land under 8% of trajectory (measured 5.2%)
    plain = res["odometry"]["ate_pct_of_trajectory"]
    loops = [res["odometry+loop_tracks"]["ate_pct_of_trajectory"],
             res["odometry+sim3_loops"]["ate_pct_of_trajectory"]]
    assert min(loops) < plain
    assert min(loops) < 8.0

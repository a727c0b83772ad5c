"""Golden-parity tests for the extremum scan + refinement + compaction."""

import numpy as np
import jax.numpy as jnp

from local_features_tpu import golden
import local_features_tpu.ops.scale_space as jss
from local_features_tpu.ops.detect import detect_blobs, hierarchical_top_k


def _blob_sets(test_image, min_size=0.0):
    g_coarse = golden.scale_space(test_image, 4)
    g_fine = golden.fine_volume(g_coarse)
    g = golden.scan_extrema(g_fine)

    fine = jss.fine_volume(jss.scale_space(jnp.asarray(test_image), 4))
    j = detect_blobs(fine, max_blobs=256, min_size=min_size)
    valid = np.asarray(j.valid)
    return g, {k: np.asarray(getattr(j, k))[valid]
               for k in ("x", "y", "size", "contrast", "level")}


def test_detect_matches_golden(test_image):
    g, j = _blob_sets(test_image)
    assert len(j["x"]) == len(g.x) > 3

    # match by sorting both sets on (level, y, x)
    def order(x, y, lvl):
        return np.lexsort((x, y, lvl))

    og = order(g.x, g.y, g.level)
    oj = order(j["x"], j["y"], j["level"])
    np.testing.assert_allclose(j["x"][oj], g.x[og], atol=1e-3)
    np.testing.assert_allclose(j["y"][oj], g.y[og], atol=1e-3)
    np.testing.assert_allclose(j["size"][oj], g.size[og], rtol=1e-3)
    np.testing.assert_allclose(j["contrast"][oj], g.contrast[og], atol=1e-4)


def test_detect_sorted_by_contrast(test_image):
    _, j = _blob_sets(test_image)
    c = j["contrast"]
    assert np.all(np.diff(c) <= 1e-7)


def test_min_size_gate(test_image):
    g, j = _blob_sets(test_image, min_size=3.0)
    n_expected = int((g.size >= 3.0).sum())
    assert len(j["x"]) == n_expected
    assert np.all(j["size"] >= 3.0)


def test_hierarchical_top_k_saturated_chunk_exact():
    """A chunk holding more positives than chunk_cap must not lose any.

    The extremum test allows ties (>=), so a degenerate above-threshold
    plateau can make whole regions extremal; the plateau rescue must
    keep the result exact (full contents of saturated chunks reach the
    second-level pool) instead of silently dropping candidates.
    """
    rng = np.random.default_rng(0)
    n, k = 64 * 4096, 512
    score = np.full(n, -1.0, np.float32)
    # cram 1500 positives (> chunk_cap=256) into one chunk, the best
    # ones strictly inside it, plus a sprinkle elsewhere
    dense = rng.uniform(5.0, 9.0, 1500).astype(np.float32)
    score[10 * 4096: 10 * 4096 + 1500] = dense
    sparse_idx = rng.choice(n, 300, replace=False)
    score[sparse_idx] = rng.uniform(0.1, 4.0, 300).astype(np.float32)

    v, i = hierarchical_top_k(jnp.asarray(score), k)
    ev, ei = np.sort(score)[::-1][:k], np.argsort(-score, kind="stable")[:k]
    np.testing.assert_allclose(np.asarray(v), ev)
    # indices must point at equal-valued entries
    np.testing.assert_allclose(score[np.asarray(i)], ev)


def test_hierarchical_top_k_unsaturated_matches_flat():
    rng = np.random.default_rng(1)
    n, k = 64 * 4096, 512
    score = np.full(n, -1.0, np.float32)
    idx = rng.choice(n, 2000, replace=False)
    score[idx] = rng.uniform(0.1, 9.0, 2000).astype(np.float32)
    v, i = hierarchical_top_k(jnp.asarray(score), k)
    ev = np.sort(score)[::-1][:k]
    np.testing.assert_allclose(np.asarray(v), ev)
    np.testing.assert_allclose(score[np.asarray(i)], ev)


def test_hierarchical_top_k_few_chunks_large_k():
    """k > n_chunks*chunk_cap (small image, large max_blobs) must stay
    exact via the flat fallback — regression for the 120x160/8000 case."""
    rng = np.random.default_rng(2)
    n, k = 5 * 4096, 4000
    score = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    v, i = hierarchical_top_k(jnp.asarray(score), k)
    ev = np.sort(score)[::-1][:k]
    np.testing.assert_allclose(np.asarray(v), ev)
    np.testing.assert_allclose(score[np.asarray(i)], ev)


def test_capacity_and_drop_counter(test_image):
    fine = jss.fine_volume(jss.scale_space(jnp.asarray(test_image), 4))
    j_all = detect_blobs(fine, max_blobs=256)
    n_total = int(j_all.n_total)
    cap = max(1, n_total - 2)
    j_cap = detect_blobs(fine, max_blobs=cap)
    assert int(j_cap.n_dropped) == n_total - cap
    assert int(np.asarray(j_cap.valid).sum()) == cap
    # capacity keeps the strongest blobs
    c_all = np.sort(np.asarray(j_all.contrast)[np.asarray(j_all.valid)])[::-1]
    c_cap = np.sort(np.asarray(j_cap.contrast)[np.asarray(j_cap.valid)])[::-1]
    np.testing.assert_allclose(c_cap, c_all[:cap], atol=1e-7)


def test_vectorized_scan_matches_loop(rng):
    """The vectorized golden scan is bitwise-identical to the literal
    per-voxel GLSL transcription, including tie/degenerate paths."""
    from local_features_tpu.golden.scale_space import _scan_extrema_loop

    H, W = 96, 128
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W), np.float32)
    for _ in range(50):
        cx, cy = rng.uniform(0, W), rng.uniform(0, H)
        s = rng.uniform(1.5, 10.0)
        a = rng.uniform(-1, 1)
        img += a * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    img = (0.5 + 0.2 * img
           + 0.02 * rng.standard_normal((H, W))).astype(np.float32)
    # plateau patch to exercise the >= tie semantics
    img[40:44, 40:46] = img[40, 40]
    fine = golden.fine_volume(golden.scale_space(img, 4))

    for thr in (golden.scale_space.__globals__["C"].CONTRAST_THRESHOLD,
                1e-4, 0.0):
        a = golden.scan_extrema(fine, contrast_threshold=thr)
        b = _scan_extrema_loop(fine, contrast_threshold=thr)
        assert len(a.x) == len(b.x)
        for f in ("x", "y", "size", "contrast", "level"):
            ga, gb = getattr(a, f), getattr(b, f)
            assert np.array_equal(ga, gb,
                                  equal_nan=ga.dtype.kind == "f"), (thr, f)


def test_hierarchical_top_k_multi_saturated_exact():
    """Up to `rescue` simultaneously saturated chunks stay exact."""
    rng = np.random.default_rng(3)
    n, k = 64 * 4096, 2048
    score = np.full(n, -1.0, np.float32)
    for c in (3, 17, 40, 55):  # rescue=4 chunks, all saturated
        score[c * 4096: c * 4096 + 800] = rng.uniform(
            1.0, 9.0, 800).astype(np.float32)
    score[rng.choice(n, 200, replace=False)] = rng.uniform(
        0.1, 0.9, 200).astype(np.float32)
    v, i = hierarchical_top_k(jnp.asarray(score), k)
    ev = np.sort(score)[::-1][:k]
    np.testing.assert_allclose(np.asarray(v), ev)
    np.testing.assert_allclose(score[np.asarray(i)], ev)
    assert len(np.unique(np.asarray(i)[np.asarray(v) > 0])) == int(
        (np.asarray(v) > 0).sum())


def test_hierarchical_top_k_beyond_rescue_consistent():
    """>rescue saturated chunks: per-chunk strongest survive, results
    stay self-consistent (no duplicates, values match indices), and the
    global strongest entries are still exact."""
    rng = np.random.default_rng(4)
    n, k = 64 * 4096, 2048
    score = np.full(n, -1.0, np.float32)
    for c in range(6):  # 6 saturated chunks > rescue=4
        score[c * 4096: c * 4096 + 700] = rng.uniform(
            1.0, 9.0, 700).astype(np.float32)
    v, i = hierarchical_top_k(jnp.asarray(score), k)
    v, i = np.asarray(v), np.asarray(i)
    pos = v > 0
    np.testing.assert_allclose(score[i[pos]], v[pos])
    assert len(np.unique(i[pos])) == pos.sum()
    # the top chunk_cap values are exact regardless of saturation
    ev = np.sort(score)[::-1]
    np.testing.assert_allclose(v[:256], ev[:256])


def test_detect_drop_counter_under_plateau():
    """A degenerate plateau image keeps n_total/n_dropped/kept-count
    consistent (n_dropped = n_total - n_kept, exactly)."""
    H, W = 256, 512
    img = np.zeros((H, W), np.float32)
    img[64:192, 128:384] = 0.9  # huge flat plateau
    rng = np.random.default_rng(5)
    img += 0.05 * rng.standard_normal((H, W)).astype(np.float32)
    img[100:140, 200:300] = 0.9  # exact-tie interior region
    fine = jss.fine_volume(jss.scale_space(jnp.asarray(img), 4))
    blobs = detect_blobs(fine, max_blobs=512)
    n_total = int(blobs.n_total)
    n_kept = int(np.asarray(blobs.valid).sum())
    n_dropped = int(blobs.n_dropped)
    assert n_dropped == n_total - n_kept
    assert n_kept <= 512


def test_invalid_slots_are_sanitized(test_image, rng):
    """Invalid blob slots must be zeroed, never left with the dense
    refine's garbage (near-singular Hessian solves yield offsets ~1e30,
    size=inf).  Downstream window-DMA offsets are computed for ALL
    slots, and a garbage slot means an out-of-bounds async copy — a
    worker-killing TPU fault (the root cause of every round-1/round-2
    'vmapped Pallas kernel fault')."""
    noisy = np.clip(
        test_image + 0.12 * rng.standard_normal(test_image.shape), 0, 1
    ).astype(np.float32)
    fine = jss.fine_volume(jss.scale_space(jnp.asarray(noisy), 4))
    b = detect_blobs(fine, max_blobs=2000)
    iv = ~np.asarray(b.valid)
    assert iv.any()
    for f in ("x", "y", "size", "contrast"):
        a = np.asarray(getattr(b, f))
        assert np.isfinite(a).all(), f
        assert (a[iv] == 0).all(), f
    lvl = np.asarray(b.level)
    assert (lvl[iv] == 1).all()
    H, W = noisy.shape
    v = ~iv
    assert (np.asarray(b.x)[v] >= 0).all() and (np.asarray(b.x)[v] < W).all()
    assert (np.asarray(b.y)[v] >= 0).all() and (np.asarray(b.y)[v] < H).all()


def test_hierarchical_top_k_adaptive_cap_matches_flat():
    """Middle regime (240x320 with max_blobs=8000): few chunks force the
    adaptive cap (2k/n_chunks rounded to 8) instead of the flat fallback;
    selection must match a flat top_k exactly."""
    rng = np.random.default_rng(5)
    n, k = 74 * 4096, 8000  # ~240x320 fine volume, bench max_blobs
    score = np.full(n, -1.0, np.float32)
    idx = rng.choice(n, 12000, replace=False)
    score[idx] = rng.uniform(0.05, 5.0, 12000).astype(np.float32)
    v, i = hierarchical_top_k(jnp.asarray(score), k)
    ev = np.sort(score)[::-1][:k]
    np.testing.assert_allclose(np.asarray(v), ev)
    # positive scores are unique almost surely -> indices determined
    pos = ev > 0
    np.testing.assert_allclose(score[np.asarray(i)[pos]], ev[pos])


def test_select_cap_matches_truncated_full_selection(test_image):
    """detect_blobs(select_cap=m) returns exactly the first m slots of
    the full max_blobs selection, with ENGINE-capacity drop accounting."""
    fine = jss.fine_volume(jss.scale_space(jnp.asarray(test_image), 4))
    full = detect_blobs(fine, max_blobs=256)
    capped = detect_blobs(fine, max_blobs=256, select_cap=16)
    for f in ("x", "y", "size", "contrast", "level", "valid"):
        np.testing.assert_array_equal(np.asarray(getattr(capped, f)),
                                      np.asarray(getattr(full, f))[:16])
    assert int(capped.n_total) == int(full.n_total)
    # engine drop accounting: vs max_blobs=256, not vs the 16 slots
    assert int(capped.n_dropped) == max(int(full.n_total) - 256, 0)

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


def test_vmapped_window_fetch_matches_per_frame():
    """The custom_vmap fold (batch -> plane dim, one flat-grid kernel)
    must reproduce per-frame fetches exactly.

    The default vmapped pallas lowering (batch dim prepended to the
    grid) is the on-hardware crash class from rounds 1-2
    (VERIFY_PALLAS_TPU.json: 240x320 B=4 "TPU backend error"); the fold
    replaces it entirely, so this pins its indexing arithmetic.
    """
    import jax

    from local_features_tpu.pallas.windows import fetch_windows_multi

    rng = np.random.default_rng(3)
    B, F = 3, 32
    canvases = tuple(
        jnp.asarray(rng.standard_normal((B, p, 64, 384)).astype(np.float32))
        for p in (1, 4)
    )
    sel = jnp.asarray(rng.integers(0, 2, (B, F)), jnp.int32)
    plane = jnp.where(sel == 0, 0,
                      jnp.asarray(rng.integers(0, 4, (B, F)), jnp.int32))
    oy = jnp.asarray(rng.integers(0, 5, (B, F)) * 8, jnp.int32)
    ox = jnp.asarray(rng.integers(0, 2, (B, F)) * 128, jnp.int32)

    fetch = lambda cs, s, p, y, x: fetch_windows_multi(
        cs, s, p, y, x, win_h=24, win_w=256, kb=16, interpret=True)
    got = jax.vmap(fetch)(canvases, sel, plane, oy, ox)

    for b in range(B):
        ref = fetch(tuple(c[b] for c in canvases),
                    sel[b], plane[b], oy[b], ox[b])
        np.testing.assert_array_equal(np.asarray(got[b]), np.asarray(ref))

    # unbatched canvases (closure constants under vmap) broadcast correctly
    shared = tuple(c[0] for c in canvases)
    got_sh = jax.vmap(
        lambda s, p, y, x: fetch(shared, s, p, y, x)
    )(sel, plane, oy, ox)
    for b in range(B):
        ref = fetch(shared, sel[b], plane[b], oy[b], ox[b])
        np.testing.assert_array_equal(np.asarray(got_sh[b]), np.asarray(ref))


def test_pallas_orientation_wide_image_packed_arena(rng):
    """Wide image (ncol > 1 arena cells): packed-grid offsets must stay
    parity-exact with the gather path, with synthetic blobs spread over
    every level so the column-packed deep levels are exercised."""
    import numpy as np
    import jax.numpy as jnp
    from local_features_tpu.ops.orientation import (orientation_histograms,
                                                    _arena_canvas)

    H, W = 192, 1024  # Wc(level>=2) < Wa -> column packing kicks in
    img = (0.5 + 0.2 * rng.standard_normal((H, W))).astype(np.float32)
    coarse = jss.scale_space(jnp.asarray(img), 4)

    F = 64
    bx = jnp.asarray(rng.uniform(2, W - 3, F).astype(np.float32))
    by = jnp.asarray(rng.uniform(2, H - 3, F).astype(np.float32))
    # sizes spanning decimation levels 0..3 (and the big-blob fallback)
    bsize = jnp.asarray(
        (0.82 * np.sqrt(2) * 2 ** rng.uniform(0, 4.5, F)).astype(np.float32))
    bvalid = jnp.asarray(rng.random(F) > 0.2)

    a1, p1 = orientation_histograms(coarse, bx, by, bsize, bvalid,
                                    use_pallas=False)
    a2, p2 = orientation_histograms(coarse, bx, by, bsize, bvalid,
                                    use_pallas=True, interpret=True)
    v = np.asarray(bvalid)
    assert np.array_equal(np.asarray(p1)[v], np.asarray(p2)[v])
    pk = np.asarray(p1)[v]
    d = np.abs(np.asarray(a1)[v] - np.asarray(a2)[v])[pk]
    assert d.size == 0 or d.max() < 1e-4

    # column packing actually engaged and bounded the arena
    arena, layout = _arena_canvas(coarse)
    assert any(t[2] > 1 for t in layout)


def test_packed_orientation_kernel_matches_gather(test_image, monkeypatch):
    """Lane-packed fused kernel (interpret) == gather path, regardless
    of the LF_ORI_PACKED env default."""
    import numpy as np
    import jax.numpy as jnp
    import local_features_tpu.ops.orientation as ori

    monkeypatch.setattr(ori, "_ORI_FUSED", True)
    monkeypatch.setattr(ori, "_ORI_PACKED", True)
    coarse = jss.scale_space(jnp.asarray(test_image), 4)
    blobs = detect_blobs(jss.fine_volume(coarse), max_blobs=256)
    a1, p1 = ori.orientation_histograms(coarse, blobs.x, blobs.y,
                                        blobs.size, blobs.valid,
                                        use_pallas=False)
    a2, p2 = ori.orientation_histograms(coarse, blobs.x, blobs.y,
                                        blobs.size, blobs.valid,
                                        use_pallas=True, interpret=True)
    v = np.asarray(blobs.valid)
    assert np.array_equal(np.asarray(p1)[v], np.asarray(p2)[v])
    pk = np.asarray(p1)[v]
    d = np.abs(np.asarray(a1)[v] - np.asarray(a2)[v])[pk]
    assert d.size == 0 or d.max() < 1e-4


def test_packed2_orientation_kernel_matches_gather(test_image, monkeypatch):
    """Packed-v2 fused kernel (hoisted lane params + bins-major one-hot
    accumulation, interpret) == gather path."""
    import numpy as np
    import jax.numpy as jnp
    import local_features_tpu.ops.orientation as ori

    monkeypatch.setattr(ori, "_ORI_FUSED", True)
    monkeypatch.setattr(ori, "_ORI_PACKED", 2)
    coarse = jss.scale_space(jnp.asarray(test_image), 4)
    blobs = detect_blobs(jss.fine_volume(coarse), max_blobs=256)
    a1, p1 = ori.orientation_histograms(coarse, blobs.x, blobs.y,
                                        blobs.size, blobs.valid,
                                        use_pallas=False)
    a2, p2 = ori.orientation_histograms(coarse, blobs.x, blobs.y,
                                        blobs.size, blobs.valid,
                                        use_pallas=True, interpret=True)
    v = np.asarray(blobs.valid)
    assert np.array_equal(np.asarray(p1)[v], np.asarray(p2)[v])
    pk = np.asarray(p1)[v]
    d = np.abs(np.asarray(a1)[v] - np.asarray(a2)[v])[pk]
    assert d.size == 0 or d.max() < 1e-4


def test_arena_window_containment():
    """Pixel-exhaustive proof that every 24x128 orientation window stays
    inside its plane's cell in the packed arena — the _cell_w exact
    width and the min-ox phase rule in _arena_offsets must agree for
    EVERY reachable (xd, yd), or a window silently reads a neighboring
    plane's content (and the truncated tail of phase-copy 1 must be
    provably unread)."""
    import local_features_tpu.ops.orientation as o

    for (H, W) in [(480, 640), (192, 1024), (240, 320), (123, 137),
                   (32, 32), (64, 4096)]:
        for l in range(o._DECIM_LEVELS):
            s = 1 << l
            Hl, Wl = -(-H // s), -(-W // s)
            Hc = -(-(Hl + o._OWIN_H - 8) // 8) * 8
            Wc = o._cell_w(Wl)
            # rows: every decimated row coordinate
            yd = np.arange(Hl)
            oy = np.maximum(((yd - o._R) // 8) * 8, 0)
            assert (oy >= 0).all() and (oy + o._OWIN_H <= Hc).all(), \
                (H, W, l, "rows")
            # patch rows live inside the window, EXCEPT the top-edge
            # out-of-image rows (yd < _R, oy clamped to 0): y_local
            # goes negative there and those rows read as zero via the
            # one-hot no-match — the reference's zero fill
            yl = yd - o._R - oy
            assert (yl >= -o._R).all() and (yl + 15 <= o._OWIN_H).all()
            # cols: every decimated col coordinate, through the min-ox
            # x-phase copy selection (the SAME rule _arena_offsets
            # traces: jnp.mod is non-negative, so basex < 0 shifts too)
            xd = np.arange(Wl)
            basex = xd - o._R
            k = (np.mod(basex, 128) > o._phase_k_threshold()).astype(int)
            shifted = basex + o._XSTEP * k
            ox = (shifted // 128) * 128
            assert (ox >= 0).all() and (ox + o._OWIN_W <= Wc).all(), \
                (H, W, l, "cols")
            xl = shifted - ox
            assert (xl >= 0).all() and (xl + 15 <= o._OWIN_W).all()
            # phase-copy content is truncated at the cell edge
            # (_decimated_canvases): every patch column actually read
            # from copy k must exist in the truncated copy — content
            # col c of copy k lives at lane k*XSTEP + c, and the patch
            # reads content cols [basex, basex + 15)
            assert (basex + 15 + k * o._XSTEP <= Wc).all(), \
                (H, W, l, "copy truncation")


def test_gather_patches_mm_matches_gather(rng):
    """One-hot matmul big-blob patch extraction == scalar-gather
    extraction for levels >= _DECIM_LEVELS (the only levels the matmul
    form addresses)."""
    import local_features_tpu.ops.orientation as o

    nC, H, W = 7, 96, 128
    coarse = jnp.asarray(rng.standard_normal((nC, H, W)).astype(np.float32))
    F = 32
    xi = jnp.asarray(rng.integers(0, W, F).astype(np.int32))
    yi = jnp.asarray(rng.integers(0, H, F).astype(np.int32))
    level = jnp.asarray(rng.integers(o._DECIM_LEVELS, nC, F).astype(np.int32))
    ref = o._gather_patches(coarse, xi, yi, level)
    got = o._gather_patches_mm(coarse, xi, yi, level)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

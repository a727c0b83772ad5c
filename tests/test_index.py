"""Tests for the persistent descriptor index (usearch replacement).

Oracle: a direct NumPy implementation of the reference webcam's query
semantics — usearch IP index, 2-NN, accept iff d0 < d1 * 0.75 with
d = 1 - dot (examples/webcam/src/main.rs:97-109, 261-282).
"""

import numpy as np

from local_features_tpu import DescriptorIndex


def _unit_rows(rng, n, d=128):
    v = rng.normal(size=(n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _oracle(bank, q, ratio=0.75):
    sim = q @ bank.T
    order = np.argsort(-sim, axis=1)
    best, second = order[:, 0], order[:, 1]
    d0 = 1.0 - sim[np.arange(len(q)), best]
    d1 = 1.0 - sim[np.arange(len(q)), second]
    mask = d0 < d1 * ratio
    return np.where(mask, best, -1), mask


def test_search_matches_usearch_semantics():
    rng = np.random.default_rng(0)
    bank = _unit_rows(rng, 500)
    idx = DescriptorIndex(capacity=64)
    ids = idx.add(bank)
    assert ids.tolist() == list(range(500))
    assert len(idx) == 500

    # queries: noisy copies of bank rows (should match) + random rows
    # (mostly rejected by the ratio test)
    rows = rng.choice(500, 40, replace=False)
    noisy = bank[rows] + 0.02 * rng.normal(size=(40, 128)).astype(np.float32)
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    randq = _unit_rows(rng, 40)
    q = np.concatenate([noisy, randq])

    m = idx.search(q)
    e_idx, e_mask = _oracle(bank, q)
    np.testing.assert_array_equal(np.asarray(m.mask), e_mask)
    np.testing.assert_array_equal(np.asarray(m.indices), e_idx)
    # sanity: noisy copies accepted and correctly identified
    assert np.asarray(m.mask)[:40].all()
    np.testing.assert_array_equal(np.asarray(m.indices)[:40], rows)
    # random queries overwhelmingly rejected
    assert np.asarray(m.mask)[40:].sum() <= 2


def test_incremental_add_and_growth():
    rng = np.random.default_rng(1)
    idx = DescriptorIndex(capacity=64)
    a, b = _unit_rows(rng, 60), _unit_rows(rng, 100)
    idx.add(a)
    ids = idx.add(b)  # forces capacity doubling
    assert ids[0] == 60 and len(idx) == 160
    m = idx.search(b[:5])
    np.testing.assert_array_equal(np.asarray(m.indices), 60 + np.arange(5))
    assert np.asarray(m.mask).all()


def test_query_valid_mask():
    rng = np.random.default_rng(2)
    bank = _unit_rows(rng, 32)
    idx = DescriptorIndex.from_features(
        type("R", (), {"descriptors": bank})())
    valid = np.zeros(4, bool)
    valid[0] = True
    m = idx.search(bank[:4], valid=valid)
    assert np.asarray(m.mask)[0]
    assert not np.asarray(m.mask)[1:].any()


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    bank = _unit_rows(rng, 77)
    idx = DescriptorIndex(ratio=0.6)
    idx.add(bank)
    p = tmp_path / "index.npz"
    idx.save(p)
    idx2 = DescriptorIndex.load(p)
    assert len(idx2) == 77 and idx2.ratio == 0.6
    m1, m2 = idx.search(bank[:9]), idx2.search(bank[:9])
    np.testing.assert_array_equal(np.asarray(m1.indices),
                                  np.asarray(m2.indices))


def test_save_load_suffixless_path(tmp_path):
    """np.savez appends .npz to suffixless paths; load must follow."""
    import numpy as np
    from local_features_tpu.ops.index import DescriptorIndex

    rng = np.random.default_rng(0)
    d = rng.standard_normal((10, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    idx = DescriptorIndex()
    idx.add(d)
    p = tmp_path / "bank"  # no .npz suffix
    idx.save(p)
    idx2 = DescriptorIndex.load(p)
    assert len(idx2) == 10
    m = idx2.search(d)
    assert int(np.asarray(m.mask).sum()) == 10


def test_incremental_add_updates_device_bank_in_place():
    """After the device bank materializes, appends must ship only the
    new rows (no full invalidation): the O(F^2) streaming-upload fix."""
    rng = np.random.default_rng(11)
    mk = lambda n: (lambda d: d / np.linalg.norm(d, axis=1, keepdims=True))(
        rng.normal(size=(n, 32)).astype(np.float32))
    idx = DescriptorIndex(dim=32, capacity=512)
    d1 = mk(100)
    idx.add(d1)
    idx.search(d1[:4])                       # materialize the device bank
    assert idx._device is not None
    d2 = mk(50)
    idx.add(d2)
    assert idx._device is not None, "append invalidated the device bank"
    m = idx.search(d2)
    sims = np.asarray(m.sims)
    # self-matches: every appended row is its own nearest neighbor
    best = np.argmax(d2 @ idx._bank[:150].T, axis=1)
    assert np.all(best == np.arange(100, 150))
    assert np.allclose(sims, 1.0, atol=1e-5)

    # growth reallocates: falls back to one full upload and stays correct
    d3 = mk(500)
    idx.add(d3)
    assert idx._device is None
    m3 = idx.search(d3[:7])
    assert np.allclose(np.asarray(m3.sims), 1.0, atol=1e-5)

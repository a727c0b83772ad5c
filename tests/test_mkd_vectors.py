"""MKD descriptor parity against the COMMITTED test-vector artifacts.

The schema and gates are the reference's own planned golden-vector tests
(local_features/src/mkd_ref.rs:393-453): JSON cases of
{"patch": [f32;1024], "descriptor": [f32;D]} with mse/max_diff gates.
The committed files (tests/data/mkd_vectors/, written once by
scripts/make_mkd_vectors.py) are a frozen oracle: regressions in either
golden/ or ops/ fail here against files that do not re-derive from the
changed code.
"""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from local_features_tpu.golden.mkd import mkd_descriptor, mkd_raw_descriptor
from local_features_tpu.ops.descriptor import (mkd_descriptors,
                                               raw_mkd_descriptors)
from local_features_tpu.pca import load_pca

VEC_DIR = Path(__file__).parent / "data" / "mkd_vectors"


def _cases(name):
    cases = json.loads((VEC_DIR / name).read_text())
    patches = np.array([c["patch"] for c in cases],
                       np.float32).reshape(-1, 32, 32)
    descs = [np.array(c["descriptor"], np.float32) for c in cases]
    return patches, descs


def _gate(actual, expected, mse_tol, max_tol):
    d = actual - expected
    mse = float(np.mean(d * d))
    max_diff = float(np.abs(d).max())
    assert mse < mse_tol, (mse, mse_tol)
    assert max_diff < max_tol, (max_diff, max_tol)


def test_no_whitening_vectors_jax():
    """ops path vs frozen vectors, reference gates mse<1e-5, max<1e-5
    (mkd_ref.rs:441-452)."""
    patches, descs = _cases("mkd_no_whitening.json")
    actual = np.asarray(raw_mkd_descriptors(jnp.asarray(patches)))
    for a, e in zip(actual, descs):
        assert e.shape == (238,)
        _gate(a, e, 1e-5, 1e-5)


def test_pcawt_vectors_jax():
    """ops path vs frozen vectors, reference gates mse<1e-8, max<1e-4
    (mkd_ref.rs:404-426)."""
    patches, descs = _cases("mkd_pcawt.json")
    mean, proj = load_pca().attenuated
    actual = np.asarray(mkd_descriptors(
        jnp.asarray(patches), jnp.asarray(mean), jnp.asarray(proj)))
    for a, e in zip(actual, descs):
        assert e.shape == (128,)
        _gate(a, e, 1e-8, 1e-4)


def test_vectors_golden_roundtrip():
    """golden model reproduces its own frozen vectors bit-nearly —
    catches accidental semantic drift in golden/ itself."""
    patches, descs = _cases("mkd_no_whitening.json")
    for p, e in zip(patches, descs):
        _gate(mkd_raw_descriptor(p), e, 1e-12, 1e-6)
    patches, descs = _cases("mkd_pcawt.json")
    mean, proj = load_pca().attenuated
    for p, e in zip(patches, descs):
        _gate(mkd_descriptor(p, mean, proj), e, 1e-12, 1e-6)


def test_vector_files_well_formed():
    for name, dim in (("mkd_no_whitening.json", 238),
                      ("mkd_pcawt.json", 128)):
        cases = json.loads((VEC_DIR / name).read_text())
        assert len(cases) >= 6
        for c in cases:
            assert len(c["patch"]) == 1024
            assert len(c["descriptor"]) == dim
            assert np.isfinite(np.array(c["descriptor"])).all()

"""Distributed (landmark-sharded) BA must match single-device BA."""

import jax
import jax.numpy as jnp
import numpy as np

from local_features_tpu.parallel import make_mesh
from local_features_tpu.sfm import geometry as geo
from local_features_tpu.sfm.ba import BAState, lm_bundle_adjust
from local_features_tpu.sfm.distributed import lm_bundle_adjust_sharded

INTR = jnp.asarray([500.0, 500.0, 320.0, 240.0])


def _scene(rng, n_cams=4, n_pts=160, noise=0.2):
    X = rng.uniform(-1.0, 1.0, (n_pts, 3)).astype(np.float32)
    X[:, 2] += 5.0
    Rs, ts = [], []
    for c in range(n_cams):
        w = np.array([0.0, 0.12 * (c - n_cams / 2), 0.0], dtype=np.float32)
        R = np.asarray(geo.so3_exp(jnp.asarray(w)))
        C = np.array([0.4 * c, 0.0, 0.0], dtype=np.float32)
        Rs.append(R)
        ts.append(-R @ C)
    R = jnp.asarray(np.stack(Rs))
    t = jnp.asarray(np.stack(ts))
    X = jnp.asarray(X)
    uv, z = geo.project(R[:, None], t[:, None], X[None], INTR)
    uv = uv + noise * rng.standard_normal(uv.shape).astype(np.float32)
    return R, t, X, uv, z > 0.1


def test_sharded_ba_matches_single(rng):
    assert jax.device_count() == 8
    mesh = make_mesh()
    R, t, X, uv, mask = _scene(rng)

    xi = jnp.asarray(0.01 * rng.standard_normal((4, 6)).astype(np.float32))
    R0, t0 = geo.se3_retract(R, t, xi)
    X0 = X + jnp.asarray(0.05 * rng.standard_normal(X.shape).astype(np.float32))
    state0 = BAState(R=R0, t=t0, X=X0)

    single = lm_bundle_adjust(state0, uv, mask, INTR, n_iters=12)
    sharded = lm_bundle_adjust_sharded(mesh, state0, uv, mask, INTR,
                                       n_iters=12)

    assert float(sharded.cost) < 0.5
    # identical algorithm; only summation order differs across shards
    np.testing.assert_allclose(float(sharded.cost), float(single.cost),
                               rtol=1e-3)
    # monocular BA has a global-scale gauge freedom (only cam 0 is
    # pinned); compare translations after normalizing total scale
    t_sh = np.asarray(sharded.state.t)
    t_si = np.asarray(single.state.t)
    t_sh = t_sh / np.linalg.norm(t_sh)
    t_si = t_si / np.linalg.norm(t_si)
    np.testing.assert_allclose(t_sh, t_si, atol=2e-3)
    np.testing.assert_allclose(np.asarray(sharded.state.R),
                               np.asarray(single.state.R), atol=2e-3)

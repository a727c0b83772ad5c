"""Worker for tests/test_multihost.py: one of N processes in a
multi-process CPU JAX runtime, running landmark-sharded BA with the
landmark psum crossing the DCN (inter-process) mesh axis.

Run (by the test) as:
    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
    python tests/multihost_worker.py PORT NUM_PROCESSES PROCESS_ID
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from local_features_tpu.parallel import multihost  # noqa: E402
from local_features_tpu.sfm import geometry as geo  # noqa: E402
from local_features_tpu.sfm.ba import BAState, lm_bundle_adjust  # noqa: E402
from local_features_tpu.sfm.distributed import lm_bundle_adjust_sharded  # noqa: E402

INTR = np.asarray([500.0, 500.0, 320.0, 240.0], np.float32)


def _scene(rng, n_cams=4, n_pts=64, noise=0.2):
    X = rng.uniform(-1.0, 1.0, (n_pts, 3)).astype(np.float32)
    X[:, 2] += 5.0
    Rs, ts = [], []
    for c in range(n_cams):
        w = np.array([0.0, 0.12 * (c - n_cams / 2), 0.0], np.float32)
        R = np.asarray(geo.so3_exp(jnp.asarray(w)))
        C = np.array([0.4 * c, 0.0, 0.0], np.float32)
        Rs.append(R)
        ts.append(-R @ C)
    R, t, X = np.stack(Rs), np.stack(ts), X
    uv, z = geo.project(jnp.asarray(R)[:, None], jnp.asarray(t)[:, None],
                        jnp.asarray(X)[None], jnp.asarray(INTR))
    uv = np.asarray(uv) + noise * rng.standard_normal(uv.shape).astype(
        np.float32)
    return R, t, X, uv, np.asarray(z) > 0.1


def _frontend_phase(mesh, n_proc, pid, n_local):
    """Sharded FRONT-END + cross-frame matching across processes: frames
    are sharded over the hybrid (dcn, frames) mesh, detection runs
    data-parallel, and the cyclic next-frame matching crosses the
    process boundary (a real DCN collective permute).  Scalar outputs
    are globally reduced, so every process can check them against its
    own unsharded reference run."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from local_features_tpu.ops.frontend import FrontendConfig
    from local_features_tpu.ops.matching import match_descriptors
    from local_features_tpu.parallel import batched_detect_extract
    from local_features_tpu.pca import load_pca

    cfg = FrontendConfig(n_scales=3, max_blobs=128, max_keypoints=64,
                         max_filtered=64, sampler="xla")
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)

    B = n_proc * n_local              # one frame per global device
    rng = np.random.default_rng(1)    # identical frames in every process
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    frames = np.stack([
        0.5 + 0.3 * np.sin(xx / (3 + b)) * np.cos(yy / (4 + b))
        + 0.05 * rng.standard_normal((64, 64))
        for b in range(B)
    ]).astype(np.float32)

    def step(imgs):
        res = batched_detect_extract(imgs, cfg, mean, proj, 64, 0.0, 24.0)
        d = res.descriptors
        m = jax.vmap(match_descriptors)(
            d, jnp.roll(d, -1, axis=0),           # crosses the DCN axis
            res.valid, jnp.roll(res.valid, -1, axis=0))
        return jnp.sum(res.n_keypoints), jnp.sum(m.mask)

    spec = P(("dcn", "frames"))
    lo, hi = pid * B // n_proc, (pid + 1) * B // n_proc
    frames_g = multihost.host_local_to_global(mesh, spec, frames[lo:hi])
    sharded_fn = jax.jit(
        step, in_shardings=NamedSharding(mesh, spec),
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())))
    n_kp_g, n_m_g = jax.tree.map(
        lambda a: int(np.asarray(a)), sharded_fn(frames_g))

    # unsharded reference on the full frame set (local single process)
    n_kp_r, n_m_r = jax.tree.map(
        lambda a: int(np.asarray(a)), jax.jit(step)(jnp.asarray(frames)))
    assert n_kp_g == n_kp_r and n_kp_g > 0, (n_kp_g, n_kp_r)
    assert n_m_g == n_m_r, (n_m_g, n_m_r)
    return n_kp_g, n_m_g


def main() -> int:
    port, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc
    n_local = jax.local_device_count()
    assert jax.device_count() == n_proc * n_local, (
        jax.device_count(), n_proc, n_local)

    # phase 1: sharded front-end + matching over the hybrid mesh
    fe_mesh = multihost.hybrid_mesh(ici_axes={"frames": n_local},
                                    dcn_axes={"dcn": n_proc})
    n_kp, n_m = _frontend_phase(fe_mesh, n_proc, pid, n_local)

    # [dcn, landmarks] hybrid mesh; the landmark shard axis spans BOTH,
    # so the camera-system psum crosses processes over the DCN axis
    mesh = multihost.hybrid_mesh(ici_axes={"landmarks": n_local},
                                 dcn_axes={"dcn": n_proc})
    assert mesh.devices.shape == (n_proc, n_local)

    rng = np.random.default_rng(0)  # identical scene in every process
    R, t, X, uv, mask = _scene(rng)
    xi = 0.01 * rng.standard_normal((4, 6)).astype(np.float32)
    R0, t0 = geo.se3_retract(jnp.asarray(R), jnp.asarray(t),
                             jnp.asarray(xi))
    X0 = X + 0.05 * rng.standard_normal(X.shape).astype(np.float32)

    # global arrays: replicated poses, landmark-sharded points/observations
    axes = ("dcn", "landmarks")
    rep = lambda a: multihost.host_local_to_global(mesh, P(), np.asarray(a))

    # host_local_array_to_global_array expects the LOCAL piece: this
    # process owns the dcn-slice of the landmark axis
    P_pts = X.shape[0]
    lo, hi = pid * P_pts // n_proc, (pid + 1) * P_pts // n_proc
    X_loc = np.asarray(X0)[lo:hi]
    uv_loc = uv[:, lo:hi]
    mask_loc = mask[:, lo:hi]

    state = BAState(
        R=rep(R0), t=rep(t0),
        X=multihost.host_local_to_global(mesh, P(axes), X_loc))
    uv_g = multihost.host_local_to_global(mesh, P(None, axes), uv_loc)
    mask_g = multihost.host_local_to_global(mesh, P(None, axes), mask_loc)

    sharded = lm_bundle_adjust_sharded(
        mesh, state, uv_g, mask_g, jnp.asarray(INTR), n_iters=8, axis=axes)

    # reference: plain single-device BA on local data
    single = lm_bundle_adjust(
        BAState(R=jnp.asarray(np.asarray(R0)), t=jnp.asarray(np.asarray(t0)),
                X=jnp.asarray(X0)),
        jnp.asarray(uv), jnp.asarray(mask), jnp.asarray(INTR), n_iters=8)

    # R/t/cost come back fully replicated (out_specs P()) -> addressable
    cost_sh = float(np.asarray(sharded.cost))
    cost_si = float(single.cost)
    t_sh = np.asarray(sharded.state.t)
    t_si = np.asarray(single.state.t)
    assert abs(cost_sh - cost_si) / max(cost_si, 1e-9) < 1e-2, (
        cost_sh, cost_si)
    np.testing.assert_allclose(t_sh / np.linalg.norm(t_sh),
                               t_si / np.linalg.norm(t_si), atol=5e-3)
    multihost.sync_global_devices("done")
    print(f"OK process={pid} cost_sharded={cost_sh:.4f} "
          f"cost_single={cost_si:.4f} frontend_kp={n_kp} matches={n_m}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

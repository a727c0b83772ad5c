"""Descriptor matching on TPU.

Replaces the reference examples' CPU matchers (match_images O(N^2) loop,
examples/match_images/src/main.rs:8-27; webcam's usearch index) with a
single MXU matmul + top-2 + Lowe ratio test.  Descriptors are unit-norm,
so dot product similarity == cosine similarity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    indices: jnp.ndarray  # [Na] i32 best match in B for each row of A (-1 = none)
    scores: jnp.ndarray   # [Na] f32 similarity of best match
    mask: jnp.ndarray     # [Na] bool passed ratio test (and validity)


import os

_TOP2_IMPL = os.environ.get("LF_MATCH_TOP2", "masked")
if _TOP2_IMPL not in ("masked", "reduce"):
    # defensive: an unrecognized value must not silently select the
    # experimental reduce variant (it crashes the TPU compiler off B=8)
    _TOP2_IMPL = "masked"


def _top2(sim: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(best, second, argbest) along axis 1.

    Not jax.lax.top_k(k=2): XLA's TPU top_k lowers to a full sort-style
    reduction (~ms for 2000x2000).  Default: three masked-max passes
    (argmax + max + re-masked max).  LF_MATCH_TOP2=reduce swaps in ONE
    variadic reduce with a (best, second, argbest) monoid — measured
    242.5 -> 245.1 fps at the bench shape (B=8), but the XLA TPU
    compiler CRASHES on it at other batch sizes (B=1/2: "Check failed:
    T::ClassOf(instr)" downcast in hlo_casting_utils during the
    batched-reduce lowering, v5e 2026-08) — so the robust form stays
    the default until the toolchain moves.  Tie rule matches jnp.argmax
    in both: equal bests keep the smaller index; duplicated maxima make
    `second` equal to the max (equivalence fuzz-pinned by
    tests/test_matching.py::test_top2_reduce_matches_masked)."""
    if _TOP2_IMPL == "masked":
        ibest = jnp.argmax(sim, axis=1)
        best = jnp.max(sim, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        second = jnp.max(
            jnp.where(cols == ibest[:, None], -jnp.inf, sim), axis=1)
        return best, second, ibest.astype(jnp.int32)

    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    seconds0 = jnp.full_like(sim, -jnp.inf)

    def comb(a, b):
        b1, s1, i1 = a
        b2, s2, i2 = b
        take1 = (b1 > b2) | ((b1 == b2) & (i1 <= i2))
        best = jnp.where(take1, b1, b2)
        ibest = jnp.where(take1, i1, i2)
        second = jnp.maximum(jnp.minimum(b1, b2), jnp.maximum(s1, s2))
        return best, second, ibest

    neg_inf = jnp.asarray(-jnp.inf, sim.dtype)
    best, second, ibest = jax.lax.reduce(
        (sim, seconds0, cols),
        (neg_inf, neg_inf, jnp.int32(-1)),
        comb, dimensions=(1,))
    return best, second, ibest.astype(jnp.int32)


def match_descriptors(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: jnp.ndarray | None = None,
    valid_b: jnp.ndarray | None = None,
    ratio: float = 0.8,
) -> Matches:
    """One-directional 2-NN matching with Lowe's ratio test.

    Keeps a match when best_sim * ratio > second_sim — the reference's
    acceptance test (match_images/src/main.rs:24-26).
    """
    sim = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)
    if valid_b is not None:
        sim = jnp.where(valid_b[None, :], sim, -jnp.inf)
    best, second, ibest = _top2(sim)
    mask = best * ratio > second
    if valid_a is not None:
        mask &= valid_a
    return Matches(indices=jnp.where(mask, ibest, -1),
                   scores=best, mask=mask)


def _top2_axis0(sim: jnp.ndarray):
    """(best, second, argbest) along axis 0 — same tie rules as _top2,
    without materializing sim.T (an [N, N] relayout per call)."""
    ibest = jnp.argmax(sim, axis=0)
    best = jnp.max(sim, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
    second = jnp.max(
        jnp.where(rows == ibest[None, :], -jnp.inf, sim), axis=0)
    return best, second, ibest.astype(jnp.int32)


def mutual_match(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: jnp.ndarray | None = None,
    valid_b: jnp.ndarray | None = None,
    ratio: float = 0.8,
) -> Matches:
    """Mutual-nearest-neighbor matching with ratio test in both directions."""
    sim = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)
    if valid_a is not None:
        sim = jnp.where(valid_a[:, None], sim, -jnp.inf)
    if valid_b is not None:
        sim = jnp.where(valid_b[None, :], sim, -jnp.inf)

    best_ab, second_ab, a_best = _top2(sim)
    best_ba, second_ba, b_best = _top2_axis0(sim)

    mask_ab = best_ab * ratio > second_ab
    mask_ba = best_ba * ratio > second_ba

    mutual = b_best[a_best] == jnp.arange(desc_a.shape[0])
    mask = mask_ab & mutual & mask_ba[a_best]
    if valid_a is not None:
        mask &= valid_a
    return Matches(indices=jnp.where(mask, a_best, -1),
                   scores=best_ab, mask=mask)


# ---------------------------------------------------------------------------
# Batched sequence matching
# ---------------------------------------------------------------------------

import functools

import numpy as np


@functools.partial(jax.jit, static_argnames=("ratio",))
def _match_pairs_batched(da, db, va, vb, ratio):
    return jax.vmap(
        lambda a, b, x, y: mutual_match(a, b, x, y, ratio=ratio)
    )(da, db, va, vb)


def pad_descriptor_sequence(feats, capacity: int | None = None):
    """Stack an ordered list of FeaturesResult (or anything with a
    `.descriptors` [n_i, D] array) into (descs [F, K, D], valid [F, K])
    with a fixed power-of-two capacity K — the layout the batched
    matchers below consume."""
    ds = [np.asarray(f.descriptors, np.float32) for f in feats]
    n_max = max((len(d) for d in ds), default=1)
    K = capacity or max(64, 1 << max(0, n_max - 1).bit_length())
    D = ds[0].shape[1] if ds and ds[0].size else 128
    descs = np.zeros((len(ds), K, D), np.float32)
    valid = np.zeros((len(ds), K), bool)
    for i, d in enumerate(ds):
        descs[i, : len(d)] = d[:K]
        valid[i, : len(d)] = True
    return descs, valid


def match_consecutive(
    descs: np.ndarray,      # [F, K, D]
    valid: np.ndarray,      # [F, K]
    ratio: float = 0.8,
    batch: int = 8,
) -> list[np.ndarray]:
    """Mutual-match every consecutive pair of an ordered sequence at
    bench-level throughput: `batch` pairs per vmapped device call (ONE
    dispatch + ONE host fetch per batch instead of one per pair — the
    per-pair loop's dispatch/fetch overhead dominates at config-4/5
    sequence lengths).  The loop is software-pipelined one batch deep
    (batch k+1 dispatched before batch k is fetched), which overlaps
    device compute with the host round trip on remote TPUs — same
    pattern as api.detect_sequence.  Returns [F-1] arrays of [M, 2]
    index pairs."""
    F = descs.shape[0]
    if F < 2:
        return []
    n_pairs = F - 1
    batch = max(1, min(int(batch), n_pairs))
    out: list[np.ndarray] = []
    pending = None                   # (device Matches, pairs to keep)

    def drain(p):
        m, keep = p
        idx = np.asarray(m.indices)
        ok = np.asarray(m.mask)
        for b in range(keep):
            rows = np.flatnonzero(ok[b])
            out.append(np.stack([rows, idx[b][rows]], axis=1))

    for s in range(0, n_pairs, batch):
        e = min(s + batch, n_pairs)
        pad = batch - (e - s)
        sl = lambda a, o: np.concatenate(
            [a[s + o: e + o], np.repeat(a[e + o - 1: e + o], pad, axis=0)]
        ) if pad else a[s + o: e + o]
        m = _match_pairs_batched(
            jnp.asarray(sl(descs, 0)), jnp.asarray(sl(descs, 1)),
            jnp.asarray(sl(valid, 0)), jnp.asarray(sl(valid, 1)),
            float(ratio))
        if pending is not None:
            drain(pending)
        pending = (m, e - s)
    if pending is not None:
        drain(pending)
    return out

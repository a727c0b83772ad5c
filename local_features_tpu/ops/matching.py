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
    top2, idx2 = jax.lax.top_k(sim, 2)
    best, second = top2[:, 0], top2[:, 1]
    mask = best * ratio > second
    if valid_a is not None:
        mask &= valid_a
    return Matches(indices=jnp.where(mask, idx2[:, 0], -1),
                   scores=best, mask=mask)


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

    top2_ab, idx_ab = jax.lax.top_k(sim, 2)
    top2_ba, idx_ba = jax.lax.top_k(sim.T, 2)

    mask_ab = top2_ab[:, 0] * ratio > top2_ab[:, 1]
    mask_ba = top2_ba[:, 0] * ratio > top2_ba[:, 1]

    a_best = idx_ab[:, 0]                       # [Na]
    b_best = idx_ba[:, 0]                       # [Nb]
    mutual = b_best[a_best] == jnp.arange(desc_a.shape[0])
    mask = mask_ab & mutual & mask_ba[a_best]
    if valid_a is not None:
        mask &= valid_a
    return Matches(indices=jnp.where(mask, a_best, -1),
                   scores=top2_ab[:, 0], mask=mask)

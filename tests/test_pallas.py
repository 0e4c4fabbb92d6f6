"""Pallas fused path-sum kernel: interpret-mode correctness + gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepmimo_tpu.ops.pallas.pathsum import (fused_path_sum,
                                             _reference_impl,
                                             pallas_available)

pytestmark = pytest.mark.skipif(not pallas_available(),
                                reason="pallas unavailable")


def _inputs(u=12, r=2, t=8, p=5, k=9, seed=0):
    rng = np.random.RandomState(seed)
    f32 = lambda *s: jnp.asarray(rng.uniform(-1, 1, s), dtype=jnp.float32)
    return (f32(u, r, p), f32(u, r, p), f32(u, t, p), f32(u, t, p),
            f32(u, p), f32(u, p),
            jnp.asarray(rng.uniform(0, 6, (u, p)), dtype=jnp.float32),
            jnp.asarray(np.arange(k), dtype=jnp.float32))


def test_kernel_matches_reference_interpret():
    args = _inputs()
    hr, hi = fused_path_sum(*args, user_tile=4, k_tile=4, interpret=True)
    rr, ri = _reference_impl(*args)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(rr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(ri), atol=1e-5)


def test_kernel_ragged_padding():
    """U and K not multiples of the tiles: padded internally, un-padded out."""
    args = _inputs(u=7, k=5)
    hr, hi = fused_path_sum(*args, user_tile=4, k_tile=4, interpret=True)
    assert hr.shape == (7, 16, 5)
    rr, ri = _reference_impl(*args)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(rr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(ri), atol=1e-5)


def test_kernel_gradients_match_reference():
    args = _inputs(u=6, k=4)
    cot = (jnp.ones((6, 16, 4)), 0.5 * jnp.ones((6, 16, 4)))

    def loss_pallas(*a):
        hr, hi = fused_path_sum(*a, user_tile=4, k_tile=4, interpret=True)
        return jnp.vdot(cot[0], hr) + jnp.vdot(cot[1], hi)

    def loss_ref(*a):
        hr, hi = _reference_impl(*a)
        return jnp.vdot(cot[0], hr) + jnp.vdot(cot[1], hi)

    gp = jax.grad(loss_pallas, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

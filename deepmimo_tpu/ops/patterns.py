"""Antenna radiation patterns as smooth jnp functions.

Re-implements the reference pattern registry (reference
deepmimo/generator/ant_patterns.py:21-78) as pure functions usable inside
jitted/differentiated renderers. Pattern gains multiply *linear path power*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pattern_isotropic(theta_rad: jax.Array, phi_rad: jax.Array) -> jax.Array:
    return jnp.ones_like(theta_rad)


def _pattern_halfwave_dipole(theta_rad: jax.Array,
                             phi_rad: jax.Array) -> jax.Array:
    """Half-wave dipole: G(theta) = 1.643 * cos^2(pi/2 cos theta) / sin theta.

    The divisor is sin(theta) — not sin^2 — matching the reference
    implementation (ant_patterns.py:69) so channels agree numerically.
    Near the dipole axis (sin theta -> 0) the gain is defined as 0.
    """
    max_gain = 1.643
    sin_t = jnp.sin(theta_rad)
    # Signed guard: theta is in [0, pi] (arccos range) so sin >= 0
    # analytically, but float32 rounds theta ~ 179.996 deg to float32(pi)
    # whose sine is ~-8.7e-8 — a tiny NEGATIVE gain that turns sqrt(power)
    # into NaN downstream. Treat sin below 1e-7 (theta within ~6e-6 deg of
    # either dipole axis, where the analytic gain limit is 0) as the axis.
    valid = sin_t > 1e-7
    sin_safe = jnp.where(valid, sin_t, 1.0)
    cos_term = jnp.cos(jnp.pi / 2 * jnp.cos(theta_rad))
    return jnp.where(valid, max_gain * cos_term * cos_term / sin_safe, 0.0)


PATTERN_REGISTRY = {
    "isotropic": _pattern_isotropic,
    "halfwave-dipole": _pattern_halfwave_dipole,
}


def pattern_gain(name: str, theta_rad: jax.Array,
                 phi_rad: jax.Array) -> jax.Array:
    """Evaluate a registered pattern by name (static string)."""
    if name not in PATTERN_REGISTRY:
        raise NotImplementedError(
            f"Antenna pattern '{name}' not in {sorted(PATTERN_REGISTRY)}")
    return PATTERN_REGISTRY[name](theta_rad, phi_rad)

"""Fused path->channel Pallas kernel.

Computes, entirely on-chip per (user-tile, subcarrier-tile) grid cell:

    E[u,q,p]   = (a_rx x a_tx)[u,q,p]            (complex outer product)
    g[u,p,k]   = amp * exp(j(psi - omega * k))   (OFDM path gain)
    H[u,q,k]   = sum_p E[u,q,p] * g[u,p,k]       (4 real MXU matmuls)

writing the channel planes (hr, hi) exactly once to HBM — the E/g
intermediates never leave VMEM, unlike the XLA fallback which materializes
them. Gradients route through a custom VJP whose backward is the (already
fast) plane-based XLA implementation, so the kernel is differentiable.

Real/imag planes are used throughout (complex lowering is slow on TPU; see
ops/channel.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pallas_available() -> bool:
    return _PALLAS_OK


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------------
# Reference implementation (also the backward path)
# ----------------------------------------------------------------------------

def _reference_impl(arx_r, arx_i, atx_r, atx_i, amp, psi, omega, k_sel):
    """Plane-based XLA implementation of the same computation."""
    u, r, p = arx_r.shape
    t = atx_r.shape[1]
    er = (arx_r[:, :, None, :] * atx_r[:, None, :, :] -
          arx_i[:, :, None, :] * atx_i[:, None, :, :]).reshape(u, r * t, p)
    ei = (arx_r[:, :, None, :] * atx_i[:, None, :, :] +
          arx_i[:, :, None, :] * atx_r[:, None, :, :]).reshape(u, r * t, p)
    base = psi[..., None] - omega[..., None] * k_sel[None, None, :]
    gr = amp[..., None] * jnp.cos(base)
    gi = amp[..., None] * jnp.sin(base)
    mm = lambda a, b: jnp.einsum("uqp,upk->uqk", a, b,
                                 preferred_element_type=jnp.float32)
    return mm(er, gr) - mm(ei, gi), mm(er, gi) + mm(ei, gr)


# ----------------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------------

def _kernel(arx_r_ref, arx_i_ref, atx_r_ref, atx_i_ref, amp_ref, psi_ref,
            omega_ref, k_ref, hr_ref, hi_ref):
    arx_r, arx_i = arx_r_ref[:], arx_i_ref[:]      # [Ut, R, P]
    atx_r, atx_i = atx_r_ref[:], atx_i_ref[:]      # [Ut, T, P]
    amp = amp_ref[:]                               # [Ut, P]
    psi = psi_ref[:]
    omega = omega_ref[:]
    ks = k_ref[:]                                  # [1, Kt]

    ut, r, p = arx_r.shape
    t = atx_r.shape[1]

    # Complex outer product -> E planes [Ut, Q, P]
    er = (arx_r[:, :, None, :] * atx_r[:, None, :, :] -
          arx_i[:, :, None, :] * atx_i[:, None, :, :]).reshape(ut, r * t, p)
    ei = (arx_r[:, :, None, :] * atx_i[:, None, :, :] +
          arx_i[:, :, None, :] * atx_r[:, None, :, :]).reshape(ut, r * t, p)

    # OFDM gains [Ut, P, Kt]
    base = psi[:, :, None] - omega[:, :, None] * ks[0][None, None, :]
    gr = amp[:, :, None] * jnp.cos(base)
    gi = amp[:, :, None] * jnp.sin(base)

    dn = (((2,), (1,)), ((0,), (0,)))  # batch u; contract p
    mm = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=dn, preferred_element_type=jnp.float32)
    hr_ref[:] = mm(er, gr) - mm(ei, gi)
    hi_ref[:] = mm(er, gi) + mm(ei, gr)


def _pallas_call(arx_r, arx_i, atx_r, atx_i, amp, psi, omega, k_sel,
                 user_tile: int, k_tile: int, interpret: bool):
    u, r, p = arx_r.shape
    t = atx_r.shape[1]
    k = k_sel.shape[0]
    q = r * t

    ks2d = k_sel[None, :]  # [1, K]

    grid = (u // user_tile, k // k_tile)
    vspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                             memory_space=pltpu.ANY if False
                                             else pltpu.VMEM)
    in_specs = [
        vspec((user_tile, r, p), lambda i, j: (i, 0, 0)),
        vspec((user_tile, r, p), lambda i, j: (i, 0, 0)),
        vspec((user_tile, t, p), lambda i, j: (i, 0, 0)),
        vspec((user_tile, t, p), lambda i, j: (i, 0, 0)),
        vspec((user_tile, p), lambda i, j: (i, 0)),
        vspec((user_tile, p), lambda i, j: (i, 0)),
        vspec((user_tile, p), lambda i, j: (i, 0)),
        vspec((1, k_tile), lambda i, j: (0, j)),
    ]
    out_specs = [
        vspec((user_tile, q, k_tile), lambda i, j: (i, 0, j)),
        vspec((user_tile, q, k_tile), lambda i, j: (i, 0, j)),
    ]
    out_shape = [jax.ShapeDtypeStruct((u, q, k), jnp.float32)] * 2

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(arx_r, arx_i, atx_r, atx_i, amp, psi, omega, ks2d)


# ----------------------------------------------------------------------------
# Public entry with custom VJP
# ----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_path_sum(arx_r, arx_i, atx_r, atx_i, amp, psi, omega, k_sel,
                   user_tile: int = 8, k_tile: int = 128,
                   interpret: bool = False
                   ) -> Tuple[jax.Array, jax.Array]:
    """Fused H = sum_p (a_rx x a_tx) * g as (hr, hi) planes.

    Args:
        arx_r/arx_i: RX array-response planes [U, R, P] float32.
        atx_r/atx_i: TX array-response planes [U, T, P] float32.
        amp: per-path amplitude [U, P] (0 for invalid/over-FFT paths).
        psi: per-path phase (radians, incl. Doppler) [U, P].
        omega: per-path subcarrier phase slope 2*pi*delay_n/N [U, P].
        k_sel: selected subcarrier indices [K] float32.
        user_tile / k_tile: block sizes (U and K are padded up to them).
        interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
        (hr, hi): [U, R*T, K] float32 planes.
    """
    return _fused_fwd_impl(arx_r, arx_i, atx_r, atx_i, amp, psi, omega,
                           k_sel, user_tile, k_tile, interpret)


def _fused_fwd_impl(arx_r, arx_i, atx_r, atx_i, amp, psi, omega, k_sel,
                    user_tile, k_tile, interpret):
    u, r, p = arx_r.shape
    k = k_sel.shape[0]

    u_pad = _ceil_to(u, user_tile)
    k_pad = _ceil_to(k, k_tile)

    def padu(x):
        return jnp.pad(x, [(0, u_pad - u)] + [(0, 0)] * (x.ndim - 1))

    out = _pallas_call(padu(arx_r), padu(arx_i), padu(atx_r), padu(atx_i),
                       padu(amp), padu(psi), padu(omega),
                       jnp.pad(k_sel, (0, k_pad - k)),
                       user_tile, k_tile, interpret)
    hr, hi = out
    return hr[:u, :, :k], hi[:u, :, :k]


def _fused_fwd(arx_r, arx_i, atx_r, atx_i, amp, psi, omega, k_sel,
               user_tile, k_tile, interpret):
    out = _fused_fwd_impl(arx_r, arx_i, atx_r, atx_i, amp, psi, omega,
                          k_sel, user_tile, k_tile, interpret)
    return out, (arx_r, arx_i, atx_r, atx_i, amp, psi, omega, k_sel)


def _fused_bwd(user_tile, k_tile, interpret, residuals, cotangents):
    args = residuals
    _, vjp = jax.vjp(lambda *a: _reference_impl(*a), *args)
    return vjp(cotangents)


fused_path_sum.defvjp(_fused_fwd, _fused_bwd)

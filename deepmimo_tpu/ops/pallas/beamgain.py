"""Fused render->consume: beam-gain maps straight from per-path scalars.

The render kernel (`render.py`) is VPU-bound with its HBM write of H
fully hidden (benchmarks/SOL.md round-5 correction), so serving loops
that only need CODEBOOK BEAM GAINS waste the whole H materialization:
H is [U, R*T, 2*S*K] while the consumer reduces it to [U, R*B, S*K]
power maps (beam training / initial access / coverage; the reference
computes these host-side from full H, e.g. its beam-selection examples).

This kernel folds the codebook INTO the path-sum: with
``eb[b, p] = sum_t conj(w[b, t]) a_tx[t, p]`` (one tiny extra MXU dot
per tile), the per-path -> per-beam pipeline is identical to the render
kernel with the TX-antenna axis replaced by the (smaller) beam axis:

    y[u, r, b, k] = sum_t conj(w[b, t]) H[u, r, t, k]
                  = sum_p a_rx[r, p] eb[b, p] g[p, k]
    G[u, r, b, k] = |y|^2                       (computed in-register)

H never exists — not in HBM, not in VMEM; the kernel's output shrinks
by T/B x2 (planes -> real power) and ALL of the per-antenna VPU work
(panel outer product over T antennas, reassemble, output store) runs at
B beams instead of T antennas. Shares the packed-32 lane layout, the
phasor recurrences, the subcarrier tables and the hi/lo concat-dot with
the render kernel.

Gradients: :func:`fused_beam_gain` carries a custom VJP whose backward
routes through :func:`beam_gain_reference` (pure XLA) — codebook
LEARNING is small-batch, so the reference VJP's HBM appetite is fine;
the fused kernel stays the serving fast path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .render import (_PALLAS_OK, _best_l1, _ceil_to, _compiler_params,
                     _grouping, _ofdm_tables, _pack_rows, _response,
                     _slice_dot_mode, _trig_args, vmem_estimate)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pass


def beam_gain_reference(gry, grz, gty, gtz, amp, psi, omega, wr, wi,
                        rx_shape, tx_shape, n_k: int):
    """Differentiable XLA oracle: G[u, r*B, n_s*n_k] via explicit H.

    ``wr/wi`` are the codebook planes [B, T]; the beam combiner applies
    conj(w), matching `abs(h @ codebook.T.conj())**2` consumer code.
    """
    from .render import _reference_impl

    hr, hi = _reference_impl(gry, grz, gty, gtz, amp, psi, omega,
                             rx_shape, tx_shape, n_k)
    u, q, sk = hr.shape
    r = rx_shape[0] * rx_shape[1]
    t = tx_shape[0] * tx_shape[1]
    hr = hr.reshape(u, r, t, sk)
    hi = hi.reshape(u, r, t, sk)
    # conj(w) . h: re = wr.hr + wi.hi, im = wr.hi - wi.hr
    yr = jnp.einsum("bt,urtk->urbk", wr, hr) + \
        jnp.einsum("bt,urtk->urbk", wi, hi)
    yi = jnp.einsum("bt,urtk->urbk", wr, hi) - \
        jnp.einsum("bt,urtk->urbk", wi, hr)
    b = wr.shape[0]
    return (yr * yr + yi * yi).reshape(u, r * b, sk)


def _bg_kernel(cgry_ref, sgry_ref, cgrz_ref, sgrz_ref, cgty_ref, sgty_ref,
               cgtz_ref, sgtz_ref, amp_ref, cpsi_ref, spsi_ref, com_ref,
               som_ref, wr_ref, wi_ref, g_ref, *, rx_shape, tx_shape,
               n_beams, n_k, l1, mm_dtype, group=1, n_paths=0):
    f32 = jnp.float32
    amp = amp_ref[:]
    ug = amp.shape[0]
    n_s = cpsi_ref.shape[1]
    r = rx_shape[0] * rx_shape[1]
    nb_ = n_beams
    sk = n_s * n_k

    atx_r, atx_i = _response(cgty_ref[:], sgty_ref[:], cgtz_ref[:],
                             sgtz_ref[:], *tx_shape)   # [ug, T, L]
    t = atx_r.shape[1]

    # Codebook fold: eb = conj(W) . a_tx, one batched MXU dot for both
    # real and imaginary parts ([2B, 2T] x [2T, L] per row). HIGHEST
    # precision keeps the fold f32-grade; its MAC count is B/T of one
    # residue's path-sum dot, so the 6-pass cost is negligible.
    a2 = jnp.concatenate((atx_r, atx_i), axis=1)       # [ug, 2T, L]
    wr = wr_ref[:]
    wi = wi_ref[:]
    w_re = jnp.concatenate((wr, wi), axis=1)           # [B, 2T]
    w_im = jnp.concatenate((-wi, wr), axis=1)          # [B, 2T]
    wb = jnp.broadcast_to(jnp.concatenate((w_re, w_im), axis=0)[None],
                          (ug, 2 * nb_, 2 * t))
    prec = (jax.lax.Precision.HIGHEST
            if mm_dtype in ("float32", "highest")
            else jax.lax.Precision.DEFAULT)
    eb2 = jax.lax.dot_general(
        wb, a2, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32, precision=prec)    # [ug, 2B, L]
    ebr, ebi = eb2[:, :nb_, :], eb2[:, nb_:, :]

    if r == 1:
        er, ei = ebr, ebi                              # [ug, B, L]
    else:
        arx_r, arx_i = _response(cgry_ref[:], sgry_ref[:], cgrz_ref[:],
                                 sgrz_ref[:], *rx_shape)
        er = (arx_r[:, :, None, :] * ebr[:, None, :, :] -
              arx_i[:, :, None, :] * ebi[:, None, :, :]
              ).reshape(ug, r * nb_, -1)
        ei = (arx_r[:, :, None, :] * ebi[:, None, :, :] +
              arx_i[:, :, None, :] * ebr[:, None, :, :]
              ).reshape(ug, r * nb_, -1)

    gr, gi = _ofdm_tables(cpsi_ref[:], spsi_ref[:], com_ref[:], som_ref[:],
                          amp, n_k, l1)

    qb = r * nb_
    dn = (((2,), (2,)), ((0,), (0,)))
    e2 = jnp.concatenate((er, ei), axis=1)             # [ug, 2qb, L]
    g2 = jnp.concatenate((gr, gi), axis=1)             # [ug, 2sk, L]

    if group == 1:
        from .render import _dot_mode
        prep, dot = _dot_mode(mm_dtype, dn)
        e2p, g2p = prep(e2), prep(g2)
    else:
        split, dot_at = _slice_dot_mode(mm_dtype, dn, n_paths)
        ea, ga = split(e2), split(g2)

    skp = g_ref.shape[-1]                  # sk padded to a 128 multiple
    for res in range(group):
        m = dot(e2p, g2p) if group == 1 else dot_at(ea, ga, res * n_paths)
        rows = slice(res * ug, (res + 1) * ug)
        # m = [[yr | er.gi^T], [ei.gr^T | rolled yi part]] structure as in
        # the render kernel's packed reassemble: recover yr/yi then square.
        rolled = pltpu.roll(m[:, qb:, :], sk, axis=2)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
        v = m[:, :qb, :] + jnp.where(lane2 < sk, -rolled, rolled)
        yr = v[:, :, :sk]
        yi = v[:, :, sk:]
        g_val = (yr * yr + yi * yi).astype(g_ref.dtype)
        if skp != sk:
            # Zero-pad the stored minor dim to a 128-lane multiple: a
            # 64-lane minor stores at ~1/8 HBM rate on this stack (the
            # same penalty the render kernel's packed layout avoids);
            # padded lanes cost bytes but keep the DMA aligned. The
            # wrapper slices [..., :sk] off the result.
            g_val = jnp.concatenate(
                [g_val, jnp.zeros((ug, qb, skp - sk), g_ref.dtype)],
                axis=2)
        g_ref[rows] = g_val


def _bg_kernel_norx(cgty_ref, sgty_ref, cgtz_ref, sgtz_ref, amp_ref,
                    cpsi_ref, spsi_ref, com_ref, som_ref, wr_ref, wi_ref,
                    g_ref, **kw):
    """Single-antenna RX: the RX phasor refs are never read."""
    _bg_kernel(cgty_ref, sgty_ref, cgtz_ref, sgtz_ref, cgty_ref, sgty_ref,
               cgtz_ref, sgtz_ref, amp_ref, cpsi_ref, spsi_ref, com_ref,
               som_ref, wr_ref, wi_ref, g_ref, **kw)


def vmem_estimate_bg(user_tile: int, rx_shape, tx_shape, n_beams: int,
                     p: int, n_k: int, n_s: int = 1,
                     mm_dtype: str = "float32", no_pack=None) -> int:
    """Upper bound: render-kernel estimate at q = r*T (the a_tx build
    still happens) PLUS the beam-axis intermediates (eb/er/ei/e2 at
    q = r*B and the output tile)."""
    base = vmem_estimate(user_tile, rx_shape, tx_shape, p, n_k, n_s,
                         mm_dtype, no_pack)
    g, pp = _grouping(p, no_pack)
    ug = max(1, user_tile // g)
    lanes = g * pp if g > 1 else _ceil_to(p, 128)
    r = rx_shape[0] * rx_shape[1]
    qb = r * n_beams
    vm = lambda rows: ug * _ceil_to(max(rows, 1), 8) * lanes * 4
    extra = (6 * vm(qb) +                    # ebr/ebi/er/ei + e2 concat
             2 * vm(2 * qb) +                # hi/lo halves of e2
             user_tile * _ceil_to(qb, 8) * _ceil_to(2 * n_s * n_k, 128)
             * 4 +                           # m + v
             user_tile * _ceil_to(qb, 8) * _ceil_to(n_s * n_k, 128) * 4)
    return base + extra


def pick_user_tile_bg(u: int, rx_shape, tx_shape, n_beams: int, p: int,
                      n_k: int, n_s: int = 1, budget: int = 104 * 2**20,
                      mm_dtype: str = "float32", no_pack=None) -> int:
    """Largest beam-gain tile under the VMEM budget (0 = does not fit)."""
    g, _pp = _grouping(p, no_pack)
    picked = 0
    for ug in (128, 64, 32, 16, 8):
        ut = g * ug
        if vmem_estimate_bg(ut, rx_shape, tx_shape, n_beams, p, n_k, n_s,
                            mm_dtype, no_pack) <= budget:
            if picked == 0:
                picked = ut
            if u and ut >= u:
                picked = ut
    return picked


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13, 14, 15, 16, 17))
def fused_beam_gain(gry, grz, gty, gtz, amp, psi, omega, wr, wi,
                    rx_shape: Tuple[int, int], tx_shape: Tuple[int, int],
                    n_k: int, user_tile: int = 16, interpret: bool = False,
                    mm_dtype: str = "float32", no_pack=None,
                    pack_first=None, pad_store: bool = False) -> jax.Array:
    """Beam-gain maps G[U, R*B, n_s*n_k] from per-path scalars + codebook.

    Args match :func:`render.fused_render` (same prologue contract: zeroed
    invalid paths, psi [U, S*P] for Doppler snapshots) plus the codebook
    planes ``wr/wi`` [B, T]. Output is REAL f32 power — no planes pair,
    no H. Differentiable: the custom VJP routes the backward through the
    XLA reference (codebook learning is small-batch; this kernel is the
    serving fast path).
    """
    return _fused_beam_gain_impl(gry, grz, gty, gtz, amp, psi, omega, wr,
                                 wi, rx_shape, tx_shape, n_k, user_tile,
                                 interpret, mm_dtype, no_pack, pack_first,
                                 pad_store)


def _fused_beam_gain_impl(gry, grz, gty, gtz, amp, psi, omega, wr, wi,
                          rx_shape, tx_shape, n_k, user_tile=16,
                          interpret=False, mm_dtype="float32",
                          no_pack=None, pack_first=None,
                          pad_store=False) -> jax.Array:
    u, p = omega.shape
    n_s = psi.shape[1] // p
    nb_ = wr.shape[0]
    r = rx_shape[0] * rx_shape[1]
    g, pp = _grouping(p, no_pack)
    user_tile = max(g, (user_tile // g) * g)
    ug = user_tile // g
    u_pad = _ceil_to(u, user_tile)
    nblk = u_pad // user_tile

    skip_rx = r == 1
    if u_pad != u:
        padr = lambda x: jnp.pad(x, ((0, u_pad - u), (0, 0)))
        gry, grz = (padr(gry), padr(grz)) if not skip_rx else (gry, grz)
        gty, gtz, amp, psi, omega = (padr(gty), padr(gtz), padr(amp),
                                     padr(psi), padr(omega))
    if g > 1:
        from .render import PACK_FIRST
        if PACK_FIRST if pack_first is None else pack_first:
            args = _trig_args(gry, grz, gty, gtz, amp, psi, omega,
                              skip_rx=skip_rx, pack=(nblk, g, ug, pp))
        else:
            args = _trig_args(gry, grz, gty, gtz, amp, psi, omega,
                              skip_rx=skip_rx)
            args = [_pack_rows(x, nblk, g, ug, pp) for x in args]
    else:
        args = _trig_args(gry, grz, gty, gtz, amp, psi, omega,
                          skip_rx=skip_rx)
    lanes = args[0].shape[-1]

    l1 = _best_l1(n_k)
    sk = n_s * n_k
    # Stored minor dim. pad_store=True pads it to a 128-lane multiple
    # (aligned stores, 2x bytes, sliced off the result); measured
    # perf-NEUTRAL at the headline shape (10.72 vs 10.84 ms/dispatch,
    # benchmarks/perf_bg_pad.py) because the small G store hides under
    # the VPU compute exactly like the render kernel's H write — so the
    # simpler raw-sk store is the default.
    skp = _ceil_to(sk, 128) if pad_store else sk
    qb = r * nb_
    t = tx_shape[0] * tx_shape[1]
    spec_up = pl.BlockSpec((ug, lanes), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_psi = pl.BlockSpec((ug, n_s, lanes), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    n_sa = amp.shape[1] // p
    spec_amp = pl.BlockSpec((ug, n_sa, lanes), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((nb_, t), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((user_tile, qb, skp), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_bg_kernel_norx if skip_rx else _bg_kernel,
                             rx_shape=rx_shape, tx_shape=tx_shape,
                             n_beams=nb_, n_k=n_k, l1=l1,
                             mm_dtype=mm_dtype, group=g,
                             n_paths=pp if g > 1 else p)
    n_ph = 4 if skip_rx else 8
    est = vmem_estimate_bg(user_tile, rx_shape, tx_shape, nb_, p, n_k,
                           n_s, mm_dtype, no_pack)
    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[spec_up] * n_ph + [spec_amp] + [spec_psi] * 2 +
                 [spec_up] * 2 + [spec_w] * 2,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((u_pad, qb, skp), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(est),
    )(*args, wr.astype(jnp.float32), wi.astype(jnp.float32))
    out = out[:u] if u_pad != u else out
    return out[..., :sk] if skp != sk else out


def _bg_fwd(gry, grz, gty, gtz, amp, psi, omega, wr, wi, rx_shape,
            tx_shape, n_k, user_tile, interpret, mm_dtype, no_pack,
            pack_first, pad_store):
    out = _fused_beam_gain_impl(gry, grz, gty, gtz, amp, psi, omega, wr,
                                wi, rx_shape, tx_shape, n_k, user_tile,
                                interpret, mm_dtype, no_pack, pack_first,
                                pad_store)
    return out, (gry, grz, gty, gtz, amp, psi, omega, wr, wi)


def _bg_bwd(rx_shape, tx_shape, n_k, user_tile, interpret, mm_dtype,
            no_pack, pack_first, pad_store, res, ct):
    """Backward via the XLA reference: recompute + jax.vjp. G consumers
    (codebook learning) run at small batch, so the reference VJP's HBM
    appetite is acceptable — the fused kernel stays the serving path."""
    _, vjp = jax.vjp(
        lambda *a: beam_gain_reference(*a, rx_shape, tx_shape, n_k), *res)
    return vjp(ct.astype(jnp.float32))


fused_beam_gain.defvjp(_bg_fwd, _bg_bwd)

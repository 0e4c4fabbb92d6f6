"""f32-accurate single-pass dot for the packed-32 layout.

perf_pack32b showed the hi/lo 3-pass "float32" dot costs ~12 ms over a
single DEFAULT pass (each extra MXU pass re-streams the operands). With
the packed-32 layout each residue contracts only 32 lanes, so the three
hi/lo partials (hi.hi + hi.lo + lo.hi) fit in ONE dot by concatenating
the bf16 halves along the contraction axis:

    lhs = [a_hi | a_hi | a_lo]   (96 lanes <= 128)
    rhs = [b_hi | b_lo | b_hi]
    dot(lhs, rhs) = hi.hi + hi.lo + lo.hi   (f32 accumulate)

i.e. f32-grade accuracy (~2^-17) at the pass count of a bf16 dot.
Accuracy cross-check vs the 3-pass mode on-device.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python -u \
        benchmarks/perf_pack32c.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "benchmarks")
from perf_pack32 import (pack32, fwd32, U, P, PP, G, TX, N_K, L1,
                         timed_readback, _t)
from deepmimo_tpu.ops.pallas import render as R


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _kernel32c(cgty_ref, sgty_ref, cgtz_ref, sgtz_ref, amp_ref, cpsi_ref,
               spsi_ref, com_ref, som_ref, h_ref, *, tx_shape, n_k, l1):
    """packed-32 forward with the concat-dot f32 path sum."""
    amp = amp_ref[:]
    ug = amp.shape[0]
    n_s = cpsi_ref.shape[1]

    er, ei = R._response(cgty_ref[:], sgty_ref[:], cgtz_ref[:], sgtz_ref[:],
                         *tx_shape)
    gr, gi = R._ofdm_tables(cpsi_ref[:], spsi_ref[:], com_ref[:],
                            som_ref[:], amp, n_k, l1)

    q = tx_shape[0] * tx_shape[1]
    sk = n_s * n_k
    f32 = jnp.float32
    e2 = jnp.concatenate((er, ei), axis=1)          # [ug, 2q, 128]
    g2 = jnp.concatenate((gr, gi), axis=1)          # [ug, 2sk, 128]
    # One hi/lo split for the full-width arrays (amortized over residues)
    e_hi = e2.astype(jnp.bfloat16)
    e_lo = (e2 - e_hi.astype(f32)).astype(jnp.bfloat16)
    g_hi = g2.astype(jnp.bfloat16)
    g_lo = (g2 - g_hi.astype(f32)).astype(jnp.bfloat16)

    dn = (((2,), (2,)), ((0,), (0,)))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=f32)
    for res in range(G):
        lo = res * PP
        sl = lambda x: x[:, :, lo:lo + PP]
        lhs = jnp.concatenate((sl(e_hi), sl(e_hi), sl(e_lo)), axis=2)
        rhs = jnp.concatenate((sl(g_hi), sl(g_lo), sl(g_hi)), axis=2)
        m = dot(lhs, rhs)                           # [ug, 2q, 2sk]
        rows = slice(res * ug, (res + 1) * ug)
        rolled = pltpu.roll(m[:, q:, :], sk, axis=2)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
        h_ref[rows] = m[:, :q, :] + jnp.where(lane2 < sk, -rolled, rolled)


def fwd32c(gty, gtz, amp, psi, omega, user_tile, interpret=False):
    u, p = amp.shape
    n_s = psi.shape[1] // p
    ug = user_tile // G
    nb = u // user_tile
    q = TX[0] * TX[1]
    sk = n_s * N_K

    args = R._trig_args(None, None, gty, gtz, amp, psi, omega, skip_rx=True)
    args = [pack32(x, nb, ug) for x in args]

    spec_up = pl.BlockSpec((ug, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_psi = pl.BlockSpec((ug, n_s, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_amp = pl.BlockSpec((ug, 1, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((user_tile, q, 2 * sk), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel32c, tx_shape=TX, n_k=N_K, l1=L1)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[spec_up] * 4 + [spec_amp] + [spec_psi] * 2 +
                 [spec_up] * 2,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((u, q, 2 * sk), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(*args)


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    gty, gtz = mk(U, P), mk(U, P)
    amp = jnp.abs(mk(U, P)) * 1e-4
    psi = mk(U, P)
    omega = jnp.abs(mk(U, P)) * 0.1

    tiny = jax.jit(lambda x: x * 1.000001)(jnp.ones((8, 128)))
    t_rt = min(_t(lambda: float(jax.device_get(tiny[0, 0])))
               for _ in range(5))
    log(f"relay rt = {t_rt * 1e3:.1f} ms")
    out_gb = U * 64 * 128 * 4 / 1e9

    def run(tag, f, *a):
        try:
            h = f(*a)
            timed_readback(h)
            dt = min(_t(lambda: timed_readback(f(*a)))
                     for _ in range(3)) - t_rt
            log(f"{tag}: {dt * 1e3:7.2f} ms  {U / dt / 1e6:6.2f} M "
                f"users/s  {out_gb / dt:5.0f} GB/s")
            return h
        except Exception as e:
            log(f"{tag}: FAILED {str(e).splitlines()[0][:140]}")
            return None

    for ut in (128, 256, 512):
        f = jax.jit(lambda a, b, c, d, e, _ut=ut: fwd32c(a, b, c, d, e,
                                                         _ut))
        run(f"pack32-cat ut={ut:4d}", f, gty, gtz, amp, psi, omega)

    # accuracy: concat-dot vs 3-pass float32 on a slice (on device)
    n = 2048
    h3 = fwd32(gty[:n], gtz[:n], amp[:n], psi[:n], omega[:n], 128,
               mm_dtype="float32")
    hc = fwd32c(gty[:n], gtz[:n], amp[:n], psi[:n], omega[:n], 128)
    hb = fwd32(gty[:n], gtz[:n], amp[:n], psi[:n], omega[:n], 128,
               mm_dtype="default")
    d_c = float(jnp.max(jnp.abs(hc - h3)))
    d_b = float(jnp.max(jnp.abs(hb - h3)))
    s = float(jnp.max(jnp.abs(h3)))
    log(f"accuracy vs 3-pass f32: concat-dot {d_c:.3e}, bf16-default "
        f"{d_b:.3e} (scale {s:.3e})")


if __name__ == "__main__":
    main()

"""Bisect the fused render kernel's 54 ms: which stage costs what.

Local ablated copies of the kernel (variants), same I/O shapes:
  full       — the real kernel
  nopanel    — panel sincos replaced with linear ops
  notables   — subcarrier-table sincos replaced with linear ops
  notrig     — ALL sincos replaced with linear ops
  nodot      — MXU dot replaced with a cheap slice-broadcast write
  halfdot    — unpacked dot (er x gr only, 2 dots of half size)

  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python -u benchmarks/perf_kernel_bisect.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_UE = 131_072
P = 25
RX_SHAPE = (1, 1)
TX_SHAPE = (8, 8)
N_K = 64
UT = 32
L1 = 8


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _kernel(gry_ref, grz_ref, gty_ref, gtz_ref, amp_ref, psi_ref, omega_ref,
            h_ref, *, variant):
    f32 = jnp.float32
    amp, omega = amp_ref[:], omega_ref[:]
    psi_s = psi_ref[:]
    ut, p = amp.shape
    n_s = psi_s.shape[1]
    rx_shape, tx_shape, n_k, l1 = RX_SHAPE, TX_SHAPE, N_K, L1

    if variant in ("nopanel", "notrig"):
        pcos = lambda x: x * 0.5 + 1.0
        psin = lambda x: x * 0.25
    else:
        pcos, psin = jnp.cos, jnp.sin
    if variant in ("notables", "notrig"):
        tcos = lambda x: x * 0.5 + 1.0
        tsin = lambda x: x * 0.25
    else:
        tcos, tsin = jnp.cos, jnp.sin

    def response(ky, kz, m1, m2):
        iot = lambda shape, d: jax.lax.broadcasted_iota(
            jnp.int32, shape, d).astype(f32)
        phm = iot((ut, m1, p), 1) * ky[:, None, :]
        phn = iot((ut, m2, p), 1) * kz[:, None, :]
        cm, sm = pcos(phm), psin(phm)
        cn, sn = pcos(phn), psin(phn)
        re = cn[:, :, None, :] * cm[:, None, :, :] - \
            sn[:, :, None, :] * sm[:, None, :, :]
        im = cn[:, :, None, :] * sm[:, None, :, :] + \
            sn[:, :, None, :] * cm[:, None, :, :]
        return (re.reshape(ut, m1 * m2, p), im.reshape(ut, m1 * m2, p))

    arx_r, arx_i = response(gry_ref[:], grz_ref[:], *rx_shape)
    atx_r, atx_i = response(gty_ref[:], gtz_ref[:], *tx_shape)

    r = rx_shape[0] * rx_shape[1]
    t = tx_shape[0] * tx_shape[1]
    er = (arx_r[:, :, None, :] * atx_r[:, None, :, :] -
          arx_i[:, :, None, :] * atx_i[:, None, :, :]).reshape(ut, r * t, p)
    ei = (arx_r[:, :, None, :] * atx_i[:, None, :, :] +
          arx_i[:, :, None, :] * atx_r[:, None, :, :]).reshape(ut, r * t, p)

    l2 = n_k // l1
    cr = amp[:, None, :] * tcos(psi_s)
    ci = amp[:, None, :] * tsin(psi_s)
    kiot = lambda n: jax.lax.broadcasted_iota(
        jnp.int32, (ut, n, p), 1).astype(f32)
    ph1 = -kiot(l1) * omega[:, None, :]
    ph2 = -kiot(l2) * (float(l1) * omega)[:, None, :]
    c1, s1 = tcos(ph1), tsin(ph1)
    c2, s2 = tcos(ph2), tsin(ph2)
    t2r = cr[:, :, None, :] * c2[:, None] - ci[:, :, None, :] * s2[:, None]
    t2i = cr[:, :, None, :] * s2[:, None] + ci[:, :, None, :] * c2[:, None]
    gr = (t2r[:, :, :, None, :] * c1[:, None, None, :, :] -
          t2i[:, :, :, None, :] * s1[:, None, None, :, :]
          ).reshape(ut, n_s * n_k, p)
    gi = (t2r[:, :, :, None, :] * s1[:, None, None, :, :] +
          t2i[:, :, :, None, :] * c1[:, None, None, :, :]
          ).reshape(ut, n_s * n_k, p)

    q = r * t
    sk = n_s * n_k
    if variant == "nodot":
        h_ref[0] = er[:, :, :1] * gr[:, None, :, 0].reshape(ut, 1, sk)
        h_ref[1] = ei[:, :, :1] * gi[:, None, :, 0].reshape(ut, 1, sk)
        return
    dn = (((2,), (2,)), ((0,), (0,)))
    if variant == "halfdot":
        m1_ = jax.lax.dot_general(er, gr, dimension_numbers=dn,
                                  preferred_element_type=f32)
        m2_ = jax.lax.dot_general(ei, gi, dimension_numbers=dn,
                                  preferred_element_type=f32)
        h_ref[0] = m1_ - m2_
        h_ref[1] = m1_ + m2_
        return
    e2 = jnp.concatenate((er, ei), axis=1)
    g2 = jnp.concatenate((gr, gi), axis=1)
    m = jax.lax.dot_general(e2, g2, dimension_numbers=dn,
                            preferred_element_type=f32)
    h_ref[0] = m[:, :q, :sk] - m[:, q:, sk:]
    h_ref[1] = m[:, :q, sk:] + m[:, q:, :sk]


def build(variant):
    q = 64
    grid = (N_UE // UT,)
    spec_up = pl.BlockSpec((UT, P), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_psi = pl.BlockSpec((UT, 1, P), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2, UT, q, N_K), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, variant=variant)

    def run(gry, grz, gty, gtz, amp, psi, omega):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[spec_up] * 5 + [spec_psi, spec_up],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((2, N_UE, q, N_K), jnp.float32),
        )(gry, grz, gty, gtz, amp, psi.reshape(N_UE, 1, P), omega)
    return jax.jit(run)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(7)
    mk = lambda lo, hi: jax.device_put(jnp.asarray(
        rng.uniform(lo, hi, (N_UE, P)), jnp.float32))
    args = (mk(-3, 3), mk(-3, 3), mk(-3, 3), mk(-3, 3),
            mk(0, 1e-4), mk(-3, 3), mk(0, 6))
    log("data on device")

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt = {t_rt*1e3:.2f} ms")

    for variant in ("full", "nopanel", "notables", "notrig", "nodot",
                    "halfdot"):
        try:
            fn = build(variant)
            out = fn(*args)
            float(jax.device_get(out[1, -1, 0, -1]))
            del out
            def sweep(fn=fn):
                o = fn(*args)
                float(jax.device_get(o[1, -1, 0, -1]))
            best = min(_timed(sweep) for _ in range(3))
            dt = max(best - t_rt, 1e-9)
            log(f"{variant:10s} dev={dt*1e3:8.2f} ms  "
                f"-> {N_UE/dt/1e6:6.2f} M users/s")
        except Exception as e:
            log(f"{variant} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:110]}")
    log("DONE")


if __name__ == "__main__":
    main()

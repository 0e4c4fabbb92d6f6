"""Output-layout probes for the 170 GB/s Mosaic write floor.

Hypothesis: H [2, U, 64, 64] has minor dim 64 = half a (8,128) lane tile,
so each VMEM tile row scatters into 256 B strided HBM chunks. The same
bytes viewed as [2, U, 4096] are contiguous per user.

  w_64     — out [2, U, 64, 64], write broadcast (baseline ~170 GB/s)
  w_4096   — out [2, U, 4096], write broadcast (contiguous minor)
  w_128    — out [2, U, 64, 128] (128-minor, 2x bytes of real data)
  full_r   — real kernel + reshape (64,64)->(4096,) before the store
  full_128k— real kernel rendering 128 subcarriers (2x work, 128-minor)

  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python -u benchmarks/perf_layout.py
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
Q = 64
UT = 64


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def build_write(shape_tail):
    """writeonly kernel into out [2, N_UE, *shape_tail]."""
    def kern(x_ref, h_ref):
        v = x_ref[:, :1]
        tgt = (UT,) + shape_tail
        exp = v.reshape((UT,) + (1,) * len(shape_tail))
        h_ref[0] = jnp.broadcast_to(exp, tgt)
        h_ref[1] = jnp.broadcast_to(exp, tgt)
    nblk = len(shape_tail)
    return jax.jit(lambda a: pl.pallas_call(
        kern, grid=(N_UE // UT,),
        in_specs=[pl.BlockSpec((UT, 25), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, UT) + shape_tail,
                               lambda i: (0, i) + (0,) * nblk,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, N_UE) + shape_tail,
                                       jnp.float32))(a))


def main():
    from deepmimo_tpu.ops.pallas import render as R

    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(7)
    mk = lambda lo, hi: jax.device_put(jnp.asarray(
        rng.uniform(lo, hi, (N_UE, 25)), jnp.float32))
    args = (mk(-3, 3), mk(-3, 3), mk(-3, 3), mk(-3, 3),
            mk(0, 1e-4), mk(-3, 3), mk(0, 6))
    x = args[4]

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda t: jnp.sum(t * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt = {t_rt*1e3:.2f} ms")

    def bench(name, fn, arg, touch, traffic, n=3):
        out = fn(*arg)
        touch(out)
        del out
        def sweep():
            o = fn(*arg)
            touch(o)
        best = min(_timed(sweep) for _ in range(n))
        dt = max(best - t_rt, 1e-9)
        log(f"{name:14s} dev={dt*1e3:8.2f} ms  -> {traffic/dt/1e9:6.1f} GB/s"
            f"  ({N_UE/dt/1e6:5.2f} M users/s)")

    g4 = 2 * N_UE * 4096 * 4
    for name, tail, traffic in (("w_64", (64, 64), g4),
                                ("w_4096", (4096,), g4),
                                ("w_128", (64, 128), 2 * g4)):
        try:
            touch = (lambda o: float(jax.device_get(o[1, -1, -1]))) \
                if len(tail) == 1 else \
                (lambda o: float(jax.device_get(o[1, -1, -1, -1])))
            bench(name, build_write(tail), (x,), touch, traffic)
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:110]}")

    from deepmimo_tpu.ops.pallas.render import _stacked_powers, _phasor_powers

    def kern_full(gry_ref, grz_ref, gty_ref, gtz_ref, amp_ref, psi_ref,
                  omega_ref, h_ref, *, flat, n_k=64, l1=8):
        f32 = jnp.float32
        amp, omega = amp_ref[:], omega_ref[:]
        psi_s = psi_ref[:]
        ut, p = amp.shape
        n_s = psi_s.shape[1]
        cm, sm = _stacked_powers(gty_ref[:], 8, axis=1)
        cn, sn = _stacked_powers(gtz_ref[:], 8, axis=1)
        er = (cn[:, :, None, :] * cm[:, None, :, :] -
              sn[:, :, None, :] * sm[:, None, :, :]).reshape(ut, 64, p)
        ei = (cn[:, :, None, :] * sm[:, None, :, :] +
              sn[:, :, None, :] * cm[:, None, :, :]).reshape(ut, 64, p)
        l2 = n_k // l1
        cr = amp[:, None, :] * jnp.cos(psi_s)
        ci = amp[:, None, :] * jnp.sin(psi_s)
        c1, s1 = _stacked_powers(-omega, l1, axis=1)
        cb, sb = jnp.cos(-omega), jnp.sin(-omega)
        for _ in range(3):
            cb, sb = cb * cb - sb * sb, 2.0 * cb * sb
        c2s, s2s = _phasor_powers(cb, sb, l2)
        c2, s2 = jnp.stack(c2s, axis=1), jnp.stack(s2s, axis=1)
        t2r = cr[:, :, None, :] * c2[:, None] - ci[:, :, None, :] * s2[:, None]
        t2i = cr[:, :, None, :] * s2[:, None] + ci[:, :, None, :] * c2[:, None]
        gr = (t2r[:, :, :, None, :] * c1[:, None, None, :, :] -
              t2i[:, :, :, None, :] * s1[:, None, None, :, :]
              ).reshape(ut, n_s * n_k, p)
        gi = (t2r[:, :, :, None, :] * s1[:, None, None, :, :] +
              t2i[:, :, :, None, :] * c1[:, None, None, :, :]
              ).reshape(ut, n_s * n_k, p)
        e2 = jnp.concatenate((er, ei), axis=1)
        g2 = jnp.concatenate((gr, gi), axis=1)
        dn = (((2,), (2,)), ((0,), (0,)))
        m = jax.lax.dot_general(e2, g2, dimension_numbers=dn,
                                preferred_element_type=f32)
        q, sk = 64, n_s * n_k
        hr = m[:, :q, :sk] - m[:, q:, sk:]
        hi = m[:, :q, sk:] + m[:, q:, :sk]
        if flat:
            h_ref[0] = hr.reshape(ut, q * sk)
            h_ref[1] = hi.reshape(ut, q * sk)
        else:
            h_ref[0] = hr
            h_ref[1] = hi

    def build_full(flat, n_k=64):
        tail = (64 * n_k,) if flat else (64, n_k)
        nblk = len(tail)
        spec_up = pl.BlockSpec((UT, 25), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        spec_psi = pl.BlockSpec((UT, 1, 25), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return jax.jit(lambda *a: pl.pallas_call(
            functools.partial(kern_full, flat=flat, n_k=n_k),
            grid=(N_UE // UT,),
            in_specs=[spec_up] * 5 + [spec_psi, spec_up],
            out_specs=pl.BlockSpec((2, UT) + tail,
                                   lambda i: (0, i) + (0,) * nblk,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, N_UE) + tail, jnp.float32),
        )(*a[:5], a[5].reshape(N_UE, 1, 25), a[6]))

    for name, flat, n_k, traffic in (("full_flat", True, 64, g4),
                                     ("full_base", False, 64, g4),
                                     ("full_128k", False, 128, 2 * g4)):
        try:
            touch = (lambda o: float(jax.device_get(o[1, -1, -1]))) \
                if flat else \
                (lambda o: float(jax.device_get(o[1, -1, -1, -1])))
            bench(name, build_full(flat, n_k), args, touch, traffic)
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:110]}")
    log("DONE")


if __name__ == "__main__":
    main()

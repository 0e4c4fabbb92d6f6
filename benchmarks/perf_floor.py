"""Floor measurements for the fused render kernel on the headline config.

  writeonly — kernel writes a broadcast; measures the pure HBM write floor
              through this runtime (4 GiB output)
  dotonly   — operands built with trivial ops, full packed MXU dot + write
  library   — the real fused_render kernel (ut=64)

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python -u benchmarks/perf_floor.py
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
N_K = 64
Q = 64
UT = 64


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _kernel(gry_ref, grz_ref, gty_ref, gtz_ref, amp_ref, psi_ref, omega_ref,
            h_ref, *, variant):
    f32 = jnp.float32
    amp = amp_ref[:]
    ut, p = amp.shape
    if variant == "writeonly":
        v = amp[:, :1]                                # [ut, 1]
        h_ref[0] = jnp.broadcast_to(v[:, :, None], (ut, Q, N_K))
        h_ref[1] = jnp.broadcast_to(v[:, :, None], (ut, Q, N_K))
        return
    # dotonly: operands from single cheap ops
    er = jnp.broadcast_to(gty_ref[:][:, None, :], (ut, Q, p)) * 0.5
    ei = jnp.broadcast_to(gtz_ref[:][:, None, :], (ut, Q, p)) * 0.5
    gr = jnp.broadcast_to(omega_ref[:][:, None, :], (ut, N_K, p)) * 0.25
    gi = jnp.broadcast_to(amp[:, None, :], (ut, N_K, p)) * 0.25
    e2 = jnp.concatenate((er, ei), axis=1)
    g2 = jnp.concatenate((gr, gi), axis=1)
    dn = (((2,), (2,)), ((0,), (0,)))
    m = jax.lax.dot_general(e2, g2, dimension_numbers=dn,
                            preferred_element_type=f32)
    h_ref[0] = m[:, :Q, :N_K] - m[:, Q:, N_K:]
    h_ref[1] = m[:, :Q, N_K:] + m[:, Q:, :N_K]


def build(variant):
    grid = (N_UE // UT,)
    spec_up = pl.BlockSpec((UT, P), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_psi = pl.BlockSpec((UT, 1, P), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2, UT, Q, N_K), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, variant=variant)

    def run(gry, grz, gty, gtz, amp, psi, omega):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[spec_up] * 5 + [spec_psi, spec_up],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((2, N_UE, Q, N_K), jnp.float32),
        )(gry, grz, gty, gtz, amp, psi.reshape(N_UE, 1, P), omega)
    return jax.jit(run)


def main():
    from deepmimo_tpu.ops.pallas import render as R

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

    def bench(name, fn, n=3):
        out = fn(*args)
        float(jax.device_get(out[1, -1, 0, -1]))
        del out
        def sweep():
            o = fn(*args)
            float(jax.device_get(o[1, -1, 0, -1]))
        best = min(_timed(sweep) for _ in range(n))
        dt = max(best - t_rt, 1e-9)
        log(f"{name:12s} dev={dt*1e3:8.2f} ms  -> {N_UE/dt/1e6:6.2f} M users/s")

    for variant in ("writeonly", "dotonly"):
        try:
            bench(variant, build(variant))
        except Exception as e:
            log(f"{variant} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:110]}")

    lib = jax.jit(functools.partial(
        R.fused_render, rx_shape=(1, 1), tx_shape=(8, 8), n_k=N_K,
        user_tile=UT, interpret=False, mm_dtype="float32"))
    bench("library", lib)
    log("DONE")


if __name__ == "__main__":
    main()

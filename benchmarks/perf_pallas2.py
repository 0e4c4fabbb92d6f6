"""Honest (readback-synced) Pallas-vs-XLA path-sum timing on the real TPU.

Run: timeout 570 python benchmarks/perf_pallas2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.pallas.pathsum import fused_path_sum, _reference_impl

t_start = time.time()


def log(*a):
    print(f"[{time.time()-t_start:7.1f}s]", *a, flush=True)


U, R, T, P, K = 16384, 1, 64, 25, 64
N_REP = 8


def inputs(seed=0):
    rng = np.random.RandomState(seed)
    f32 = lambda *s: jnp.asarray(rng.uniform(-1, 1, s), dtype=jnp.float32)
    return (f32(U, R, P), f32(U, R, P), f32(U, T, P), f32(U, T, P),
            f32(U, P), f32(U, P),
            jnp.asarray(rng.uniform(0, 6, (U, P)), dtype=jnp.float32),
            jnp.asarray(np.arange(K), dtype=jnp.float32))


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    log("device:", jax.devices()[0])
    sync = lambda o: float(jax.device_get(o.ravel()[-1]))
    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    sync(f_tiny(tiny))
    t_rt = min(_t(lambda: sync(f_tiny(tiny))) for _ in range(5))
    log(f"RTT {t_rt*1e3:.1f} ms")

    args = inputs()
    log(f"U={U} R={R} T={T} P={P} K={K}")

    def bench(name, fn):
        o = fn(*args)
        sync(o[0])

        def sweep():
            outs = [fn(*args) for _ in range(N_REP)]
            sync(outs[-1][0])

        best = (min(_t(sweep) for _ in range(3)) - t_rt) / N_REP
        log(f"{name:24s} {best*1e3:8.2f} ms  {U/best/1e6:6.2f} M users/s")
        return o

    ref = jax.jit(_reference_impl)
    o_ref = bench("XLA planes", ref)
    ref_np = np.asarray(jax.device_get(o_ref[0][:1024]), np.float64)

    for ut in (8, 16, 32, 64):
        for kt in (64,):
            try:
                pk = jax.jit(lambda *a, _ut=ut, _kt=kt: fused_path_sum(
                    *a, user_tile=_ut, k_tile=_kt, interpret=False))
                o = bench(f"pallas ut={ut} kt={kt}", pk)
                d = np.abs(np.asarray(jax.device_get(o[0][:1024]),
                                      np.float64) - ref_np)
                log(f"  rel err {d.max()/np.abs(ref_np).max():.2e}")
                del o
            except Exception as e:
                log(f"pallas ut={ut} FAILED: {type(e).__name__}: "
                    f"{str(e)[:160]}")


if __name__ == "__main__":
    main()

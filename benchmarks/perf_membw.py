"""Raw HBM bandwidth probes: is the 118 GB/s write floor the platform or
the kernel's output pipelining?

  xla_write   — jit(full(4.3 GB))
  xla_read    — jit(sum(4.3 GB))
  xla_copy    — jit(x * 1.0001) (read+write 8.6 GB)
  pl_write    — pallas writeonly, current out spec [2, ut, q, k]
  pl_write2o  — pallas writeonly, two separate outputs (old style)
  pl_write_par— pallas writeonly with parallel dimension semantics

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python -u benchmarks/perf_membw.py
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
N_K = 64
UT = 64
OUT_BYTES = 2 * N_UE * Q * N_K * 4


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    log(f"devices: {jax.devices()}")
    x = jax.device_put(jnp.ones((N_UE, 25), jnp.float32))
    big = None

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda t: jnp.sum(t * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt = {t_rt*1e3:.2f} ms")

    def bench(name, fn, touch, traffic, n=3):
        out = fn()
        touch(out)
        del out
        def sweep():
            o = fn()
            touch(o)
        best = min(_timed(sweep) for _ in range(n))
        dt = max(best - t_rt, 1e-9)
        log(f"{name:12s} dev={dt*1e3:8.2f} ms  -> {traffic/dt/1e9:6.1f} GB/s")

    # XLA write: 4.3 GB
    w = jax.jit(lambda s: jnp.full((2, N_UE, Q, N_K), s, jnp.float32))
    bench("xla_write", lambda: w(1.5),
          lambda o: float(jax.device_get(o[1, -1, 0, -1])), OUT_BYTES)

    # XLA read: sum over 4.3 GB
    big = w(1.0)
    r = jax.jit(lambda a: a.sum())
    bench("xla_read", lambda: r(big),
          lambda o: float(jax.device_get(o)), OUT_BYTES)

    # XLA copy: read+write
    c = jax.jit(lambda a: a * 1.0001)
    bench("xla_copy", lambda: c(big),
          lambda o: float(jax.device_get(o[1, -1, 0, -1])), 2 * OUT_BYTES)
    del big

    # Pallas writeonly variants
    def k_one(x_ref, h_ref):
        ut = h_ref.shape[1]
        v = x_ref[:, :1]
        h_ref[0] = jnp.broadcast_to(v[:, :, None], (ut, Q, N_K))
        h_ref[1] = jnp.broadcast_to(v[:, :, None], (ut, Q, N_K))

    def k_two(x_ref, hr_ref, hi_ref):
        ut = hr_ref.shape[0]
        v = x_ref[:, :1]
        hr_ref[:] = jnp.broadcast_to(v[:, :, None], (ut, Q, N_K))
        hi_ref[:] = jnp.broadcast_to(v[:, :, None], (ut, Q, N_K))

    in_spec = pl.BlockSpec((UT, 25), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out1 = pl.BlockSpec((2, UT, Q, N_K), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec((UT, Q, N_K), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    p1 = jax.jit(lambda a: pl.pallas_call(
        k_one, grid=(N_UE // UT,), in_specs=[in_spec], out_specs=out1,
        out_shape=jax.ShapeDtypeStruct((2, N_UE, Q, N_K), jnp.float32))(a))
    bench("pl_write", lambda: p1(x),
          lambda o: float(jax.device_get(o[1, -1, 0, -1])), OUT_BYTES)

    p2 = jax.jit(lambda a: pl.pallas_call(
        k_two, grid=(N_UE // UT,), in_specs=[in_spec],
        out_specs=[out2, out2],
        out_shape=[jax.ShapeDtypeStruct((N_UE, Q, N_K), jnp.float32)] * 2)(a))
    bench("pl_write2o", lambda: p2(x),
          lambda o: float(jax.device_get(o[0][-1, 0, -1])), OUT_BYTES)

    # parallel grid semantics + larger tiles
    for ut, par in ((64, True), (128, True), (256, True), (512, True),
                    (128, False), (1024, True)):
        try:
            ispec = pl.BlockSpec((ut, 25), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
            ospec = pl.BlockSpec((2, ut, Q, N_K), lambda i: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM)
            cp = pltpu.CompilerParams(
                dimension_semantics=("parallel",) if par else None,
                vmem_limit_bytes=120 * 2**20)
            pp = jax.jit(lambda a, ut=ut, ispec=ispec, ospec=ospec, cp=cp:
                         pl.pallas_call(
                k_one, grid=(N_UE // ut,), in_specs=[ispec], out_specs=ospec,
                out_shape=jax.ShapeDtypeStruct((2, N_UE, Q, N_K),
                                               jnp.float32),
                compiler_params=cp)(a))
            bench(f"pl_w ut={ut}{' par' if par else ''}",
                  lambda pp=pp: pp(x),
                  lambda o: float(jax.device_get(o[1, -1, 0, -1])),
                  OUT_BYTES)
        except Exception as e:
            log(f"pl_w ut={ut} par={par} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:90]}")

    log("DONE")


if __name__ == "__main__":
    main()

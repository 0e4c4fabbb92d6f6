"""Careful per-call timing of hot-path variants + HBM bandwidth calibration."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

from perf_variants import (make_inputs, variant_current, variant_planes,
                           variant_planes_bf16, U, P, R, T, K)


def bench_sync(name, fn, inputs, n=6):
    jfn = jax.jit(fn)
    out = jfn(inputs)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jfn(inputs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name:24s} min={dt*1e3:8.3f} ms  med={np.median(times)*1e3:8.3f}"
          f" ms  {U/dt/1e6:8.2f} M users/s", flush=True)
    return out


def hbm_copy(x):
    return x * 1.00001


if __name__ == "__main__":
    inputs = make_inputs()
    print(f"U={U} P={P} R={R} T={T} K={K}", flush=True)

    # calibration: pure HBM copy of an H-sized complex array
    h = jnp.ones((U, R, T, K), dtype=jnp.complex64)
    jcp = jax.jit(hbm_copy)
    jax.block_until_ready(jcp(h))
    t0 = time.perf_counter(); jax.block_until_ready(jcp(h))
    dt = time.perf_counter() - t0
    nbytes = h.size * 8 * 2
    print(f"HBM copy {nbytes/1e6:.0f} MB: {dt*1e3:.3f} ms "
          f"-> {nbytes/dt/1e9:.0f} GB/s", flush=True)

    o1 = bench_sync("current(two-step c64)", variant_current, inputs)
    o2 = bench_sync("planes f32", variant_planes, inputs)
    o3 = bench_sync("planes bf16", variant_planes_bf16, inputs)

    # correctness cross-check
    d12 = float(jnp.abs(o1 - o2).max() / jnp.abs(o1).max())
    d13 = float(jnp.abs(o1 - o3).max() / jnp.abs(o1).max())
    print(f"rel err planes f32 vs complex: {d12:.2e}", flush=True)
    print(f"rel err planes bf16 vs complex: {d13:.2e}", flush=True)

"""Compare the Pallas fused kernel vs the XLA planes path on the real TPU."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.pallas.pathsum import fused_path_sum, _reference_impl

U, R, T, P, K = 65536, 1, 64, 25, 64


def inputs(seed=0):
    rng = np.random.RandomState(seed)
    f32 = lambda *s: jnp.asarray(rng.uniform(-1, 1, s), dtype=jnp.float32)
    return (f32(U, R, P), f32(U, R, P), f32(U, T, P), f32(U, T, P),
            f32(U, P), f32(U, P),
            jnp.asarray(rng.uniform(0, 6, (U, P)), dtype=jnp.float32),
            jnp.asarray(np.arange(K), dtype=jnp.float32))


def bench(name, fn, args, n=6):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name:28s} min={dt*1e3:8.3f} ms  {U/dt/1e6:9.2f} M users/s",
          flush=True)
    return out


if __name__ == "__main__":
    args = inputs()
    print(f"U={U} R={R} T={T} P={P} K={K}", flush=True)

    ref = jax.jit(_reference_impl)
    o_ref = bench("XLA planes", ref, args)

    for ut, kt in ((8, 64), (16, 64), (32, 64)):
        try:
            pk = jax.jit(lambda *a, _ut=ut, _kt=kt: fused_path_sum(
                *a, user_tile=_ut, k_tile=_kt, interpret=False))
            o_pal = bench(f"pallas ut={ut} kt={kt}", pk, args)
        except Exception as e:
            print(f"pallas ut={ut} kt={kt} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue

    # correctness (compare via plane differences, avoid complex transfers)
    d = jnp.max(jnp.abs(o_pal[0] - o_ref[0])) + \
        jnp.max(jnp.abs(o_pal[1] - o_ref[1]))
    s = jnp.max(jnp.abs(o_ref[0]))
    print("rel err:", float(jax.device_get(d / s)), flush=True)

"""Fused-kernel tile sweep + cost bisect on the headline workload.

perf_onecall found the one-call fused render at 52.8 ms device (vs 5.2 ms
output roofline) with user_tile=16 -> 8192 grid steps ~ 6.4 us/step: fixed
per-step cost suspected. This sweeps user_tile (VMEM permitting; v5e has
128 MiB) and bisects the in-kernel cost with ablated kernel variants.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python -u benchmarks/perf_tile_sweep.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_UE = 131_072
P = 25
RX_SHAPE = (1, 1)
TX_SHAPE = (8, 8)
N_K = 64


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
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
        out = fn()                       # warm/compile
        assert np.isfinite(float(jax.device_get(out[1, -1, 0, -1])))
        del out
        def sweep():
            o = fn()
            float(jax.device_get(o[1, -1, 0, -1]))
        best = min(_timed(sweep) for _ in range(n))
        dt = max(best - t_rt, 1e-9)
        log(f"{name:34s} dev={dt*1e3:8.2f} ms  -> {N_UE/dt/1e6:6.2f} M users/s")
        return dt

    for ut in (16, 32, 64, 128, 256):
        vm = R.vmem_estimate(ut, RX_SHAPE, TX_SHAPE, P, N_K, 1) / 2**20
        fn = jax.jit(functools.partial(
            R.fused_render, rx_shape=RX_SHAPE, tx_shape=TX_SHAPE, n_k=N_K,
            user_tile=ut, interpret=False, mm_dtype="float32"))
        try:
            bench(f"full ut={ut:3d} (est {vm:5.1f} MiB)",
                  lambda fn=fn: fn(*args))
        except Exception as e:
            log(f"ut={ut} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:100]}")

    log("DONE")


if __name__ == "__main__":
    main()

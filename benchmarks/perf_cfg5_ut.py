"""Config-5 (Doppler 16) user-tile sweep: why only ~250 GB/s of stores?

perf_ablate_r5 found every ablation incl. writeonly times ~16.5-18.5 ms
per 65k users (out [ut, 64, 256]) — store-pipeline-bound. Sweep the
user tile to see if the picked ut=256 is the limiter.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python -u \
     benchmarks/perf_cfg5_ut.py > /tmp/cfg5.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.pallas.render import fused_render, vmem_estimate

U, P, N_K, N_S, N = 65_536, 25, 8, 16, 6


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    args = (mk(U, P), mk(U, P), mk(U, P), mk(U, P),
            jnp.abs(mk(U, P)) * 1e-4, mk(U, N_S * P),
            jnp.abs(mk(U, P)) * 0.1)
    out_gb = U * 64 * 2 * N_S * N_K * 4 / 1e9

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt {t_rt*1e3:.2f} ms; out {out_gb:.2f} GB/dispatch")

    for ut in (64, 128, 256, 512):
        est = vmem_estimate(ut, (1, 1), (8, 8), P, N_K, N_S)
        if est > 110 * 2**20:
            log(f"ut={ut}: skip (vmem est {est/2**20:.0f} MiB)")
            continue

        def _f(a, b, c, d, e, f, g, scratch, _ut=ut):
            del scratch
            return fused_render(a, b, c, d, e, f, g, (1, 1), (8, 8),
                                N_K, user_tile=_ut, interpret=False,
                                mm_dtype="float32", packed=True)
        fj = jax.jit(_f, donate_argnums=(7,))
        try:
            h = jnp.zeros((U, 64, 2 * N_S * N_K), jnp.float32)
            h = fj(*args, h)
            float(jax.device_get(h[-1, -1, -1]))
            samples = []
            for _ in range(3):
                def sweep():
                    nonlocal h
                    for _ in range(N):
                        h = fj(*args, h)
                    float(jax.device_get(h[-1, -1, -1]))
                samples.append(_t(sweep))
            best = (min(samples) - t_rt) / N
            log(f"ut={ut:4d} per-dispatch {best*1e3:7.2f} ms  "
                f"({U/best/1e6:5.2f} M users/s, {out_gb/best:4.0f} GB/s)")
            del h
        except Exception as e:
            log(f"ut={ut}: FAIL {str(e).splitlines()[0][:120]}")
    log("done")


if __name__ == "__main__":
    main()

"""Follow-up to perf_pack32: why did production regress, how far does
packed-32 go?

perf_pack32 measured (same run): production ut=64 = 20.4 ms vs round-3's
12.9 ms pre-restructure probe, and packed-32 ut=256 = 14.2 ms. Suspects
for the production regression: the unbenched hi/lo 3-pass _dot_mode
restructure (landed after round-3's last TPU run), and/or the new
unconditional vmem limit. This sweeps mm_dtype and the vmem limit for
production, and pushes packed-32 tile sizes + mm_dtype.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
        benchmarks/perf_pack32b.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "benchmarks")
from perf_pack32 import fwd32, U, P, RX, TX, N_K, timed_readback, _t
from deepmimo_tpu.ops.pallas import render as R


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


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
        except Exception as e:
            log(f"{tag}: FAILED {str(e).splitlines()[0][:140]}")

    # -- production: mm_dtype sweep at ut=64
    for mm in ("float32", "default", "highest", "bfloat16"):
        f = jax.jit(lambda a, b, c, d, e, g, w, _mm=mm: R.fused_render(
            a, b, c, d, e, g, w, RX, TX, N_K, 64, False, _mm, True))
        run(f"prod ut=64 mm={mm:8s}", f, gty * 0, gtz * 0, gty, gtz,
            amp, psi, omega)

    # -- packed-32: larger tiles + mm_dtype
    for ut, mm in ((256, "float32"), (512, "float32"), (1024, "float32"),
                   (256, "default"), (512, "default")):
        f = jax.jit(lambda a, b, c, d, e, _ut=ut, _mm=mm: fwd32(
            a, b, c, d, e, _ut, mm_dtype=_mm))
        run(f"pack32 ut={ut:4d} mm={mm:8s}", f, gty, gtz, amp, psi,
            omega)


if __name__ == "__main__":
    main()

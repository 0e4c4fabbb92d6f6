"""Slope-timed production-kernel ablations (round 5).

Round-4 ablations (perf_sol.py) timed SINGLE calls with rt-subtraction —
perf_kernel_vs_full.py proved that method blind on this relay (the ~30 ms
round-trip overlaps execution, so a 10.9 ms kernel read as 1.7 ms).  This
probe re-derives the kernel cost structure with the honest estimator:
N back-to-back donated dispatches + one scalar readback, slope = per-
dispatch time.  Variants ride DM_RENDER_ABLATE hooks in the PRODUCTION
kernel (render.py: writeonly / nopanel / notables / nodot /
noreassemble / oneres), set via the module global before each trace.

Configs: the headline (64-ant BS, SISO UE, 64 sc) and BASELINE config 3
(MIMO 8x64, q=512) whose 497k users/s sat ~6x above its output floor
with no accounting (round-4 VERDICT weak #2).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python -u \
     benchmarks/perf_ablate_r5.py > /tmp/ablate.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.pallas import render as R

N = 6
P = 25


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def run_config(name, u, rx_shape, tx_shape, n_k, t_rt, variants, n_s=1):
    q = rx_shape[0] * rx_shape[1] * tx_shape[0] * tx_shape[1]
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    gry, grz = mk(u, P), mk(u, P)
    gty, gtz = mk(u, P), mk(u, P)
    amp = jnp.abs(mk(u, P)) * 1e-4
    psi = mk(u, n_s * P)
    omega = jnp.abs(mk(u, P)) * 0.1
    ut = R.pick_user_tile(u, rx_shape, tx_shape, P, n_k, n_s)
    out_gb = u * q * 2 * n_s * n_k * 4 / 1e9
    log(f"== {name}: u={u} q={q} n_k={n_k} n_s={n_s} ut={ut} "
        f"out={out_gb:.2f} GB/dispatch ==")

    results = {}
    for variant, mm, odt in variants:
        R._ABLATE = variant if variant not in ("full", "mm-default",
                                               "bf16-out") else ""
        try:
            def _step(a, b, c, d, e, f, g, scratch, _mm=mm, _odt=odt):
                del scratch
                return R.fused_render(a, b, c, d, e, f, g,
                                      rx_shape, tx_shape, n_k,
                                      user_tile=ut, interpret=False,
                                      mm_dtype=_mm, packed=True,
                                      out_dtype=_odt)
            f = jax.jit(_step, donate_argnums=(7,))
            h = jnp.zeros((u, q, 2 * n_s * n_k), jnp.dtype(odt))
            h = f(gry, grz, gty, gtz, amp, psi, omega, h)
            float(jax.device_get(h[-1, -1, -1].astype(jnp.float32)))

            samples = []
            for _ in range(3):
                def sweep():
                    nonlocal h
                    for _ in range(N):
                        h = f(gry, grz, gty, gtz, amp, psi, omega, h)
                    float(jax.device_get(
                        h[-1, -1, -1].astype(jnp.float32)))
                samples.append(_t(sweep))
            best = (min(samples) - t_rt) / N
            results[variant + ("" if mm == "float32" else f"/{mm}")
                    + ("" if odt == "float32" else f"/{odt}")] = best
            log(f"  {variant:14s} mm={mm:8s} out={odt:8s} "
                f"per-dispatch {best*1e3:7.2f} ms   "
                f"{u/best/1e6:6.2f} M users/s   {out_gb/best:5.0f} GB/s out")
            del h
        except Exception as e:
            log(f"  {variant} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:120]}")
        finally:
            R._ABLATE = ""
    return results


def main():
    log(f"devices: {jax.devices()}")
    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt {t_rt*1e3:.2f} ms")

    variants = [
        ("full", "float32", "float32"),
        ("mm-default", "default", "float32"),     # no hi/lo split
        ("bf16-out", "float32", "bfloat16"),      # half output bytes
        ("oneres", "float32", "float32"),         # 1 of 4 residues
        ("nodot", "float32", "float32"),          # skip MXU
        ("nopanel", "float32", "float32"),        # skip panel build
        ("notables", "float32", "float32"),       # skip subcarrier tables
        ("noreassemble", "float32", "float32"),   # skip roll/select
        ("writeonly", "float32", "float32"),      # output-DMA only
        ("full", "float32", "float32"),           # repeat: drift check
    ]

    run_config("headline 64-ant", 131_072, (1, 1), (8, 8), 64, t_rt,
               variants)
    run_config("config3 MIMO 8x64", 16_384, (4, 2), (8, 8), 64, t_rt,
               variants)
    # BASELINE configs 2 and 5 (round-4 VERDICT weak #2: name the binder
    # with a measurement). Pruned variant list: the structural ablations.
    pruned = [
        ("full", "float32", "float32"),
        ("mm-default", "default", "float32"),
        ("bf16-out", "float32", "bfloat16"),
        ("notables", "float32", "float32"),
        ("nopanel", "float32", "float32"),
        ("nodot", "float32", "float32"),
        ("writeonly", "float32", "float32"),
    ]
    run_config("config2 SISO 512sc", 131_072, (1, 1), (1, 1), 512, t_rt,
               pruned)
    run_config("config5 doppler16", 65_536, (1, 1), (8, 8), 8, t_rt,
               pruned, n_s=16)   # out 2*S*K = 256 lanes: 4.3 GB/dispatch
    log("done")


if __name__ == "__main__":
    main()

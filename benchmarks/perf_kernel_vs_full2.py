"""Same-run A/B via N-dispatch slope: bare kernel vs full jitted render.

perf_kernel_vs_full.py showed single-call timing is blind on this relay:
the ~33 ms round-trip OVERLAPS execution, so a 10 ms kernel reads as
~2 ms.  The reliable estimator is N back-to-back dispatches + one scalar
readback: total = rt + N * exec (perf_stage_r5.py measured a clean
10.8-11.1 ms/dispatch slope for the full render).

Stages (each 8 dispatches, donated output chain, interleaved 3x):
  A  bare fused_render (precomputed per-path scalars, skip-rx, ut=512)
  B  full _render_full_jit (PathData in: prologue + pack + kernel)
  C  product ds.compute_channels(to_device=True, out=h)
Slope B - slope A = the true prologue+dataset cost per chunk.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
     benchmarks/perf_kernel_vs_full2.py > /tmp/kvf2.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench
import jax
import jax.numpy as jnp

import deepmimo_tpu as dm
from deepmimo_tpu.generator import dataset as D
from deepmimo_tpu.ops.pallas import render as R

U = bench.CHUNK
P = bench.MAX_PATHS
N_K = 64
N = 8


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    data = bench.make_data(U, P)
    params = bench.make_params()
    d = dict(data)
    d["rx_pos"] = np.zeros((U, 3), np.float32)
    d["tx_pos"] = np.zeros((1, 3), np.float32)
    ds = dm.Dataset(d)

    log("warming relay...")
    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt {t_rt*1e3:.2f} ms")

    # --- A: bare kernel, donated output chain -------------------------
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    gty, gtz = mk(U, P), mk(U, P)
    amp = jnp.abs(mk(U, P)) * 1e-4
    psi = mk(U, P)
    omega = jnp.abs(mk(U, P)) * 0.1

    def _bare(a, b, c, dd, e, scratch):
        del scratch
        return R.fused_render(
            jnp.zeros_like(a), jnp.zeros_like(a), a, b, c, dd, e,
            (1, 1), (8, 8), N_K, user_tile=512, interpret=False,
            mm_dtype="float32", packed=True)
    f_bare = jax.jit(_bare, donate_argnums=(5,))

    p0 = ds.set_channel_params(params)
    np.random.seed(1001)
    cfg, bsp, uep = p0.to_config(
        ds.n_ue, ue_rotation=p0.resolve_ue_rotation(ds.n_ue))
    pd = ds._path_data(cfg)
    oshape = D._render_out_shape(pd, bsp, uep, cfg)

    log("compiling A (bare kernel, donated)...")
    ha = jnp.zeros((U, 64, 2 * N_K), jnp.float32)
    ha = f_bare(gty, gtz, amp, psi, omega, ha)
    float(jax.device_get(ha[-1, -1, -1]))
    log("compiling B/C (full render, donated)...")
    h = jnp.zeros(oshape.shape, oshape.dtype)
    h = ds.compute_channels(params, to_device=True, out=h)
    float(jax.device_get(h[0, 0, 0, 0]))
    log("warm; measuring (interleaved, 3 reps x 8 dispatches)")

    def sweep_a():
        nonlocal ha
        t0 = time.perf_counter()
        for _ in range(N):
            ha = f_bare(gty, gtz, amp, psi, omega, ha)
        float(jax.device_get(ha[-1, -1, -1]))
        return time.perf_counter() - t0

    def sweep_b():
        nonlocal h
        t0 = time.perf_counter()
        for _ in range(N):
            h = D._render_full_jit(pd, bsp, uep, cfg, h)
        float(jax.device_get(h[-1, 0, -1, -1]))
        return time.perf_counter() - t0

    def sweep_c():
        nonlocal h
        t0 = time.perf_counter()
        for _ in range(N):
            h = ds.compute_channels(params, to_device=True, out=h)
        float(jax.device_get(h[-1, 0, -1, -1]))
        return time.perf_counter() - t0

    res = {"A bare": [], "B full": [], "C product": []}
    for rep in range(3):
        res["A bare"].append(sweep_a())
        res["B full"].append(sweep_b())
        res["C product"].append(sweep_c())
        log(f"rep {rep} done")

    log(f"relay rt {t_rt*1e3:.2f} ms (subtracted once per sweep)")
    for k, v in res.items():
        s = " ".join(f"{x*1e3:7.1f}" for x in v)
        best = min(v) - t_rt
        per = best / N
        log(f"{k:10s} sweeps[ms]: {s}   per-dispatch {per*1e3:7.2f} ms  "
            f"({U/per/1e6:5.2f} M users/s, "
            f"{U*64*2*N_K*4/per/1e9:4.0f} GB/s out)")
    a = (min(res['A bare']) - t_rt) / N
    b = (min(res['B full']) - t_rt) / N
    c = (min(res['C product']) - t_rt) / N
    log(f"prologue+pack cost (B-A): {(b-a)*1e3:.2f} ms/chunk; "
        f"dataset layer (C-B): {(c-b)*1e3:.2f} ms/chunk")
    log("done")


if __name__ == "__main__":
    main()

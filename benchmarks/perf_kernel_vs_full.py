"""Same-run A/B: bare kernel vs full jitted render vs product call.

Round-4 VERDICT weak #1 says the product API "gives back ~32% of the
kernel's measured speed" (bench 11.5-11.7 ms/chunk vs kernel 7.3-7.9 ms).
perf_stage_r5.py already showed product == raw-jitted-sweep (0.4 ms/chunk
delta) and ~0.86 ms/dispatch relay overhead.  The remaining question:
does the BARE kernel (precomputed per-path scalars, the perf_pack32c
measurement) actually beat the full jitted render (prologue included) in
the SAME relay window, or were the round-4 7.3-7.9 ms readings just a
fast window?

Interleaved, rt-subtracted, best-of-5 per stage:
  A  bare fused_render   (precomputed gty/gtz/amp/psi/omega, skip-rx)
  B  full _render_full_jit (PathData in, donated out)  [1 chunk]
  C  product ds.compute_channels(to_device=True, out=h) [1 chunk]

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
     benchmarks/perf_kernel_vs_full.py > /tmp/kvf.log 2>&1
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

    # --- A: bare kernel inputs (random per-path scalars, right shapes) --
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    gty, gtz = mk(U, P), mk(U, P)
    amp = jnp.abs(mk(U, P)) * 1e-4
    psi = mk(U, P)
    omega = jnp.abs(mk(U, P)) * 0.1
    f_bare = jax.jit(lambda a, b, c, dd, e: R.fused_render(
        jnp.zeros_like(a), jnp.zeros_like(a), a, b, c, dd, e,
        (1, 1), (8, 8), N_K, user_tile=512, interpret=False,
        mm_dtype="float32", packed=True))

    # --- B/C: product-path setup --------------------------------------
    p0 = ds.set_channel_params(params)
    np.random.seed(1001)
    cfg, bsp, uep = p0.to_config(
        ds.n_ue, ue_rotation=p0.resolve_ue_rotation(ds.n_ue))
    pd = ds._path_data(cfg)
    oshape = D._render_out_shape(pd, bsp, uep, cfg)
    h = jnp.zeros(oshape.shape, oshape.dtype)
    log("compiling A (bare kernel)...")
    ha = f_bare(gty, gtz, amp, psi, omega)
    float(jax.device_get(ha[0, 0, 0]))
    log("compiling B/C (full render)...")
    h = ds.compute_channels(params, to_device=True, out=h)
    float(jax.device_get(h[0, 0, 0, 0]))
    log("compiling B (non-donating executable)...")
    hb = D._render_full_jit(pd, bsp, uep, cfg, None)
    float(jax.device_get(hb[0, 0, 0, 0]))
    del hb
    log("warm; measuring (interleaved, 5 reps)")

    res = {"A bare": [], "B full": [], "C product": []}
    for rep in range(5):
        t = _t(lambda: float(jax.device_get(
            f_bare(gty, gtz, amp, psi, omega)[0, 0, 0])))
        res["A bare"].append(t)
        t = _t(lambda: float(jax.device_get(
            D._render_full_jit(pd, bsp, uep, cfg, None)[0, 0, 0, 0])))
        res["B full"].append(t)

        def c_call():
            nonlocal h
            h = ds.compute_channels(params, to_device=True, out=h)
            float(jax.device_get(h[0, 0, 0, 0]))
        t = _t(c_call)
        res["C product"].append(t)
        log(f"rep {rep} done")

    log(f"relay rt {t_rt*1e3:.2f} ms (subtracted)")
    for k, v in res.items():
        s = " ".join(f"{(x - t_rt)*1e3:7.1f}" for x in v)
        best = min(v) - t_rt
        log(f"{k:10s} dev[ms]: {s}   min {best*1e3:7.2f} ms  "
            f"({U/best/1e6:5.2f} M users/s)")
    log("done")


if __name__ == "__main__":
    main()

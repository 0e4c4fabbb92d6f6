"""Packed-layout breakdown: kernel-only vs full render program.

  kern ut=N   — fused_render(packed) alone on precomputed [U, P] scalars
  render      — full jitted render_channels_planes (prologue + kernel)
  render noP  — render program with pattern gains/FoV disabled paths

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python -u benchmarks/perf_packed.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N_UE = 131_072
P = 25

def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    from deepmimo_tpu.ops.pallas.render import fused_render
    from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
    from deepmimo_tpu.ops.channel import render_channels_planes

    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(7)
    mk = lambda lo, hi: jax.device_put(jnp.asarray(
        rng.uniform(lo, hi, (N_UE, P)), jnp.float32))
    args = (mk(-3, 3), mk(-3, 3), mk(-3, 3), mk(-3, 3),
            mk(0, 1e-4), mk(-3, 3), mk(0, 6))

    n_valid = rng.randint(1, P + 1, size=N_UE)
    mask = np.arange(P)[None, :] < n_valid[:, None]
    nan = lambda lo, hi: np.where(mask, rng.uniform(lo, hi, (N_UE, P)),
                                  np.nan)
    paths = jax.device_put(PathData.from_numpy(
        power=nan(-130, -60), phase=nan(-180, 180), delay=nan(1e-7, 4e-6),
        aoa_az=nan(-180, 180), aoa_el=nan(0, 180), aod_az=nan(-180, 180),
        aod_el=nan(0, 180), dtype=jnp.float32))
    bs = AntennaPanel.make()
    ue = AntennaPanel.make()
    log("data on device")

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda t: jnp.sum(t * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt = {t_rt*1e3:.2f} ms")

    def bench(name, fn, arg, idx, n=3):
        out = fn(*arg)
        float(jax.device_get(out[idx]))
        del out
        def sweep():
            o = fn(*arg)
            float(jax.device_get(o[idx]))
        best = min(_timed(sweep) for _ in range(n))
        dt = max(best - t_rt, 1e-9)
        log(f"{name:24s} dev={dt*1e3:8.2f} ms  -> {N_UE/dt/1e6:6.2f} M users/s")

    for mm in ("float32", "highest", "high", "default", "bfloat16"):
        fn = jax.jit(functools.partial(
            fused_render, rx_shape=(1, 1), tx_shape=(8, 8), n_k=64,
            user_tile=64, interpret=False, mm_dtype=mm, packed=True))
        try:
            bench(f"kern packed {mm}", fn, args, (-1, 0, -1))
        except Exception as e:
            log(f"kern {mm} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:100]}")

    cfg = ChannelConfig(bs_shape=(8, 8), ue_shape=(1, 1), freq_domain=True,
                        subcarriers=512,
                        selected_subcarriers=tuple(range(64)),
                        bandwidth=10e6, num_paths=P, dtype="complex64",
                        backend="fused", planes_layout="packed")
    rfn = jax.jit(lambda p, b, u: render_channels_planes(p, b, u, cfg))
    bench("render full", rfn, (paths, bs, ue), (-1, 0, -1, -1))
    log("DONE")


if __name__ == "__main__":
    main()

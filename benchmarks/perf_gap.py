"""Bisect the product-path vs bare-kernel gap (~5.7 ms per 131k chunk).

Suspects: the XLA prologue (angles -> phase steps, amp/psi/omega), the
output reshape [U, Q, 2SK] -> [U, R, T, 2SK], and donated-carry copies.

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 \
          python -u benchmarks/perf_gap.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.pallas.render import fused_render
from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
from deepmimo_tpu.ops.channel import render_channels_planes

N_UE = 131_072
N_CHUNKS = 12
P = 25
Q = 64
N_K = 64
SK = N_K


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def sweep(name, step, h0, args_list, t_rt, sync):
    h = h0
    for a in args_list:
        h = step(a, h)
    sync(h)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for a in args_list:
            h = step(a, h)
        sync(h)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    dt = max(best - t_rt, 1e-9)
    tot = N_UE * N_CHUNKS
    log(f"{name}: dev={dt*1e3:6.1f} ms  {tot/dt/1e6:5.2f} M users/s  "
        f"({dt*1e3/N_CHUNKS:.2f} ms/chunk)")
    return h


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(7)

    # raw per-path scalars (post-prologue inputs of fused_render)
    mk = lambda lo, hi: jax.device_put(jnp.asarray(
        rng.uniform(lo, hi, (N_UE, P)), jnp.float32))
    raw = [(mk(-3, 3), mk(-3, 3), mk(-3, 3), mk(-3, 3),
            mk(0, 1e-4), mk(-3, 3), mk(0, 6)) for _ in range(N_CHUNKS)]

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt = {t_rt*1e3:.2f} ms")

    sync3 = lambda h: float(jax.device_get(h[-1, -1, -1]))
    sync4 = lambda h: float(jax.device_get(h[-1, -1, -1, -1]))

    # --- G1: bare kernel, 12 donated dispatches, output [U, Q, 2SK] ---
    @functools.partial(jax.jit, donate_argnums=(1,))
    def g1(a, h_prev):
        del h_prev
        return fused_render(*a, (1, 1), (8, 8), N_K, user_tile=128,
                            interpret=False, mm_dtype="float32", packed=True)
    h = jnp.zeros((N_UE, Q, 2 * SK), jnp.float32)
    h = sweep("G1 kernel donated      ", g1, h, raw, t_rt, sync3)
    del h

    # --- G2: kernel + output reshape to [U, 1, Q, 2SK] ---
    @functools.partial(jax.jit, donate_argnums=(1,))
    def g2(a, h_prev):
        del h_prev
        out = fused_render(*a, (1, 1), (8, 8), N_K, user_tile=128,
                           interpret=False, mm_dtype="float32", packed=True)
        return out.reshape(N_UE, 1, Q, 2 * SK)
    h = jnp.zeros((N_UE, 1, Q, 2 * SK), jnp.float32)
    h = sweep("G2 kernel + reshape    ", g2, h, raw, t_rt, sync4)
    del h

    # --- G3: kernel, NO donation (fresh output buffer each time) ---
    @jax.jit
    def g3(a, h_prev):
        del h_prev
        return fused_render(*a, (1, 1), (8, 8), N_K, user_tile=128,
                            interpret=False, mm_dtype="float32", packed=True)
    h = jnp.zeros((N_UE, Q, 2 * SK), jnp.float32)
    h = sweep("G3 kernel no-donate    ", g3, h, raw, t_rt, sync3)
    del h

    # --- G4: full product renderer (render_channels_planes) ---
    cfg = ChannelConfig(bs_shape=(8, 8), ue_shape=(1, 1), freq_domain=True,
                        subcarriers=512,
                        selected_subcarriers=tuple(range(N_K)),
                        bandwidth=10e6, num_paths=P, dtype="complex64",
                        backend="fused", planes_layout="packed")
    bs = AntennaPanel.make()
    ue = AntennaPanel.make()

    def mkpd(seed):
        r = np.random.RandomState(seed)
        m = lambda lo, hi: r.uniform(lo, hi, (N_UE, P)).astype(np.float32)
        return jax.device_put(PathData(
            power_dbw=jnp.asarray(m(-130, -60)),
            phase_deg=jnp.asarray(m(-180, 180)),
            delay_s=jnp.asarray(m(1e-7, 4e-6)),
            aoa_az_deg=jnp.asarray(m(-180, 180)),
            aoa_el_deg=jnp.asarray(m(0, 180)),
            aod_az_deg=jnp.asarray(m(-180, 180)),
            aod_el_deg=jnp.asarray(m(0, 180)),
            valid=jnp.ones((N_UE, P), bool)))
    pds = [mkpd(i) for i in range(N_CHUNKS)]

    @functools.partial(jax.jit, donate_argnums=(1,))
    def g4(pd, h_prev):
        del h_prev
        return render_channels_planes(pd, bs, ue, cfg)
    h = jnp.zeros((N_UE, 1, Q, 2 * SK), jnp.float32)
    h = sweep("G4 full renderer       ", g4, h, pds, t_rt, sync4)
    del h

    # --- G5: full renderer, no donation ---
    @jax.jit
    def g5(pd, h_prev):
        del h_prev
        return render_channels_planes(pd, bs, ue, cfg)
    h = jnp.zeros((N_UE, 1, Q, 2 * SK), jnp.float32)
    h = sweep("G5 full no-donate      ", g5, h, pds, t_rt, sync4)

    log("DONE")


if __name__ == "__main__":
    main()

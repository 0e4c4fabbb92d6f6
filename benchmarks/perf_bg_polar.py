"""Dual-polar beam gains vs dual-polar full render, slope-timed A/B.

The polar render produces all four polarizations' H planes
[U, R, T, 2*4*S*K]; the polar beam-gain path reduces straight to
[U, R*B, 4*S*K] power maps with the codebook folded into the kernel.
Appends the measured numbers to beamgain_bench.json ("polar" section).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
     benchmarks/perf_bg_polar.py > /tmp/bgp.log 2>&1
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
from deepmimo_tpu.ops.channel import (render_beam_gains_polar,
                                      render_channels_planes_polar)

U, P, B, N_K, N = 32_768, 25, 16, 64, 6   # polar H planes are 4x: keep the donated pair under HBM
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "beamgain_bench.json")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    m = lambda lo, hi: rng.uniform(lo, hi, (U, P)).astype(np.float32)
    paths = jax.device_put(PathData.from_numpy(
        power=m(-130, -60), phase=m(-180, 180), delay=m(1e-7, 2e-6),
        aoa_az=m(-180, 180), aoa_el=m(0, 180),
        aod_az=m(-180, 180), aod_el=m(0, 180), dtype=jnp.float32))
    bs = AntennaPanel.make()
    ue = AntennaPanel.make()
    cfg = ChannelConfig(bs_shape=(8, 8), ue_shape=(1, 1),
                        freq_domain=True, subcarriers=512,
                        selected_subcarriers=tuple(range(N_K)),
                        num_paths=P, dtype="complex64", backend="fused",
                        planes_layout="packed")
    pol_p = jax.device_put(jnp.asarray(
        rng.uniform(-120, -70, (4, U, P)).astype(np.float32)))
    pol_ph = jax.device_put(jnp.asarray(
        rng.uniform(-180, 180, (4, U, P)).astype(np.float32)))
    w = np.exp(1j * rng.uniform(-np.pi, np.pi, (B, 64))) / 8.0
    wr = jnp.asarray(np.real(w), jnp.float32)
    wi = jnp.asarray(np.imag(w), jnp.float32)

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt {t_rt*1e3:.2f} ms")

    def _bg(p_, b_, u_, pp_, ph_, wr_, wi_, scratch):
        del scratch
        return render_beam_gains_polar(p_, b_, u_, cfg, pp_, ph_, wr_,
                                       wi_)
    f_bg = jax.jit(_bg, donate_argnums=(7,))

    def _rd(p_, b_, u_, pp_, ph_, scratch):
        del scratch
        return render_channels_planes_polar(p_, b_, u_, cfg, pp_, ph_)
    f_rd = jax.jit(_rd, donate_argnums=(5,))

    log("compiling...")
    g = f_bg(paths, bs, ue, pol_p, pol_ph, wr, wi,
             jnp.zeros((U, B, 4 * N_K)))
    float(jax.device_get(g[-1, -1, -1]))
    h = f_rd(paths, bs, ue, pol_p, pol_ph,
             jnp.zeros((U, 1, 64, 2 * 4 * N_K)))
    float(jax.device_get(h[-1, -1, -1, -1]))
    log("warm; measuring (interleaved, 3 reps)")

    res = {"polar_beamgain": [], "polar_render": []}
    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            g = f_bg(paths, bs, ue, pol_p, pol_ph, wr, wi, g)
        float(jax.device_get(g[-1, -1, -1]))
        res["polar_beamgain"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(N):
            h = f_rd(paths, bs, ue, pol_p, pol_ph, h)
        float(jax.device_get(h[-1, -1, -1, -1]))
        res["polar_render"].append(time.perf_counter() - t0)
        log(f"rep {rep} done")

    out = {}
    for k, v in res.items():
        best = (min(v) - t_rt) / N
        out[k] = {"per_dispatch_ms": round(best * 1e3, 2),
                  "users_per_s": round(U / best, 1)}
        log(f"{k:15s} per-dispatch {best*1e3:7.2f} ms "
            f"({U/best/1e6:5.2f} M users/s)")
    ratio = (out["polar_beamgain"]["users_per_s"] /
             out["polar_render"]["users_per_s"])
    out["beamgain_vs_full_render"] = round(ratio, 2)
    out["workload"] = (f"{U} users x {P} paths, 64-ant BS, 4 pols, "
                       f"{B} beams, {N_K} sc, {N}-dispatch slope")
    log(f"polar beam gains vs polar full render: {ratio:.2f}x")

    with open(OUT) as f:
        d = json.load(f)
    d["polar"] = out
    with open(OUT, "w") as f:
        json.dump(d, f, indent=2)
    log(f"updated {OUT}")


if __name__ == "__main__":
    main()

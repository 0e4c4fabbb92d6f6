"""Fused render->consume bench: beam-gain maps without materializing H.

Round-4 VERDICT weak #5 ("break the output roofline by not materializing
H"): serving loops that only need codebook beam gains reduce
H [U, R*T, 2*S*K] planes to G [U, R*B, S*K] power maps. Three routes,
slope-timed (N donated dispatches + one scalar readback) in ONE process:

  A  fused consumer   render_beam_gains: codebook folded INTO the
                      path-sum kernel; H never exists
  B  device consume   fused H render + XLA einsum fold on device
                      (H in HBM once, never on the host)
  C  host consume     fused H render + device_get(H planes) + numpy
                      fold — the reference-style workflow

Writes benchmarks/beamgain_bench.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python -u \
     benchmarks/run_beamgain_bench.py > /tmp/bg.log 2>&1
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
from deepmimo_tpu.ops.channel import (render_beam_gains,
                                      render_channels_planes)

U = 131_072
P = 25
N_BEAMS = 16
N_K = 64
N = 6
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "beamgain_bench.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(7)
    n_valid = rng.randint(1, P + 1, size=U)
    mask = np.arange(P)[None, :] < n_valid[:, None]
    m = lambda lo, hi: np.where(mask, rng.uniform(lo, hi, (U, P)),
                                np.nan).astype(np.float32)
    paths = jax.device_put(PathData.from_numpy(
        power=m(-130, -60), phase=m(-180, 180), delay=m(1e-7, 4e-6),
        aoa_az=m(-180, 180), aoa_el=m(0, 180),
        aod_az=m(-180, 180), aod_el=m(0, 180), dtype=jnp.float32))
    bs = AntennaPanel.make()
    ue = AntennaPanel.make()
    cfg = ChannelConfig(bs_shape=(8, 8), ue_shape=(1, 1),
                        freq_domain=True, subcarriers=512,
                        selected_subcarriers=tuple(range(N_K)),
                        bandwidth=10e6, num_paths=P, dtype="complex64",
                        backend="fused", planes_layout="packed")
    w = np.exp(1j * rng.uniform(-np.pi, np.pi, (N_BEAMS, 64))) / 8.0
    wr = jnp.asarray(np.real(w), jnp.float32)
    wi = jnp.asarray(np.imag(w), jnp.float32)

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt {t_rt*1e3:.2f} ms")

    # --- A: fused consumer (donated output chain) ----------------------
    def _a(p_, b_, u_, wr_, wi_, scratch):
        del scratch
        return render_beam_gains(p_, b_, u_, cfg, wr_, wi_)
    f_a = jax.jit(_a, donate_argnums=(5,))

    # --- B: fused H render + on-device einsum fold ---------------------
    def _b(p_, b_, u_, wr_, wi_, scratch):
        del scratch
        h = render_channels_planes(p_, b_, u_, cfg)   # [U, R, T, 2SK]
        uu, r, t, two_sk = h.shape
        sk = two_sk // 2
        hr, hi = h[..., :sk], h[..., sk:]
        # HIGHEST: TPU einsum default is one bf16 pass (~2^-9); the fused
        # route's fold is f32-grade, so match it for the parity check.
        es = functools.partial(jnp.einsum,
                               precision=jax.lax.Precision.HIGHEST)
        yr = es("bt,urtk->urbk", wr_, hr) + es("bt,urtk->urbk", wi_, hi)
        yi = es("bt,urtk->urbk", wr_, hi) - es("bt,urtk->urbk", wi_, hr)
        return yr * yr + yi * yi
    f_b = jax.jit(_b, donate_argnums=(5,))

    # --- C: fused H render + host readback + numpy fold ----------------
    f_h = jax.jit(lambda p_, b_, u_, scratch: render_channels_planes(
        p_, b_, u_, cfg), donate_argnums=(3,))

    def consume_host(h_np):
        sk = h_np.shape[-1] // 2
        hr, hi = h_np[..., :sk], h_np[..., sk:]
        yr = np.einsum("bt,urtk->urbk", np.real(w), hr) + \
            np.einsum("bt,urtk->urbk", np.imag(w), hi)
        yi = np.einsum("bt,urtk->urbk", np.real(w), hi) - \
            np.einsum("bt,urtk->urbk", np.imag(w), hr)
        return yr * yr + yi * yi

    log("compiling A/B/C...")
    ga = f_a(paths, bs, ue, wr, wi, jnp.zeros((U, N_BEAMS, N_K)))
    float(jax.device_get(ga[-1, -1, -1]))
    gb = f_b(paths, bs, ue, wr, wi,
             jnp.zeros((U, 1, N_BEAMS, N_K)))
    float(jax.device_get(gb[-1, -1, -1, -1]))
    hc = f_h(paths, bs, ue, jnp.zeros((U, 1, 64, 2 * N_K)))
    float(jax.device_get(hc[-1, -1, -1, -1]))
    # Parity check: A == B == C on a sample (same codebook, same paths)
    sa = np.asarray(jax.device_get(ga[:64])).reshape(64, 1, N_BEAMS, N_K)
    sb = np.asarray(jax.device_get(gb[:64]))
    scale = sb.max()
    np.testing.assert_allclose(sa, sb, atol=1e-4 * scale)
    log("warm; A==B parity ok. measuring (interleaved, 3 reps)")

    def sweep_a():
        nonlocal ga
        t0 = time.perf_counter()
        for _ in range(N):
            ga = f_a(paths, bs, ue, wr, wi, ga)
        float(jax.device_get(ga[-1, -1, -1]))
        return time.perf_counter() - t0

    def sweep_b():
        nonlocal gb
        t0 = time.perf_counter()
        for _ in range(N):
            gb = f_b(paths, bs, ue, wr, wi, gb)
        float(jax.device_get(gb[-1, -1, -1, -1]))
        return time.perf_counter() - t0

    # C pays a 4.3 GB H readback per dispatch through the relay — keep
    # its sweep short (N_C dispatches) and normalize per dispatch.
    N_C = 2

    def sweep_c():
        nonlocal hc
        t0 = time.perf_counter()
        for _ in range(N_C):
            hc = f_h(paths, bs, ue, hc)
            h_np = np.asarray(jax.device_get(hc))
            g = consume_host(h_np[:1024])   # fold a 1k-user slice only
        del g
        return time.perf_counter() - t0

    skip_host = bool(int(os.environ.get("SKIP_HOST", "0")))
    res = {"A_fused_consumer": [], "B_device_consume": []}
    if not skip_host:
        res["C_host_readback"] = []
    for rep in range(3):
        res["A_fused_consumer"].append(sweep_a())
        res["B_device_consume"].append(sweep_b())
        if not skip_host:
            res["C_host_readback"].append(sweep_c())
        log(f"rep {rep} done")

    out = {"workload": f"{U} users x {P} paths, 64-ant BS, {N_BEAMS} "
                       f"beams, {N_K} subcarriers, {N} dispatches/sweep "
                       f"(C: {N_C})",
           "relay_rt_ms": t_rt * 1e3}
    for k, v in res.items():
        best = min(v) - t_rt
        per = best / (N_C if k == "C_host_readback" else N)
        out[k] = {"per_dispatch_ms": round(per * 1e3, 2),
                  "users_per_s": round(U / per, 1),
                  "sweeps_ms": [round(x * 1e3, 1) for x in v]}
        log(f"{k:18s} per-dispatch {per*1e3:8.2f} ms  "
            f"{U/per/1e6:6.2f} M users/s")
    a = out["A_fused_consumer"]["users_per_s"]
    b = out["B_device_consume"]["users_per_s"]
    out["fused_vs_device_consume"] = round(a / b, 2)
    if not skip_host:
        c_ = out["C_host_readback"]["users_per_s"]
        out["fused_vs_host_readback"] = round(a / c_, 2)
        log(f"fused vs device-consume: {a/b:.2f}x; "
            f"vs host-readback: {a/c_:.2f}x")
    else:
        log(f"fused vs device-consume: {a/b:.2f}x (host route skipped)")
    if skip_host:
        return                      # A/B reconfirmation run: keep the
                                    # full 3-route artifact on disk
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()

"""Config-3 dispatch-structure probe: where do 10 ms/block go?

The config-3 kernel slope-times at 4.4-6.5 ms per 8,192-user block
(perf_ablate_r5.py) but the RESULTS sweep lands at ~16 ms/block. Probes,
interleaved in ONE process:

  A  16 separate donated dispatches, slice-inside-jit (the sweep today)
  B  ONE jit: lax.fori_loop over the 16 blocks, carry = one block buffer
  D  16 dispatches WITHOUT the in-jit dynamic slice (pre-sliced inputs)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
     benchmarks/perf_cfg3_dispatch.py > /tmp/cfg3.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
from deepmimo_tpu.ops.channel import render_channels_planes

N_UE = 131_072
P = 25
CFG = ChannelConfig(bs_shape=(8, 8), ue_shape=(4, 2), freq_domain=True,
                    subcarriers=512, selected_subcarriers=tuple(range(64)),
                    num_paths=P, dtype="complex64", backend="fused",
                    planes_layout="packed")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    m = lambda lo, hi: rng.uniform(lo, hi, (N_UE, P)).astype(np.float32)
    paths = jax.device_put(PathData.from_numpy(
        power=m(-130, -60), phase=m(-180, 180), delay=m(1e-7, 2e-6),
        aoa_az=m(-180, 180), aoa_el=m(0, 180),
        aod_az=m(-180, 180), aod_el=m(0, 180), dtype=jnp.float32))
    bs = AntennaPanel.make()
    ue = AntennaPanel.make()

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt {t_rt*1e3:.2f} ms")

    # --- A: separate dispatches, slice inside jit ----------------------
    BLK_A = 8192
    f_a = jax.jit(lambda p, b, u, i, scratch: render_channels_planes(
        p.slice_users(i, BLK_A), b, u, CFG), donate_argnums=(4,))
    out_a = f_a(paths, bs, ue, 0, jnp.zeros((BLK_A, 8, 64, 128)))
    float(jax.device_get(out_a[0, 0, 0, 0]))

    def sweep_a():
        nonlocal out_a
        t0 = time.perf_counter()
        for i in range(N_UE // BLK_A):
            out_a = f_a(paths, bs, ue, i * BLK_A, out_a)
        float(jax.device_get(out_a[-1, 0, -1, -1]))
        return time.perf_counter() - t0

    # --- B: one jit, fori_loop over blocks -----------------------------
    def whole(p, b, u, scratch):
        del scratch

        def body(i, carry):
            pd = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, i * BLK_A,
                                                       BLK_A), p)
            return render_channels_planes(pd, b, u, CFG)
        return jax.lax.fori_loop(0, N_UE // BLK_A, body,
                                 jnp.zeros((BLK_A, 8, 64, 128)))
    f_b = jax.jit(whole, donate_argnums=(3,))
    out_b = f_b(paths, bs, ue, jnp.zeros((BLK_A, 8, 64, 128)))
    float(jax.device_get(out_b[0, 0, 0, 0]))

    def sweep_b():
        nonlocal out_b
        t0 = time.perf_counter()
        out_b = f_b(paths, bs, ue, out_b)
        float(jax.device_get(out_b[-1, 0, -1, -1]))
        return time.perf_counter() - t0

    # --- D: separate dispatches, pre-sliced (device-resident) inputs ---
    blocks = [jax.tree_util.tree_map(lambda x: x[i:i + BLK_A], paths)
              for i in range(0, N_UE, BLK_A)]
    blocks = [jax.device_put(b) for b in blocks]
    f_d = jax.jit(lambda p, b, u, scratch: render_channels_planes(
        p, b, u, CFG), donate_argnums=(3,))
    out_d = f_d(blocks[0], bs, ue, jnp.zeros((BLK_A, 8, 64, 128)))
    float(jax.device_get(out_d[0, 0, 0, 0]))

    def sweep_d():
        nonlocal out_d
        t0 = time.perf_counter()
        for blk in blocks:
            out_d = f_d(blk, bs, ue, out_d)
        float(jax.device_get(out_d[-1, 0, -1, -1]))
        return time.perf_counter() - t0

    res = {"A 16x8k slice-in-jit": [], "B fori_loop one jit": [],
           "D 16x8k pre-sliced": []}
    for rep in range(3):
        res["A 16x8k slice-in-jit"].append(sweep_a())
        res["B fori_loop one jit"].append(sweep_b())
        res["D 16x8k pre-sliced"].append(sweep_d())
        log(f"rep {rep} done")

    for k, v in res.items():
        s = " ".join(f"{x*1e3:7.1f}" for x in v)
        best = min(v) - t_rt
        log(f"{k:22s} sweeps[ms]: {s}  min {best*1e3:7.1f}  "
            f"({N_UE/best/1e6:5.2f} M users/s)")
    log("done")


if __name__ == "__main__":
    main()

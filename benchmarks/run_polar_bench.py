"""Dual-polar device-path throughput vs single-pol (VERDICT r3 ask #5).

Target: dual-polar users/s within 4.5x of single-pol (it renders 4x the
output) instead of the old 4x-independent-renders + host assembly.
Measures both through the product API (Dataset.compute_channels,
to_device planes) on the same synthetic 32k-user chunk.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python -u \
        benchmarks/run_polar_bench.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_UE = 32_768
MAX_PATHS = 25
OUT = os.path.join(REPO, "benchmarks", "polar_bench.json")


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax
    import deepmimo_tpu as dm
    from deepmimo_tpu import consts as c
    from bench import make_data

    data = make_data(N_UE, MAX_PATHS)
    nanmask = np.isnan(data["power"])
    rng = np.random.RandomState(1)

    def dataset():
        d = dict(data)
        d["rx_pos"] = np.zeros((N_UE, 3), np.float32)
        d["tx_pos"] = np.zeros((1, 3), np.float32)
        ds = dm.Dataset(d)
        for pol in ("vv", "vh", "hh", "hv"):
            ds[f"power_{pol}"] = np.where(
                nanmask, np.nan,
                rng.uniform(-120, -70, data["power"].shape)
            ).astype(np.float32)
            ds[f"phase_{pol}"] = np.where(
                nanmask, np.nan,
                rng.uniform(-180, 180, data["power"].shape)
            ).astype(np.float32)
        return ds

    def params(polar):
        p = dm.ChannelGenParameters()
        p[c.PARAMSET_ANT_BS][c.PARAMSET_ANT_SHAPE] = np.array([8, 8])
        p[c.PARAMSET_OFDM][c.PARAMSET_OFDM_SC_NUM] = 512
        p[c.PARAMSET_OFDM][c.PARAMSET_OFDM_SC_SAMP] = np.arange(64)
        p[c.PARAMSET_NUM_PATHS] = MAX_PATHS
        if polar:
            p[c.PARAMSET_POLAR_EN] = 1
        return p

    tiny = jax.jit(lambda x: x * 1.000001)(jax.numpy.ones((8, 128)))
    t_rt = min(_t(lambda: float(jax.device_get(tiny[0, 0])))
               for _ in range(5))
    print(f"relay rt {t_rt * 1e3:.1f} ms", flush=True)

    # N-dispatch slope (round-5 correction: single-call readbacks overlap
    # the ~25-33 ms relay rt and under-report short kernels); the donated
    # `out=` chain keeps device memory constant across the N calls.
    N = 6
    results = {"timing": f"{N}-dispatch donated slope, rt subtracted"}
    for name, polar in (("single_pol", False), ("dual_polar", True)):
        ds = dataset()
        p = params(polar)
        h = ds.compute_channels(p, to_device=True)
        sync = lambda hh: float(jax.device_get(jax.numpy.ravel(hh)[-1]))
        sync(h)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(N):
                h = ds.compute_channels(p, to_device=True, out=h)
            sync(h)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        dt = max(best - t_rt, 1e-9) / N
        results[name] = {"ms": round(dt * 1e3, 2),
                         "users_per_s": round(N_UE / dt, 1)}
        print(f"{name}: {dt * 1e3:.2f} ms -> {N_UE / dt / 1e6:.2f} M "
              f"users/s", flush=True)

    ratio = (results["single_pol"]["users_per_s"] /
             results["dual_polar"]["users_per_s"])
    results["slowdown_ratio"] = round(ratio, 2)
    results["target"] = "<= 4.5x (renders 4x the output in one dispatch)"
    results["config"] = f"{N_UE} users, 25 paths, 8x8 BS, 64 of 512 sc"
    print(f"dual-polar slowdown: {ratio:.2f}x (target <= 4.5)", flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

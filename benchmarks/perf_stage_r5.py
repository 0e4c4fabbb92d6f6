"""Round-5 stage accounting of the product sweep (VERDICT r4 weak #1).

Where does bench.py's 11.5-11.7 ms/chunk go, when the bare kernel measures
7.3-7.9 ms and the host layer measures 0.53 ms (perf_hostlayer.py)?

Interleaved same-run probes (relay noise can hit 2x across processes):
  S0  12 tiny jitted dispatches, one readback   -> per-dispatch relay cost
  S1  12 raw _render_full_jit calls, prebuilt   -> sweep w/o dataset layer
  S2  12 product compute_channels calls          -> bench.py's exact loop
  S3  1-chunk and 4-chunk sweeps                 -> per-dispatch slope

All stages repeat 3x interleaved; report every sample + min.
Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
     benchmarks/perf_stage_r5.py > /tmp/stage.log 2>&1
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

CHUNK = bench.CHUNK
N_CHUNKS = bench.N_CHUNKS


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log("building data...")
    data = bench.make_data(CHUNK * N_CHUNKS, bench.MAX_PATHS)
    params = bench.make_params()
    datasets = []
    for i in range(N_CHUNKS):
        sl = slice(i * CHUNK, (i + 1) * CHUNK)
        d = {k: v[sl] for k, v in data.items()}
        d["rx_pos"] = np.zeros((CHUNK, 3), np.float32)
        d["tx_pos"] = np.zeros((1, 3), np.float32)
        datasets.append(dm.Dataset(d))

    log("warming relay...")
    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt {t_rt*1e3:.2f} ms")

    # Compile the product executable and stage all path data (bench.py's
    # warmup, donated-out from the start).
    log("compiling product executable...")
    ds0 = datasets[0]
    p0 = ds0.set_channel_params(params)
    np.random.seed(1001)
    cfg, bsp, uep = p0.to_config(
        ds0.n_ue, ue_rotation=p0.resolve_ue_rotation(ds0.n_ue))
    oshape = D._render_out_shape(ds0._path_data(cfg), bsp, uep, cfg)
    h = jnp.zeros(oshape.shape, oshape.dtype)
    for ds in datasets:
        h = ds.compute_channels(params, to_device=True, out=h)
    float(jax.device_get(h[0, 0, 0, 0]))
    log("warm. path data staged for all 12 chunks.")

    pds = [ds._path_data(cfg) for ds in datasets]

    def sweep_product():
        nonlocal h
        t0 = time.perf_counter()
        for ds in datasets:
            h = ds.compute_channels(params, to_device=True, out=h)
        float(jax.device_get(h[-1, 0, -1, -1]))
        return time.perf_counter() - t0

    def sweep_raw():
        nonlocal h
        t0 = time.perf_counter()
        for pd in pds:
            h = D._render_full_jit(pd, bsp, uep, cfg, h)
        float(jax.device_get(h[-1, 0, -1, -1]))
        return time.perf_counter() - t0

    def sweep_tiny():
        t0 = time.perf_counter()
        r = None
        for _ in range(N_CHUNKS):
            r = f_tiny(tiny)
        float(jax.device_get(r))
        return time.perf_counter() - t0

    def sweep_raw_n(n):
        nonlocal h
        t0 = time.perf_counter()
        for pd in pds[:n]:
            h = D._render_full_jit(pd, bsp, uep, cfg, h)
        float(jax.device_get(h[-1, 0, -1, -1]))
        return time.perf_counter() - t0

    # interleaved repeats
    res = {"S0 tiny": [], "S1 raw": [], "S2 product": [],
           "S3 raw n=1": [], "S3 raw n=4": []}
    for rep in range(3):
        res["S0 tiny"].append(sweep_tiny())
        res["S1 raw"].append(sweep_raw())
        res["S2 product"].append(sweep_product())
        res["S3 raw n=1"].append(sweep_raw_n(1))
        res["S3 raw n=4"].append(sweep_raw_n(4))
        log(f"rep {rep} done")

    log(f"relay rt {t_rt*1e3:.2f} ms")
    for k, v in res.items():
        samples = " ".join(f"{x*1e3:8.1f}" for x in v)
        best = min(v)
        n = {"S3 raw n=1": 1, "S3 raw n=4": 4}.get(k, N_CHUNKS)
        per = (best - t_rt) / n * 1e3
        ups = n * CHUNK / max(best - t_rt, 1e-9) / 1e6
        log(f"{k:12s} samples[ms]: {samples}  min {best*1e3:8.1f}"
            f"  per-chunk {per:7.2f} ms  ({ups:5.2f} M users/s)")

    # dispatch-cost slope from S3: (t12 - t1)/11 vs kernel-only time
    t1 = min(res["S3 raw n=1"]); t4 = min(res["S3 raw n=4"])
    t12 = min(res["S1 raw"])
    log(f"slope (n=4..12): {(t12-t4)/8*1e3:.2f} ms/dispatch; "
        f"(n=1..12): {(t12-t1)/11*1e3:.2f} ms/dispatch")
    log("done")


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()

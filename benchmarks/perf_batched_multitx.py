"""Multi-TX batched render vs per-child loop, slope-timed A/B.

MacroDataset.compute_channels_batched concatenates the children on the
user axis and renders ONE dispatch (the reference runs a full generator
pass per (tx, rx) pair). Measures both product routes on 4 children x
32k users; writes benchmarks/batched_multitx.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
     benchmarks/perf_batched_multitx.py > /tmp/btx.log 2>&1
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import deepmimo_tpu as dm
from deepmimo_tpu import consts as c
from deepmimo_tpu.generator.dataset import MacroDataset
from bench import make_data

N_CHILD, U, P, N_K, N = 4, 16_384, 25, 64, 6   # both routes' outputs live together: stay well under HBM
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "batched_multitx.json")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    log(f"devices: {jax.devices()}")
    children = []
    for i in range(N_CHILD):
        d = make_data(U, P, seed=20 + i)
        d["rx_pos"] = np.zeros((U, 3), np.float32)
        d["tx_pos"] = np.zeros((1, 3), np.float32)
        children.append(dm.Dataset(d))
    macro = MacroDataset(children)

    params = dm.ChannelGenParameters()
    params[c.PARAMSET_ANT_BS][c.PARAMSET_ANT_SHAPE] = np.array([8, 8])
    params[c.PARAMSET_OFDM][c.PARAMSET_OFDM_SC_SAMP] = np.arange(N_K)
    params[c.PARAMSET_NUM_PATHS] = P

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt {t_rt*1e3:.2f} ms")

    log("compiling batched (one dispatch for all children)...")
    hb = macro.compute_channels_batched(params, to_device=True)
    float(jax.device_get(jnp.ravel(hb)[-1]))
    log("compiling per-child route...")
    hs = [ds.compute_channels(params, to_device=True) for ds in children]
    float(jax.device_get(jnp.ravel(hs[-1])[-1]))
    log("warm; measuring (interleaved, 3 reps)")

    total = N_CHILD * U
    res = {"batched_one_dispatch": [], "per_child_dispatches": []}
    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            hb = macro.compute_channels_batched(params, to_device=True,
                                                out=hb)
        float(jax.device_get(jnp.ravel(hb)[-1]))
        res["batched_one_dispatch"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        for _ in range(N):
            hs = [ds.compute_channels(params, to_device=True, out=h0)
                  for ds, h0 in zip(children, hs)]
        float(jax.device_get(jnp.ravel(hs[-1])[-1]))
        res["per_child_dispatches"].append(time.perf_counter() - t0)
        log(f"rep {rep} done")

    out = {"workload": f"{N_CHILD} TX x {U} users x {P} paths, 64-ant "
                       f"BS, {N_K} sc, {N}-sweep slope",
           "relay_rt_ms": round(t_rt * 1e3, 2)}
    for k, v in res.items():
        best = (min(v) - t_rt) / N
        out[k] = {"per_sweep_ms": round(best * 1e3, 2),
                  "users_per_s": round(total / best, 1)}
        log(f"{k:22s} {best*1e3:7.2f} ms/sweep "
            f"({total/best/1e6:5.2f} M users/s)")
    ratio = (out["batched_one_dispatch"]["users_per_s"] /
             out["per_child_dispatches"]["users_per_s"])
    out["batched_vs_per_child"] = round(ratio, 2)
    log(f"batched vs per-child: {ratio:.2f}x")
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()

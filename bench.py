"""Benchmark: users/s channel generation on TPU vs the reference CPU stack.

Workload (BASELINE.json): asu_campus-scale synthetic scenario — 131,931 users
x 25 paths, 64-antenna BS UPA, OFDM (512-FFT, 64 selected subcarriers),
isotropic patterns — the "64-ant OFDM" headline config.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "users/s", "vs_baseline": N}

Timing methodology: on this runtime block_until_ready can return before
execution completes (relay semantics), so sweeps are synced by reading an
element of the LAST block's output — stream ordering proves all prior
blocks finished — and the measured relay round-trip is subtracted once.

The reference baseline (users/s of jmoraispk/DeepMIMO's generator on the same
data, same machine, CPU) is measured once on a subsample and cached in
benchmarks/baseline_reference.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "benchmarks", "baseline_reference.json")

N_UE = 131_931          # asu_campus grid 411 x 321
MAX_PATHS = 25
BS_SHAPE = (8, 8)       # 64-antenna UPA
UE_SHAPE = (1, 1)
N_FFT = 512
SEL_SC = tuple(range(64))
BANDWIDTH = 10e6
USER_BLOCK = 16_384
BASELINE_SAMPLE = 384   # users timed through the reference CPU generator


def make_data(n_ue, max_paths, seed=7):
    """Synthetic NaN-padded path matrices (vectorized; fast at 131k users)."""
    rng = np.random.RandomState(seed)
    n_valid = rng.randint(1, max_paths + 1, size=n_ue)
    mask = np.arange(max_paths)[None, :] < n_valid[:, None]

    def mat(lo, hi):
        a = rng.uniform(lo, hi, (n_ue, max_paths))
        return np.where(mask, a, np.nan)

    return {
        "power": mat(-130, -60), "phase": mat(-180, 180),
        "delay": mat(1e-7, 4e-6),
        "aoa_az": mat(-180, 180), "aoa_el": mat(0, 180),
        "aod_az": mat(-180, 180), "aod_el": mat(0, 180),
    }


def bench_tpu(data):
    import jax
    import jax.numpy as jnp
    from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
    from deepmimo_tpu.ops.channel import render_channels_planes

    cfg = ChannelConfig(bs_shape=BS_SHAPE, ue_shape=UE_SHAPE,
                        freq_domain=True, subcarriers=N_FFT,
                        selected_subcarriers=SEL_SC, bandwidth=BANDWIDTH,
                        num_paths=MAX_PATHS, dtype="complex64",
                        backend="fused")
    bs = AntennaPanel.make()
    ue = AntennaPanel.make()

    paths = PathData.from_numpy(**{k: data[k] for k in
                                   ("power", "phase", "delay", "aoa_az",
                                    "aoa_el", "aod_az", "aod_el")},
                                dtype=jnp.float32)

    n_ue = paths.n_ue
    n_blocks = n_ue // USER_BLOCK
    n_timed = n_blocks * USER_BLOCK

    # Serving pattern: channels land in HBM as float32 real/imag planes
    # (skips the complexification pass; consumers view them for free).
    # User-block slicing happens INSIDE the jitted call: eager slice_users
    # dispatches 9 small device ops per block, which costs ~5 ms/block
    # through this runtime's dispatch path.
    render = jax.jit(
        lambda p, b, u, i: render_channels_planes(
            p.slice_users(i, USER_BLOCK), b, u, cfg))

    dev_paths = jax.device_put(paths)

    # Relay round-trip floor (tiny op + scalar readback). On this runtime
    # block_until_ready can return before execution finishes, so the only
    # honest sync is a data readback; its latency is measured and
    # subtracted once per sweep.
    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))  # warm
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))

    # Warm-up compile + result sanity
    out0 = render(dev_paths, bs, ue, 0)
    assert np.isfinite(float(jax.device_get(out0[0, 0, 0, 0, 0])))

    def sweep():
        outs = [render(dev_paths, bs, ue, i * USER_BLOCK)
                for i in range(n_blocks)]
        # Device executions on one stream are ordered: reading an element
        # of the LAST output proves every block render completed with its
        # H tile in HBM.
        float(jax.device_get(outs[-1][1, -1, 0, -1, -1]))

    best = min(_timed(sweep) for _ in range(3))
    dt = max(best - t_rt, 1e-9)

    dev = jax.devices()[0]
    return n_timed / dt, dt, t_rt, n_timed, str(dev)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench_reference(data, n_sample):
    """Time the reference CPU generator on a subsample; returns users/s."""
    sys.path.insert(0, "/root/reference")
    import importlib
    for mod in list(sys.modules):
        if mod == "deepmimo" or mod.startswith("deepmimo."):
            del sys.modules[mod]
    deepmimo = importlib.import_module("deepmimo")
    from deepmimo.generator.dataset import Dataset as RefDataset
    from deepmimo.generator.channel import ChannelGenParameters as RefParams

    sub = {k: np.asarray(v[:n_sample], dtype=np.float32)
           for k, v in data.items()}
    ds = RefDataset({
        "power": sub["power"], "phase": sub["phase"], "delay": sub["delay"],
        "aoa_az": sub["aoa_az"], "aoa_el": sub["aoa_el"],
        "aod_az": sub["aod_az"], "aod_el": sub["aod_el"],
        "rx_pos": np.zeros((n_sample, 3), dtype=np.float32),
        "tx_pos": np.zeros((1, 3), dtype=np.float32),
    })
    params = RefParams()
    params["bs_antenna"]["shape"] = np.array(BS_SHAPE)
    params["ue_antenna"]["shape"] = np.array(UE_SHAPE)
    params["ofdm"]["subcarriers"] = N_FFT
    params["ofdm"]["selected_subcarriers"] = np.array(SEL_SC)
    params["ofdm"]["bandwidth"] = BANDWIDTH
    params["num_paths"] = MAX_PATHS

    t0 = time.perf_counter()
    ds.compute_channels(params)
    dt = time.perf_counter() - t0
    return n_sample / dt


def get_baseline(data):
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["users_per_s"]
    try:
        ups = bench_reference(data, BASELINE_SAMPLE)
    except Exception as e:
        print(f"# baseline measurement failed: {e}", file=sys.stderr)
        return None
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"users_per_s": ups, "sample": BASELINE_SAMPLE,
                   "config": "64-ant OFDM, 64 subcarriers, 25 paths",
                   "source": "jmoraispk/DeepMIMO v4.0.0a3 CPU"}, f, indent=2)
    return ups


def main():
    data = make_data(N_UE, MAX_PATHS)
    baseline = get_baseline(data)
    users_per_s, dt, t_rt, n_timed, dev = bench_tpu(data)
    print(f"# device={dev} timed_users={n_timed} device_wall={dt:.4f}s "
          f"relay_rt={t_rt*1e3:.1f}ms "
          f"baseline={baseline if baseline else 'n/a'} users/s",
          file=sys.stderr)
    result = {
        "metric": "users/s channel generation "
                  "(131k users, 64-ant OFDM, 64 subcarriers, 25 paths)",
        "value": round(users_per_s, 1),
        "unit": "users/s",
        "vs_baseline": round(users_per_s / baseline, 2) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

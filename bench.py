"""Benchmark: users/s channel generation on TPU vs the reference CPU stack.

Workload (BASELINE.json): asu_campus-scale synthetic scenario — 131,931 users
x 25 paths, 64-antenna BS UPA, OFDM (512-FFT, 64 selected subcarriers),
isotropic patterns — the "64-ant OFDM" headline config.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "users/s", "vs_baseline": N}

Timing methodology: the whole job (12 chunks x 131,072 distinct users,
rendered by a lax.fori_loop inside ONE jitted program — per-dispatch
overhead through the relay is several ms) is synced by reading an element
of the final H buffer; stream ordering proves all chunks finished. The
measured relay round-trip is subtracted once. The H buffer is a donated
loop carry: one 4.3 GB output lives at a time.

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

CHUNK = 131_072         # ~asu_campus grid (411 x 321 = 131,931)
N_CHUNKS = 12
N_UE = CHUNK * N_CHUNKS  # total distinct users rendered per sweep
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

    # Packed plane layout [U, R, T, 2K]: hr in the first minor half. The
    # 128-lane-aligned minor dim is ~8x output-DMA bandwidth vs a K=64
    # minor (benchmarks/perf_layout.py), and chunks render inside one
    # jitted fori_loop (round 1's eager 8-block loop left the chip >90%
    # idle on dispatch).
    cfg = ChannelConfig(bs_shape=BS_SHAPE, ue_shape=UE_SHAPE,
                        freq_domain=True, subcarriers=N_FFT,
                        selected_subcarriers=SEL_SC, bandwidth=BANDWIDTH,
                        num_paths=MAX_PATHS, dtype="complex64",
                        backend="fused", planes_layout="packed")
    bs = AntennaPanel.make()
    ue = AntennaPanel.make()

    paths = PathData.from_numpy(**{k: data[k] for k in
                                   ("power", "phase", "delay", "aoa_az",
                                    "aoa_el", "aod_az", "aod_el")},
                                dtype=jnp.float32)
    dev_paths = jax.device_put(paths)

    def render_job(p, b, u, h0):
        def body(i, h):
            pc = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(
                    x, i * CHUNK, CHUNK, axis=0), p)
            return render_channels_planes(pc, b, u, cfg)
        return jax.lax.fori_loop(0, N_CHUNKS, body, h0)

    render = jax.jit(render_job, donate_argnums=(3,))

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
    h = jnp.zeros((CHUNK, 1, 64, 128), jnp.float32)
    h = render(dev_paths, bs, ue, h)
    assert np.isfinite(float(jax.device_get(h[0, 0, 0, 0])))
    assert h.shape == (CHUNK, 1, 64, 128)

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        h = render(dev_paths, bs, ue, h)
        float(jax.device_get(h[-1, 0, -1, -1]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    dt = max(best - t_rt, 1e-9)

    dev = jax.devices()[0]
    return N_UE / dt, dt, t_rt, N_UE, str(dev)


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

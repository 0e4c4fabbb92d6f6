"""Decompose relay latency vs device compute; truthful users/s across sizes.

block_until_ready returns early through the axon relay, so the only honest
sync is a data readback. Wall = relay_round_trip + device_time; measuring a
trivial readback gives the round trip, and size scaling isolates compute.
"""

import sys, os, time, gc
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
from deepmimo_tpu.ops.channel import render_channels_planes

P = 25


def make_paths(n_ue, seed=7):
    rng = np.random.RandomState(seed)
    mk = lambda lo, hi: rng.uniform(lo, hi, (n_ue, P))
    return PathData.from_numpy(
        power=mk(-130, -60), phase=mk(-180, 180), delay=mk(1e-7, 4e-6),
        aoa_az=mk(-180, 180), aoa_el=mk(0, 180),
        aod_az=mk(-180, 180), aod_el=mk(0, 180), dtype=jnp.float32)


def min_time(fn, n=5):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    # Relay round-trip floor: tiny jit + scalar readback
    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    t_rt = min_time(lambda: float(jax.device_get(f_tiny(tiny))))
    print(f"relay round-trip (tiny op + scalar readback): "
          f"{t_rt*1e3:.2f} ms", flush=True)

    bs, ue = AntennaPanel.make(), AntennaPanel.make()
    for n_ue in (4096, 16384, 65536):
        cfg = ChannelConfig(bs_shape=(8, 8), ue_shape=(1, 1),
                            freq_domain=True, subcarriers=512,
                            selected_subcarriers=tuple(range(64)),
                            num_paths=P, dtype="complex64")
        paths = jax.device_put(make_paths(n_ue))
        render = jax.jit(render_channels_planes, static_argnames=("cfg",))

        def step():
            o = render(paths, bs, ue, cfg)
            # force completion: read one element of the LAST-written tile
            v = float(jax.device_get(o[1, -1, 0, -1, -1]))
            return v

        t = min_time(step)
        dev_t = max(t - t_rt, 1e-9)
        out_gb = n_ue * 64 * 64 * 8 / 1e9
        print(f"U={n_ue:6d}: wall={t*1e3:8.2f} ms  minus-rt="
              f"{dev_t*1e3:8.2f} ms  -> {n_ue/dev_t/1e6:6.2f} M users/s  "
              f"({out_gb/dev_t:5.0f} GB/s effective)", flush=True)
        del paths
        gc.collect()


if __name__ == "__main__":
    main()

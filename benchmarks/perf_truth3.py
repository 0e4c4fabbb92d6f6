"""One-process truthful measurement: init, RTT, per-size renders, bench sweep."""

import sys, os, time, gc
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

t_start = time.time()
def log(*a):
    print(f"[{time.time()-t_start:7.1f}s]", *a, flush=True)

x = (jnp.ones((8, 8)) * 2).sum()
log("device init done:", float(x))

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
    return min((lambda t0=time.perf_counter(): (fn(), time.perf_counter()-t0)[1])()
               for _ in range(n))


tiny = jnp.ones((8, 128))
f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
float(jax.device_get(f_tiny(tiny)))
t_rt = min_time(lambda: float(jax.device_get(f_tiny(tiny))))
log(f"relay round trip: {t_rt*1e3:.2f} ms")

bs, ue = AntennaPanel.make(), AntennaPanel.make()
cfg = ChannelConfig(bs_shape=(8, 8), ue_shape=(1, 1), freq_domain=True,
                    subcarriers=512, selected_subcarriers=tuple(range(64)),
                    num_paths=P, dtype="complex64")
render = jax.jit(render_channels_planes, static_argnames=("cfg",))

for n_ue in (4096, 16384, 65536):
    paths = jax.device_put(make_paths(n_ue))

    def step():
        o = render(paths, bs, ue, cfg)
        float(jax.device_get(o[1, -1, 0, -1, -1]))

    t = min_time(step)
    dev_t = max(t - t_rt, 1e-9)
    out_gb = n_ue * 64 * 64 * 8 / 1e9
    log(f"U={n_ue:6d}: wall={t*1e3:8.2f} ms  minus-rt={dev_t*1e3:8.2f} ms"
        f"  -> {n_ue/dev_t/1e6:7.3f} M users/s ({out_gb/dev_t:6.0f} GB/s)")
    del paths
    gc.collect()

# Multi-block sweep like bench.py: 8 x 16384 with one final readback
paths = jax.device_put(make_paths(131072))
def sweep():
    outs = [render(paths.slice_users(i * 16384, 16384), bs, ue, cfg)
            for i in range(8)]
    float(jax.device_get(outs[-1][1, -1, 0, -1, -1]))

t = min_time(sweep, n=3)
dev_t = max(t - t_rt, 1e-9)
log(f"sweep 8x16384: wall={t*1e3:.2f} ms -> "
    f"{131072/dev_t/1e6:.3f} M users/s")
log("DONE")

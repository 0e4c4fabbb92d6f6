"""Dispatch-granularity sweep: 8x16384 blocks vs fewer, larger dispatches."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

t_start = time.time()
def log(*a):
    print(f"[{time.time()-t_start:7.1f}s]", *a, flush=True)

x = (jnp.ones((8, 8)) * 2).sum()
log("device init:", float(x))

from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
from deepmimo_tpu.ops.channel import render_channels_planes

P, N_UE = 25, 131072
rng = np.random.RandomState(7)
mk = lambda lo, hi: rng.uniform(lo, hi, (N_UE, P))
paths = PathData.from_numpy(
    power=mk(-130, -60), phase=mk(-180, 180), delay=mk(1e-7, 4e-6),
    aoa_az=mk(-180, 180), aoa_el=mk(0, 180),
    aod_az=mk(-180, 180), aod_el=mk(0, 180), dtype=jnp.float32)
paths = jax.device_put(paths)
bs, ue = AntennaPanel.make(), AntennaPanel.make()
cfg = ChannelConfig(bs_shape=(8, 8), ue_shape=(1, 1), freq_domain=True,
                    subcarriers=512, selected_subcarriers=tuple(range(64)),
                    bandwidth=10e6, num_paths=P, dtype="complex64",
                    backend="fused")

tiny = jnp.ones((8, 128))
f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
float(jax.device_get(f_tiny(tiny)))
t_rt = min((lambda t0=time.perf_counter(): (float(jax.device_get(f_tiny(tiny))), time.perf_counter()-t0)[1])() for _ in range(5))
log(f"relay rt {t_rt*1e3:.1f} ms")

def min_time(fn, n=3):
    fn()
    return min((lambda t0=time.perf_counter(): (fn(), time.perf_counter()-t0)[1])() for _ in range(n))

render = jax.jit(lambda p, b, u, i, n: render_channels_planes(
    p.slice_users(i, n), b, u, cfg), static_argnums=(4,))

for blk in (16384, 131072):
    nb = N_UE // blk
    def sweep():
        outs = [render(paths, bs, ue, i * blk, blk) for i in range(nb)]
        # Sync on ALL outputs: single-stream ordering makes the last block
        # sufficient on one device, but on any multi-device/async layout
        # earlier blocks could still be in flight (advisor round 1).
        jax.block_until_ready(outs)
        float(jax.device_get(outs[-1][1, -1, 0, -1, -1]))
    t = min_time(sweep)
    dev = max(t - t_rt, 1e-9)
    log(f"blk={blk:6d} x{nb}: wall={t*1e3:8.2f} ms  minus-rt={dev*1e3:8.2f} ms  -> {N_UE/dev/1e6:6.3f} M users/s")
log("DONE")

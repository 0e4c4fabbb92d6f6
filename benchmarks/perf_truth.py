"""Ground-truth timing: force completion via scalar readback.

If block_until_ready returns early through the relay, wall times are
underestimated. This measures the full-sweep render with three sync
methods: block_until_ready, scalar-reduce readback, and per-element spot
readback, at two sizes — the discrepancy (if any) calibrates every other
benchmark number.
"""

import sys, os, time
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


def run(n_ue, k):
    cfg = ChannelConfig(bs_shape=(8, 8), ue_shape=(1, 1), freq_domain=True,
                        subcarriers=512,
                        selected_subcarriers=tuple(range(k)),
                        num_paths=P, dtype="complex64")
    bs, ue = AntennaPanel.make(), AntennaPanel.make()
    paths = jax.device_put(make_paths(n_ue))

    render = jax.jit(render_channels_planes, static_argnames=("cfg",))
    reduce_out = jax.jit(lambda p, b, u: jnp.sum(
        render_channels_planes(p, b, u, cfg)[0, :, 0, 0, 0]))

    out = render(paths, bs, ue, cfg)
    jax.block_until_ready(out)
    s = reduce_out(paths, bs, ue)
    jax.block_until_ready(s)

    out_bytes = n_ue * 64 * k * 8  # planes f32 x2 = complex64 bytes

    # Method A: block_until_ready on the big output
    tA = min_time(lambda: jax.block_until_ready(render(paths, bs, ue, cfg)))
    # Method B: fused scalar reduction (no big output materialized? it IS
    # materialized only if XLA keeps it; the reduce version may DCE the
    # full output, so this bounds compute, not writeback)
    tB = min_time(lambda: float(jax.device_get(reduce_out(paths, bs, ue))))
    # Method C: render + spot readback of a few elements (forces the
    # full output buffer to exist and the stream to drain)
    def method_c():
        o = render(paths, bs, ue, cfg)
        return float(jax.device_get(o[0, -1, 0, -1, -1]))
    tC = min_time(method_c)

    print(f"U={n_ue:7d} K={k:3d} out={out_bytes/1e9:6.2f} GB | "
          f"A block_until_ready {tA*1e3:8.2f} ms ({out_bytes/tA/1e9:7.0f} "
          f"GB/s) | B reduce {tB*1e3:8.2f} ms | C spot-read "
          f"{tC*1e3:8.2f} ms ({out_bytes/tC/1e9:7.0f} GB/s)", flush=True)


def min_time(fn, n=5):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    for n_ue, k in ((16384, 64), (131072, 64)):
        run(n_ue, k)

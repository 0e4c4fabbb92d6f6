"""One-process perf exploration for the headline config.

Measures (readback-synced, relay RTT subtracted):
  1. HBM copy roofline for an H-sized planes array
  2. render_channels_planes at several user-block sizes
  3. bfloat16 matmul variant
  4. pallas path-sum backend

Run: timeout 570 python benchmarks/perf_explore.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

t_start = time.time()


def log(*a):
    print(f"[{time.time()-t_start:7.1f}s]", *a, flush=True)


from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
from deepmimo_tpu.ops.channel import render_channels_planes

N_UE = 131_072
P = 25
BS = (8, 8)
K = tuple(range(64))


def make_paths(n_ue, seed=7):
    rng = np.random.RandomState(seed)
    n_valid = rng.randint(1, P + 1, size=n_ue)
    mask = np.arange(P)[None, :] < n_valid[:, None]
    mk = lambda lo, hi: np.where(mask, rng.uniform(lo, hi, (n_ue, P)), np.nan)
    return PathData.from_numpy(
        power=mk(-130, -60), phase=mk(-180, 180), delay=mk(1e-7, 4e-6),
        aoa_az=mk(-180, 180), aoa_el=mk(0, 180),
        aod_az=mk(-180, 180), aod_el=mk(0, 180), dtype=jnp.float32)


def cfg_for(backend="xla", matmul_dtype="float32"):
    return ChannelConfig(bs_shape=BS, ue_shape=(1, 1), freq_domain=True,
                         subcarriers=512, selected_subcarriers=K,
                         bandwidth=10e6, num_paths=P, dtype="complex64",
                         backend=backend, matmul_dtype=matmul_dtype)


def main():
    dev = jax.devices()[0]
    log("device:", dev)

    # RTT
    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay RTT: {t_rt*1e3:.1f} ms")

    # 1. HBM copy roofline: H planes for 64k users = 2*64k*64*64 f32
    h = jnp.ones((2, 65536, 1, 64, 64), jnp.float32)
    cp = jax.jit(lambda x: x * 1.00001)
    sync = lambda o: float(jax.device_get(o.ravel()[-1]))
    sync(cp(h))
    dt = min(_t(lambda: sync(cp(h))) for _ in range(3)) - t_rt
    nbytes = 2 * h.size * 4
    log(f"HBM copy {nbytes/1e6:.0f} MB r+w: {dt*1e3:.2f} ms -> "
        f"{nbytes/dt/1e9:.0f} GB/s")

    paths = jax.device_put(make_paths(N_UE))

    def bench(tag, cfg, block):
        render = jax.jit(render_channels_planes, static_argnames=("cfg",))
        n_blocks = N_UE // block
        out0 = render(paths.slice_users(0, block), bs, ue, cfg)
        sync(out0)

        def sweep():
            outs = [render(paths.slice_users(i * block, block), bs, ue, cfg)
                    for i in range(n_blocks)]
            sync(outs[-1])

        best = min(_t(sweep) for _ in range(3)) - t_rt
        log(f"{tag:34s} block={block:6d} x{n_blocks}: {best*1e3:8.2f} ms  "
            f"{N_UE/best/1e3:9.1f} k users/s")
        return out0

    bs = AntennaPanel.make()
    ue = AntennaPanel.make()

    ref_out = None
    for block in (16384, 32768, 65536):
        o = bench("planes f32 (xla)", cfg_for(), block)
        if block == 16384:
            ref_out = np.array(jax.device_get(o[:, :4096]), np.float64)

    o = bench("planes bf16 matmul", cfg_for(matmul_dtype="bfloat16"), 65536)
    d = np.abs(np.array(jax.device_get(o[:, :4096]), np.float64) - ref_out)
    log(f"  bf16 rel err: {d.max()/np.abs(ref_out).max():.2e}")

    # Pallas backend lives on the complex render path; planes-ify output
    try:
        from deepmimo_tpu.ops.channel import render_channels
        cfgp = cfg_for(backend="pallas")
        renderp = jax.jit(
            lambda p, b, u: (lambda h: jnp.stack((jnp.real(h),
                                                  jnp.imag(h))))(
                render_channels(p, b, u, cfgp)))
        block = 16384
        n_blocks = N_UE // block
        o = renderp(paths.slice_users(0, block), bs, ue)
        sync(o)

        def sweepp():
            outs = [renderp(paths.slice_users(i * block, block), bs, ue)
                    for i in range(n_blocks)]
            sync(outs[-1])

        best = min(_t(sweepp) for _ in range(3)) - t_rt
        log(f"{'pallas path-sum':34s} block={block:6d} x{n_blocks}: "
            f"{best*1e3:8.2f} ms  {N_UE/best/1e3:9.1f} k users/s")
        d = np.abs(np.array(jax.device_get(o[:, :4096]), np.float64) - ref_out)
        log(f"  pallas rel err: {d.max()/np.abs(ref_out).max():.2e}")
    except Exception as e:
        log(f"pallas failed: {type(e).__name__}: {str(e)[:200]}")


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()

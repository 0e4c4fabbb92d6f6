"""XLA planes path, chunked INSIDE one jit via lax.map: H written by XLA.

Pallas output DMA caps at ~170 GB/s on this stack while XLA writes at
~574 GB/s (benchmarks/perf_membw.py). The XLA planes path materializes
E/g intermediates (~26 KB/user extra traffic) but writes H at full
bandwidth; chunking with lax.map keeps peak memory bounded (the one-call
XLA render OOMed at 131k users). Total traffic ~83 KB/user -> ~15 ms
predicted vs the 26 ms Pallas write floor.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python -u benchmarks/perf_xla_chunked.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_UE = 131_072
MAX_PATHS = 25
BS_SHAPE = (8, 8)
UE_SHAPE = (1, 1)
N_FFT = 512
SEL_SC = tuple(range(64))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
    from deepmimo_tpu.ops.channel import render_channels_planes

    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(7)
    n_valid = rng.randint(1, MAX_PATHS + 1, size=N_UE)
    mask = np.arange(MAX_PATHS)[None, :] < n_valid[:, None]
    mat = lambda lo, hi: np.where(
        mask, rng.uniform(lo, hi, (N_UE, MAX_PATHS)), np.nan)
    paths = PathData.from_numpy(
        power=mat(-130, -60), phase=mat(-180, 180), delay=mat(1e-7, 4e-6),
        aoa_az=mat(-180, 180), aoa_el=mat(0, 180),
        aod_az=mat(-180, 180), aod_el=mat(0, 180), dtype=jnp.float32)
    dev_paths = jax.device_put(paths)
    bs = AntennaPanel.make()
    ue = AntennaPanel.make()
    log("data on device")

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda t: jnp.sum(t * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt = {t_rt*1e3:.2f} ms")

    def bench(name, fn, n=3):
        out = fn(dev_paths, bs, ue)
        assert np.isfinite(float(jax.device_get(out[0, 0, 0, 0, 0])))
        del out
        def sweep():
            o = fn(dev_paths, bs, ue)
            float(jax.device_get(o[1, -1, 0, -1, -1]))
        best = min(_timed(sweep) for _ in range(n))
        dt = max(best - t_rt, 1e-9)
        log(f"{name:28s} dev={dt*1e3:8.2f} ms  -> {N_UE/dt/1e6:6.2f} M users/s")

    for backend, chunks in (("xla", 4), ("xla", 8), ("xla", 16),
                            ("fused", 4)):
        cfg = ChannelConfig(bs_shape=BS_SHAPE, ue_shape=UE_SHAPE,
                            freq_domain=True, subcarriers=N_FFT,
                            selected_subcarriers=SEL_SC, bandwidth=10e6,
                            num_paths=MAX_PATHS, dtype="complex64",
                            backend=backend)

        def render_mapped(p, b, u, cfg=cfg, chunks=chunks):
            chunk = N_UE // chunks

            def body(pc):
                o = render_channels_planes(pc, b, u, cfg)
                return o[0], o[1]   # stack+slice fuses away inside the body

            p_r = jax.tree_util.tree_map(
                lambda x: x.reshape((chunks, chunk) + x.shape[1:]), p)
            hr, hi = jax.lax.map(body, p_r)
            # [chunks, chunk, R, T, K] -> [U, R, T, K]: contiguous, free
            return (hr.reshape((N_UE,) + hr.shape[2:]),
                    hi.reshape((N_UE,) + hi.shape[2:]))

        fn = jax.jit(render_mapped)

        def wrapped(p, b, u, fn=fn):
            return fn(p, b, u)

        try:
            out = wrapped(dev_paths, bs, ue)
            assert np.isfinite(float(jax.device_get(out[0][0, 0, 0, 0])))
            del out
            def sweep(wrapped=wrapped):
                o = wrapped(dev_paths, bs, ue)
                float(jax.device_get(o[1][-1, 0, -1, -1]))
            best = min(_timed(sweep) for _ in range(3))
            dt = max(best - t_rt, 1e-9)
            log(f"{backend} lax.map x{chunks:<3d}        "
                f"dev={dt*1e3:8.2f} ms  -> {N_UE/dt/1e6:6.2f} M users/s")
        except Exception as e:
            log(f"{backend} x{chunks} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:110]}")
    log("DONE")


if __name__ == "__main__":
    main()

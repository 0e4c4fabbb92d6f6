"""Round-2 experiment: render the full headline workload in ONE device program.

Round 1's bench dispatched 8 x 16,384-user blocks; at ~5-10 ms dispatch
through the axon relay the chip sat >90% idle (VERDICT weak #1). This
measures the 131,072-user x 64-ant x 64-sc workload as:

  B. one-call  — one jitted render_channels_planes over all users (fused)
  C. one-call, bf16 matmul inputs
  D. prologue-only (angles/powers, no path-sum) — isolates kernel cost
  E. one-call, XLA planes backend (fusion comparison)

plus the relay round-trip floor. Findings that shaped the code: the fused
kernel now writes ONE stacked [2, U, Q, K] buffer (separate hr/hi planes +
jnp.stack doubled peak memory to ~8.6 GB and OOMed the chip); warm-up
outputs must likewise be freed before re-rendering.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python -u benchmarks/perf_onecall.py
"""

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
BANDWIDTH = 10e6


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_data(n_ue, max_paths, seed=7):
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

    cfg = ChannelConfig(bs_shape=BS_SHAPE, ue_shape=UE_SHAPE,
                        freq_domain=True, subcarriers=N_FFT,
                        selected_subcarriers=SEL_SC, bandwidth=BANDWIDTH,
                        num_paths=MAX_PATHS, dtype="complex64",
                        backend="fused")
    bs = AntennaPanel.make()
    ue = AntennaPanel.make()

    data = make_data(N_UE, MAX_PATHS)
    paths = PathData.from_numpy(**{k: data[k] for k in
                                   ("power", "phase", "delay", "aoa_az",
                                    "aoa_el", "aod_az", "aod_el")},
                                dtype=jnp.float32)
    dev_paths = jax.device_put(paths)
    log("data on device")

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt = {t_rt*1e3:.2f} ms")

    def timeit(name, fn, n=3):
        best = min(_timed(fn) for _ in range(n))
        dt = max(best - t_rt, 1e-9)
        log(f"{name:28s} wall={best*1e3:8.2f} ms  dev={dt*1e3:8.2f} ms  "
            f"-> {N_UE/dt/1e6:7.2f} M users/s")
        return dt

    def one_call(name, render):
        """Compile, free the warm-up output, then time repeated renders."""
        out = render(dev_paths, bs, ue)
        assert np.isfinite(float(jax.device_get(out[0, 0, 0, 0, 0])))
        shape = out.shape
        del out      # 4.3 GB: must be freed before the timed re-render
        log(f"{name} compiled, out shape {shape}")

        def sweep():
            out = render(dev_paths, bs, ue)
            float(jax.device_get(out[1, -1, 0, -1, -1]))
        timeit(name, sweep)

    def guarded(name, fn):
        try:
            fn()
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {e}")

    guarded("B", lambda: one_call(
        "B one-call fused",
        jax.jit(lambda p, b, u: render_channels_planes(p, b, u, cfg))))

    cfg_bf = cfg.replace(matmul_dtype="bfloat16")
    guarded("C", lambda: one_call(
        "C one-call bf16",
        jax.jit(lambda p, b, u: render_channels_planes(p, b, u, cfg_bf))))

    # --- D. prologue only (no path sum): angle rotation + powers ---
    from deepmimo_tpu.ops.channel import (_rotated_angles, _powers_linear,
                                          _fov_valid)

    @jax.jit
    def prologue(p, b, u):
        aod_t, aod_p, aoa_t, aoa_p = _rotated_angles(p, b, u)
        valid = _fov_valid(cfg, p.valid, aod_t, aod_p, aoa_t, aoa_p)
        pw = _powers_linear(cfg, p, valid, aod_t, aod_p, aoa_t, aoa_p)
        return pw.sum()

    def run_d():
        float(jax.device_get(prologue(dev_paths, bs, ue)))
        timeit("D prologue only",
               lambda: float(jax.device_get(prologue(dev_paths, bs, ue))))
    guarded("D", run_d)

    cfg_xla = cfg.replace(backend="xla")
    guarded("E", lambda: one_call(
        "E one-call XLA planes",
        jax.jit(lambda p, b, u: render_channels_planes(p, b, u, cfg_xla))))

    out_bytes = 2 * N_UE * 64 * 64 * 4
    log(f"output traffic = {out_bytes/2**30:.2f} GiB; at 819 GB/s -> "
        f"{out_bytes/819e9*1e3:.2f} ms floor "
        f"({N_UE/(out_bytes/819e9)/1e6:.1f} M users/s ceiling)")


if __name__ == "__main__":
    main()

"""TPU compile-smoke gate: the product's dispatchable surface, on chip.

Round-3 postmortem: a kernel restructure landed with the default config
failing Mosaic AOT compile — CPU tests could never catch it because they
run the kernel in interpret mode. Round-4 postmortem: the gate was a
hand-enumerated list that silently trailed the product (bf16 output mode
and the P>64 legacy layout landed un-gated).

This gate DERIVES its variants from the product surface instead:
- every ChannelConfig below is dispatched through the PRODUCT entry
  points (`render_channels_planes`, `render_channels_planes_polar`,
  `render_beam_gains`, and the VJP via jax.grad through the planes
  renderer) — the exact jit the product traces;
- each spec declares what the product's own eligibility logic
  (`_fused_render_eligible` / `polar_fused_eligible` /
  `beam_gain_eligible`) must decide for it, and the gate FAILS if the
  decision drifts (a variant silently falling back to XLA is a gate
  failure, not a skip);
- the fused axes are covered as a cross product: P in {25, 80} (packed
  vs legacy lane layout) x planes layout {packed, stacked} x out_dtype
  {float32, bfloat16}, plus multi-antenna RX, Doppler snapshots,
  per-snapshot (dual-polar) amplitudes, the kernel_no_pack config flag,
  backward passes, beam gains, and the TD / LPF / complex XLA fallback
  paths (compile-checked on chip too).

Run before every snapshot commit touching ops/:
    PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python -u \
        benchmarks/tpu_smoke.py > /tmp/smoke.log 2>&1

Exit code 0 = every variant compiled, executed, and produced finite
output under its declared dispatch path.
"""

import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _paths(u, p, doppler=False, seed=0):
    import jax.numpy as jnp
    from deepmimo_tpu.ops.types import PathData

    rng = np.random.RandomState(seed)
    m = lambda lo, hi: rng.uniform(lo, hi, (u, p))
    power = m(-130, -60)
    power[:, p // 2:] = np.nan          # padded tail
    return PathData.from_numpy(
        power=power, phase=m(-180, 180), delay=m(1e-7, 2e-6),
        aoa_az=m(-180, 180), aoa_el=m(0, 180),
        aod_az=m(-180, 180), aod_el=m(0, 180),
        doppler_vel=m(-30, 30) if doppler else None,
        doppler_acc=m(-2, 2) if doppler else None, dtype=jnp.float32)


def build_variants():
    """(name, cfg, kind, expect_fused) covering the dispatch surface."""
    from deepmimo_tpu.ops.types import ChannelConfig

    def cfg(**kw):
        base = dict(bs_shape=(8, 8), ue_shape=(1, 1), freq_domain=True,
                    subcarriers=512, selected_subcarriers=tuple(range(64)),
                    bandwidth=10e6, num_paths=25, dtype="complex64",
                    backend="fused", planes_layout="packed")
        base.update(kw)
        return ChannelConfig(**base)

    vs = []
    # Fused forward: lane layout (P) x planes layout x output dtype
    for p, layout, odt in itertools.product(
            (25, 80), ("packed", "stacked"), ("float32", "bfloat16")):
        vs.append((f"fwd_p{p}_{layout}_{odt[:4]}",
                   cfg(num_paths=p, planes_layout=layout, out_dtype=odt),
                   "fwd", True))
    # Multi-antenna RX (panel outer product in-kernel)
    for p in (25, 80):
        vs.append((f"fwd_rx22_p{p}", cfg(num_paths=p, ue_shape=(2, 2)),
                   "fwd", True))
    # Doppler snapshot axis
    vs.append(("fwd_doppler4", cfg(enable_doppler=True,
                                   doppler_times=(0, 1e-3, 2e-3, 3e-3)),
               "fwd", True))
    vs.append(("fwd_doppler_rx_stacked",
               cfg(num_paths=10, ue_shape=(2, 2), bs_shape=(4, 4),
                   selected_subcarriers=tuple(range(32)),
                   planes_layout="stacked", enable_doppler=True,
                   doppler_times=(0, 1e-3, 2e-3)), "fwd", True))
    # kernel_no_pack config flag (legacy layout on a packable P)
    vs.append(("fwd_nopack_flag", cfg(kernel_no_pack=True), "fwd", True))
    # Backward (the custom-VJP Pallas kernel) per layout
    vs.append(("bwd_p25_packed", cfg(), "bwd", True))
    vs.append(("bwd_p25_stacked", cfg(planes_layout="stacked"), "bwd",
               True))
    vs.append(("bwd_p80_legacy", cfg(num_paths=80), "bwd", True))
    vs.append(("bwd_rx22", cfg(ue_shape=(2, 2)), "bwd", True))
    # Dual-polar single dispatch (per-snapshot amplitudes)
    vs.append(("polar_packed", cfg(), "polar", True))
    vs.append(("polar_stacked_doppler",
               cfg(planes_layout="stacked", enable_doppler=True,
                   doppler_times=(0, 1e-3)), "polar", True))
    # Beam-gain fused consumer
    vs.append(("beamgain_skiprx", cfg(), "beamgain", True))
    vs.append(("beamgain_rx21_doppler",
               cfg(ue_shape=(2, 1), enable_doppler=True,
                   doppler_times=(0, 1e-3)), "beamgain", True))
    vs.append(("beamgain_polar", cfg(), "beamgain_polar", True))
    # XLA fallback paths the product can also dispatch (compile on chip)
    vs.append(("xla_time_domain", cfg(freq_domain=False), "fwd", False))
    vs.append(("xla_lpf_rx_filter", cfg(rx_filter=True,
                                        selected_subcarriers=tuple(
                                            range(16))), "fwd", False))
    vs.append(("xla_nonarith_k",
               cfg(selected_subcarriers=(0, 3, 7, 50)), "fwd", False))
    return vs


def run_variants(tag=""):
    import jax
    import jax.numpy as jnp
    from deepmimo_tpu.ops.types import AntennaPanel
    from deepmimo_tpu.ops import channel as C

    backend = jax.default_backend()
    print(f"[smoke{tag}] backend={backend}", flush=True)
    failures = []
    rng = np.random.RandomState(1)
    for name, cfg, kind, expect_fused in build_variants():
        t0 = time.time()
        try:
            if kind in ("fwd", "bwd"):
                elig = C._fused_render_eligible(cfg) and cfg.freq_domain \
                    and bool(C._k_progression(cfg))
            elif kind == "polar":
                elig = C.polar_fused_eligible(cfg, 4)
            elif kind == "beamgain_polar":
                elig = C.beam_gain_eligible(cfg, 16)
            else:
                elig = C.beam_gain_eligible(cfg, 16)
            if bool(elig) != expect_fused:
                failures.append(
                    (name, f"eligibility drift: expected fused="
                           f"{expect_fused}, product decides {elig}"))
                print(f"[smoke{tag}] {name}: ELIGIBILITY-DRIFT",
                      flush=True)
                continue

            u = 256 if expect_fused else 64
            paths = _paths(u, cfg.num_paths, doppler=cfg.enable_doppler)
            bs = AntennaPanel.make((10.0, 0.0, 30.0))
            ue = AntennaPanel.make()

            if kind == "fwd":
                h = C.render_channels_planes(paths, bs, ue, cfg)
                ok = bool(jnp.isfinite(
                    h.astype(jnp.float32)).all()) if expect_fused else \
                    bool(jnp.isfinite(jnp.abs(h.astype(jnp.float32))
                                      ).all())
            elif kind == "bwd":
                def loss(spacing):
                    b2 = AntennaPanel(rotation_deg=bs.rotation_deg,
                                      spacing=spacing)
                    h = C.render_channels_planes(paths, b2, ue, cfg)
                    return jnp.sum(h.astype(jnp.float32) ** 2)
                g = jax.jit(jax.grad(loss))(jnp.float32(0.5))
                ok = bool(jnp.isfinite(g))
            elif kind == "polar":
                pol_p = jnp.asarray(rng.uniform(
                    -120, -70, (4, u, cfg.num_paths)), jnp.float32)
                pol_ph = jnp.asarray(rng.uniform(
                    -180, 180, (4, u, cfg.num_paths)), jnp.float32)
                h = C.render_channels_planes_polar(paths, bs, ue, cfg,
                                                   pol_p, pol_ph)
                ok = bool(jnp.isfinite(h.astype(jnp.float32)).all())
            elif kind == "beamgain_polar":
                t_ant = cfg.n_tx_ant
                w = np.exp(1j * rng.uniform(-np.pi, np.pi, (16, t_ant)))
                pol_p = jnp.asarray(rng.uniform(
                    -120, -70, (4, u, cfg.num_paths)), jnp.float32)
                pol_ph = jnp.asarray(rng.uniform(
                    -180, 180, (4, u, cfg.num_paths)), jnp.float32)
                g = C.render_beam_gains_polar(
                    paths, bs, ue, cfg, pol_p, pol_ph,
                    jnp.asarray(np.real(w), jnp.float32),
                    jnp.asarray(np.imag(w), jnp.float32))
                ok = bool(jnp.isfinite(g).all())
            else:   # beamgain
                t_ant = cfg.n_tx_ant
                w = np.exp(1j * rng.uniform(-np.pi, np.pi, (16, t_ant)))
                g = C.render_beam_gains(
                    paths, bs, ue, cfg,
                    jnp.asarray(np.real(w), jnp.float32),
                    jnp.asarray(np.imag(w), jnp.float32))
                ok = bool(jnp.isfinite(g).all())
            dt = time.time() - t0
            print(f"[smoke{tag}] {name}: {'OK' if ok else 'FAIL'} "
                  f"fused={expect_fused} {dt:.1f}s", flush=True)
            if not ok:
                failures.append((name, "nonfinite output"))
        except Exception as e:   # Mosaic compile errors land here
            dt = time.time() - t0
            msg = str(e).splitlines()[0][:200]
            print(f"[smoke{tag}] {name}: COMPILE-FAIL {dt:.1f}s {msg}",
                  flush=True)
            failures.append((name, msg))
    return failures


def main():
    if os.environ.get("DM_RENDER_ABLATE"):
        print("[smoke] refusing to run with DM_RENDER_ABLATE set",
              flush=True)
        return 2
    failures = run_variants()
    if failures:
        print(f"[smoke] FAIL: {failures}", flush=True)
        return 1
    print("[smoke] PASS: the dispatchable surface compiled and ran",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

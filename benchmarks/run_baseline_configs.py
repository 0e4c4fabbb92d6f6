"""Sweep the 5 BASELINE.md configurations: TPU vs reference CPU users/s.

Writes benchmarks/RESULTS.md. Run on the real TPU (single process):
    timeout 570 python benchmarks/run_baseline_configs.py

The reference CPU numbers are expensive but machine-stable, so they are
measured separately (CPU only, no TPU client) and cached:
    python benchmarks/run_baseline_configs.py --ref-only
writes benchmarks/baseline_configs_ref.json (2,048 users x 3 timed
repeats after an untimed warmup run — round-4's 256-user single-shot
medians had up to 4.8x bracket spread, dominated by first-call warmup);
the TPU sweep then reads the cache.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_UE = 131_072
MAX_PATHS = 25
BASELINE_SAMPLE = 2048
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RESULTS.md")
REF_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "baseline_configs_ref.json")

CONFIGS = {
    "1 SISO narrowband TD": dict(
        bs_shape=(1, 1), ue_shape=(1, 1), freq_domain=False, k=None),
    "2 OFDM wideband SISO (512 sc)": dict(
        bs_shape=(1, 1), ue_shape=(1, 1), freq_domain=True,
        k=tuple(range(512))),
    # Config 3 renders a REAL subcarrier set (64 of 512) — round 1 quoted
    # this config with a single subcarrier, overstating the speedup for
    # the workload the name implies (VERDICT round 1, weak #2).
    "3 MIMO 8x64 UPA OFDM (64 of 512 sc)": dict(
        bs_shape=(8, 8), ue_shape=(4, 2), freq_domain=True,
        k=tuple(range(64))),
    "4 MIMO + rotation + FoV + dipole": dict(
        bs_shape=(8, 8), ue_shape=(1, 1), freq_domain=True,
        k=tuple(range(16)), bs_rot=(10, 20, 30), dipole=True,
        bs_fov=(120.0, 90.0)),
    "5 Doppler 16 snapshots, 64-ant BS": dict(
        bs_shape=(8, 8), ue_shape=(1, 1), freq_domain=True,
        k=tuple(range(8)), doppler=True, n_times=16),
}


def make_data(n_ue, with_doppler=False, seed=7):
    rng = np.random.RandomState(seed)
    n_valid = rng.randint(1, MAX_PATHS + 1, size=n_ue)
    mask = np.arange(MAX_PATHS)[None, :] < n_valid[:, None]

    def mat(lo, hi):
        return np.where(mask, rng.uniform(lo, hi, (n_ue, MAX_PATHS)),
                        np.nan)

    d = {"power": mat(-130, -60), "phase": mat(-180, 180),
         "delay": mat(1e-7, 4e-6), "aoa_az": mat(-180, 180),
         "aoa_el": mat(0, 180), "aod_az": mat(-180, 180),
         "aod_el": mat(0, 180)}
    if with_doppler:
        d["doppler_vel"] = mat(-30, 30)
        d["doppler_acc"] = mat(-5, 5)
    return d


def bench_tpu(data, spec):
    import jax
    import jax.numpy as jnp
    from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
    from deepmimo_tpu.ops.channel import render_channels

    cfg = ChannelConfig(
        bs_shape=spec["bs_shape"], ue_shape=spec["ue_shape"],
        freq_domain=spec["freq_domain"], subcarriers=512,
        selected_subcarriers=spec["k"] or (0,), bandwidth=10e6,
        num_paths=MAX_PATHS,
        bs_pattern="halfwave-dipole" if spec.get("dipole") else "isotropic",
        ue_pattern="halfwave-dipole" if spec.get("dipole") else "isotropic",
        bs_fov=spec.get("bs_fov"),
        enable_doppler=bool(spec.get("doppler")),
        doppler_times=tuple(np.linspace(0, 1e-2, spec.get("n_times", 1)))
        if spec.get("doppler") else (0.0,),
        dtype="complex64", backend="fused",
        # The PRODUCT default (config singleton) — the bare ChannelConfig
        # dataclass default is "stacked", which this sweep silently used
        # through round 4: config 3's stacked minor dim is 64 lanes, the
        # ~8x output-DMA-penalty layout, and it alone read ~500k users/s
        # (~16 ms/block = 13 ms of misaligned writes + 4 ms kernel) while
        # the packed kernel slope-times at ~2.2 M (perf_cfg3_dispatch.py).
        planes_layout="packed")
    bs = AntennaPanel.make(spec.get("bs_rot", (0, 0, 0)))
    ue = AntennaPanel.make()
    paths = PathData.from_numpy(**data, dtype=jnp.float32)

    # Block size bounded by output-tensor HBM footprint. Big blocks
    # matter: per-dispatch cost is real on this relay, so a 32-block
    # sweep is dispatch-bound. A 4 GB budget is the empirical ceiling:
    # an 8 GB budget (16,384-user config-3 blocks) OOMs inside the sweep
    # even though the identical single dispatch passes standalone — the
    # relay runtime appears not to honor donation aliasing across the
    # warmup + sweep sequence, so budget for scratch + result pairs.
    q = int(np.prod(spec["bs_shape"]) * np.prod(spec["ue_shape"]))
    lastdim = (len(spec["k"]) if spec["freq_domain"] else MAX_PATHS) * \
        spec.get("n_times", 1)
    block = min(N_UE, max(4096, int(4e9 / (q * lastdim * 8))))
    block = 1 << int(np.log2(block))
    n_blocks = max(N_UE // block, 1)
    print(f"  [tpu] block={block} n_blocks={n_blocks}", flush=True)

    from deepmimo_tpu.ops.channel import render_channels_planes
    # Slice inside jit: eager slice_users costs ~5 ms/block in dispatch.
    # The previous block's output buffer is DONATED: blocked sweeps run
    # in constant device memory (allocating/freeing multi-GB outputs per
    # block stalls the allocator on big-q configs).
    render = jax.jit(
        lambda p, b, u, i, scratch: render_channels_planes(
            p.slice_users(i, block), b, u, cfg),
        donate_argnums=(4,))
    dev_paths = jax.device_put(paths)
    oshape = jax.eval_shape(
        lambda p, b, u: render_channels_planes(p.slice_users(0, block),
                                               b, u, cfg),
        dev_paths, bs, ue)
    out = render(dev_paths, bs, ue, 0,
                 jnp.zeros(oshape.shape, oshape.dtype))
    # block_until_ready returns early through the relay: sync via readback
    float(jax.device_get(out[(-1,) * out.ndim]))

    # relay round-trip to subtract
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    tiny = jnp.ones((8, 128))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))

    def sweep():
        nonlocal out
        for i in range(n_blocks):
            out = render(dev_paths, bs, ue, i * block, out)
        float(jax.device_get(out[(-1,) * out.ndim]))

    best = min(_timed(sweep) for _ in range(3))
    ups = n_blocks * block / max(best - t_rt, 1e-9)
    # Free this config's device buffers BEFORE the next config allocates
    # its (multi-GB, donated) output pair: with the 8 GB block budget the
    # sweep otherwise accumulates ~9+ GB across configs and OOMs (the
    # relay processes deletions asynchronously — the tiny sync op flushes
    # them before returning).
    import gc
    del out, dev_paths
    gc.collect()
    float(jax.device_get(f_tiny(tiny)))
    return ups


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench_reference(data, spec):
    if spec.get("doppler"):
        return None  # the reference v4 generator has no Doppler
    sys.path.insert(0, "/root/reference")
    for mod in list(sys.modules):
        if mod == "deepmimo" or mod.startswith("deepmimo."):
            del sys.modules[mod]
    from deepmimo.generator.dataset import Dataset as RefDataset
    from deepmimo.generator.channel import ChannelGenParameters as RefParams

    n = BASELINE_SAMPLE
    sub = {k: np.float32(v[:n]) for k, v in data.items()
           if k not in ("doppler_vel", "doppler_acc")}
    ds = RefDataset(sub | {
        "rx_pos": np.zeros((n, 3), dtype=np.float32),
        "tx_pos": np.zeros((1, 3), dtype=np.float32)})
    if spec.get("bs_fov"):
        ds.apply_fov(bs_fov=np.array(spec["bs_fov"]))
    p = RefParams()
    p["bs_antenna"]["shape"] = np.array(spec["bs_shape"])
    p["ue_antenna"]["shape"] = np.array(spec["ue_shape"])
    p["freq_domain"] = int(spec["freq_domain"])
    p["ofdm"]["selected_subcarriers"] = np.array(spec["k"] or [0])
    p["num_paths"] = MAX_PATHS
    if spec.get("bs_rot"):
        p["bs_antenna"]["rotation"] = np.array(spec["bs_rot"])
    if spec.get("dipole"):
        p["bs_antenna"]["radiation_pattern"] = "halfwave-dipole"
        p["ue_antenna"]["radiation_pattern"] = "halfwave-dipole"
    # Untimed warmup (first call pays numpy/scipy import + cache warmup;
    # round-4's 4.8x bracket spread on config 1 was exactly this), then
    # 3 timed repeats; report the median, keep the range for the table.
    ds.compute_channels(p)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ds.compute_channels(p)
        times.append(time.perf_counter() - t0)
    times.sort()
    return (n / times[1], n / times[-1], n / times[0])


ACCOUNTING = """
## Per-config accounting: what binds each number

Slope-timed production-kernel ablations, same-run interleaved
(`benchmarks/perf_ablate_r5.py`, `perf_cfg3_dispatch.py`; method in
SOL.md round-5 correction). Within-run window drift up to 1.5x means the
table above is a typical-window sample, not a constant of nature.

| config | binding resource (measured) |
|---|---|
| 1 SISO narrowband TD | XLA time-domain path; trivial output — relay window dominates (5.2-13.3M users/s across same-day sweeps) |
| 2 OFDM 512 sc SISO | VPU subcarrier-table construction: `notables` drops 32.6 -> 7.5 ms (~77%); the q=1 MXU dot rows are 2/128 full (`nodot` 10.1 ms); output trivial (16 GB/s). exact per-(path, subcarrier) work is inherent for fractional delays (an FFT route would need approximate delay gridding) |
| 3 MIMO 8x64 | OUTPUT WRITES at ~570-620 GB/s with the packed layout (`writeonly` 7.3 ms = `full` 7.5 ms per 16k users); through round 4 this sweep silently used the stacked dataclass-default layout whose 64-lane minor writes at ~1/8 rate — that alone was the old 0.5M-vs-2.2M gap |
| 4 MIMO + FoV + dipole | fused kernel + angle-space prologue (pattern gains + FoV force rotated-angle computation; `_angles_needed`) |
| 5 Doppler 16 snapshots | output-store pipeline at ~250-260 GB/s: every ablation incl. `writeonly` times the same 16.4-18.5 ms/65k users — store-bound with zero visible compute |
"""


def _training_section():
    """Regenerate the training-step section from training_bench.json so
    ONE script rebuilds the whole RESULTS.md (VERDICT r2 item 8)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "training_bench.json")
    if not os.path.exists(path):
        return ""
    with open(path) as f:
        r = json.load(f)
    t_f = r["forward_only_s"]
    t_p = r["train_step_pallas_bwd_s"]
    t_x = r["train_step_xla_bwd_s"]
    # ADVICE r2: label the whole-step ratio as such and report the
    # backward-only ratio alongside (shared forward subtracted).
    step_ratio = t_x / t_p
    bwd_ratio = (t_x - t_f) / max(t_p - t_f, 1e-9)
    return (
        "\n## Training step (calibration): fused Pallas backward vs XLA"
        " reference VJP\n\n"
        f"{r['workload']}\n"
        "(`benchmarks/run_training_bench.py`, shipped entry point "
        "`parallel.training_step_planes`; 6-step slope timing, relay "
        "RT subtracted once).\n\n"
        "| step | time | users/s |\n|---|---|---|\n"
        f"| forward only (fused) | {t_f*1e3:.1f} ms | "
        f"{32768 / t_f / 1e6:.2f} M |\n"
        f"| train step, Pallas backward | {t_p*1e3:.1f} ms | "
        f"{32768/t_p/1e6:.2f} M |\n"
        f"| train step, XLA-reference backward | {t_x*1e3:.1f} ms | "
        f"{32768/t_x/1e6:.2f} M |\n\n"
        f"**Train-step speedup: {step_ratio:.2f}x; backward-only "
        f"speedup: {bwd_ratio:.2f}x** (round-1 target >= 2x). Losses of "
        "both paths agree to <1e-4 relative (asserted in the bench).\n")


def measure_refs():
    """Measure the upstream CPU generator for every config; cache JSON."""
    refs = {}
    for name, spec in CONFIGS.items():
        data = make_data(BASELINE_SAMPLE,
                         with_doppler=spec.get("doppler", False))
        ref = bench_reference(data, spec)
        refs[name] = ref
        print(f"{name:36s} ref={ref and [round(x, 1) for x in ref]} "
              "users/s [median, min, max]", flush=True)
    with open(REF_CACHE, "w") as f:
        json.dump({"sample": BASELINE_SAMPLE, "repeats": 3,
                   "warmup": 1, "refs": refs}, f, indent=2)
    print(f"wrote {REF_CACHE}")
    return refs


def main():
    if "--ref-only" in sys.argv:
        measure_refs()
        return

    if os.path.exists(REF_CACHE):
        with open(REF_CACHE) as f:
            refs = {k: (tuple(v) if v else None)
                    for k, v in json.load(f)["refs"].items()}
    else:
        refs = measure_refs()

    rows = []
    for name, spec in CONFIGS.items():
        data = make_data(N_UE, with_doppler=spec.get("doppler", False))
        ref = refs.get(name)
        tpu = bench_tpu(data, spec)
        speedup = tpu / ref[0] if ref else None
        rows.append((name, ref, tpu, speedup))
        print(f"{name:36s} ref={ref and round(ref[0], 1)} users/s  "
              f"tpu={tpu:,.0f} users/s  x{speedup and round(speedup)}",
              flush=True)

    with open(OUT, "w") as f:
        f.write("# BASELINE configuration sweep (single TPU chip)\n\n")
        f.write(f"Generated {time.strftime('%Y-%m-%d')} by "
                "`benchmarks/run_baseline_configs.py` at the current "
                "kernel (packed-32 lane layout, concat-dot, packed planes).\n\n")
        f.write(f"{N_UE:,} users x {MAX_PATHS} paths; reference = upstream "
                "CPU generator on this machine (median of 3 timed runs on "
                f"a {BASELINE_SAMPLE:,}-user sample after an untimed "
                "warmup run; range in brackets). TPU "
                "timings are readback-synced (block_until_ready returns "
                "early through the TPU relay) with the relay round-trip "
                "subtracted.\n\n")
        f.write("| config | reference (users/s) | TPU (users/s) | "
                "speedup |\n|---|---|---|---|\n")
        for name, ref, tpu, sp in rows:
            ref_s = (f"{ref[0]:,.0f} [{ref[1]:,.0f}-{ref[2]:,.0f}]"
                     if ref else "n/a (no Doppler in reference)")
            sp_s = f"{sp:,.0f}x" if sp else "-"
            f.write(f"| {name} | {ref_s} | {tpu:,.0f} | {sp_s} |\n")
        f.write(ACCOUNTING)
        f.write(_training_section())
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

"""Real-scenario end-to-end artifact: disk -> dm.load -> TPU -> parity.

Exercises the full L2->L3->L4 path at asu_campus scale in ONE run
(VERDICT r2 item 5; reference analogue: test/test_v3_correspondence.py's
asu_campus oracle run):

  1. writes a fully-formed 411 x 321 = 131,931-user scenario to disk in
     the standard format (params.json + 11 matrix files),
  2. loads it back through ``dm.load`` (the product entry point),
  3. renders all users on the TPU through ``dataset.compute_channels``
     (to_device=True; donated output buffer) and records users/s,
  4. host-gathers a 4,096-user subsample and compares against the
     UPSTREAM reference generator (import from /root/reference) at the
     production tolerance,
  5. writes benchmarks/E2E.md.

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
          python -u benchmarks/run_e2e_scenario.py
CPU smoke:  SMOKE=1 python -u benchmarks/run_e2e_scenario.py
"""

import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
if SMOKE:
    import jax
    jax.config.update("jax_platforms", "cpu")

GRID = (8, 4) if SMOKE else (411, 321)          # asu_campus grid
N_UE = GRID[0] * GRID[1]
MAX_PATHS = 8 if SMOKE else 25
BS_SHAPE = (2, 2) if SMOKE else (8, 8)
N_FFT = 512
SEL_SC = tuple(range(8)) if SMOKE else tuple(range(64))
SUBSAMPLE = 16 if SMOKE else 4096
OUT_MD = os.path.join(REPO, "benchmarks", "E2E.md")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import deepmimo_tpu as dm
    from deepmimo_tpu.ops.channel import unpack_planes_np
    from scenario_utils import write_synthetic_scenario

    folder = os.path.join("/tmp", "e2e_scenario")
    shutil.rmtree(folder, ignore_errors=True)
    t0 = time.perf_counter()
    log(f"writing {N_UE}-user scenario to {folder} ...")
    write_synthetic_scenario(folder, n_ue=N_UE, max_paths=MAX_PATHS,
                             seed=99, grid=GRID)
    t_write = time.perf_counter() - t0
    n_files = len(os.listdir(folder))
    size_mb = sum(os.path.getsize(os.path.join(folder, f))
                  for f in os.listdir(folder)) / 2**20
    log(f"scenario on disk: {n_files} files, {size_mb:.1f} MiB "
        f"({t_write:.1f}s)")

    t0 = time.perf_counter()
    ds = dm.load(folder)
    t_load = time.perf_counter() - t0
    assert ds.n_ue == N_UE
    log(f"dm.load: {t_load:.2f}s, n_ue={ds.n_ue}")

    params = dm.ChannelGenParameters()
    params["bs_antenna"]["shape"] = np.array(BS_SHAPE)
    params["ofdm"]["subcarriers"] = N_FFT
    params["ofdm"]["selected_subcarriers"] = np.array(SEL_SC)
    params["num_paths"] = MAX_PATHS

    # --- TPU render through the product API (device planes) ---
    log("warm-up render (compiles)...")
    h = ds.compute_channels(params, to_device=True)
    float(jax.device_get(jax.numpy.ravel(h)[-1]))
    tiny = jax.numpy.ones((8, 128))
    f_tiny = jax.jit(lambda x: jax.numpy.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    # N-dispatch donated slope (round-5 correction: single-call readbacks
    # overlap the relay rt and under-report short renders).
    N = 2 if SMOKE else 6
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            h = ds.compute_channels(params, to_device=True, out=h)
        float(jax.device_get(jax.numpy.ravel(h)[-1]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    dt = max(best - t_rt, 1e-9) / N
    users_per_s = N_UE / dt
    log(f"TPU render: {dt*1e3:.1f} ms -> {users_per_s/1e6:.2f} M users/s "
        f"({N}-dispatch slope; relay rt {t_rt*1e3:.1f} ms subtracted)")

    # --- fused beam-gain consumer on the SAME loaded scenario ---
    n_beams = 16
    t_ant = int(np.prod(BS_SHAPE))
    rngw = np.random.RandomState(7)
    codebook = np.exp(1j * rngw.uniform(-np.pi, np.pi,
                                        (n_beams, t_ant))) / np.sqrt(t_ant)
    log("beam-gain warm-up (compiles)...")
    g_dev = ds.compute_beam_gains(params, codebook=codebook,
                                  to_device=True)
    float(jax.device_get(jax.numpy.ravel(g_dev)[-1]))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            g_dev = ds.compute_beam_gains(params, codebook=codebook,
                                          to_device=True)
        float(jax.device_get(jax.numpy.ravel(g_dev)[-1]))
        dtb = time.perf_counter() - t0
        best = dtb if best is None else min(best, dtb)
    dtb = max(best - t_rt, 1e-9) / N
    bg_users_per_s = N_UE / dtb
    log(f"beam gains ({n_beams} beams): {dtb*1e3:.1f} ms -> "
        f"{bg_users_per_s/1e6:.2f} M users/s (H never materialized)")

    # --- upstream parity on a subsample (host path) ---
    rng = np.random.RandomState(5)
    idxs = np.sort(rng.choice(N_UE, size=SUBSAMPLE, replace=False))
    sub = ds.subset(idxs)
    ours = sub.compute_channels(params)          # numpy complex64

    log(f"upstream generator on {SUBSAMPLE} users ...")
    sys.path.insert(0, "/root/reference")
    for mod in list(sys.modules):
        if mod == "deepmimo" or mod.startswith("deepmimo."):
            del sys.modules[mod]
    from deepmimo.generator.dataset import Dataset as RefDataset
    from deepmimo.generator.channel import ChannelGenParameters as RefParams

    rds = RefDataset({k: np.asarray(sub[k], dtype=np.float32)
                      for k in ("power", "phase", "delay", "aoa_az",
                                "aoa_el", "aod_az", "aod_el")} |
                     {"rx_pos": np.asarray(sub.rx_pos, dtype=np.float32),
                      "tx_pos": np.asarray(sub.tx_pos, dtype=np.float32)})
    rp = RefParams()
    rp["bs_antenna"]["shape"] = np.array(BS_SHAPE)
    rp["ofdm"]["subcarriers"] = N_FFT
    rp["ofdm"]["selected_subcarriers"] = np.array(SEL_SC)
    rp["num_paths"] = MAX_PATHS
    t0 = time.perf_counter()
    ref = np.asarray(rds.compute_channels(rp))
    t_ref = time.perf_counter() - t0
    ref_users_per_s = SUBSAMPLE / t_ref

    scale = max(np.abs(ref).max(), 1e-30)
    err = np.abs(ours - ref).max() / scale
    log(f"parity: max rel err {err:.2e} (production tolerance 4e-4); "
        f"reference CPU: {ref_users_per_s:.0f} users/s")
    assert err < 4e-4, err

    # Beam-gain parity on the same subsample: the fused consumer kernel
    # vs |conj(W) . H|^2 folded from the parity channels.
    g_sub = sub.compute_beam_gains(params, codebook=codebook)
    expect = np.abs(np.einsum("bt,urtk->urbk", codebook.conj(),
                              ours)) ** 2
    bg_scale = max(expect.max(), 1e-30)
    bg_err = np.abs(g_sub - expect).max() / bg_scale
    log(f"beam-gain parity: max rel err {bg_err:.2e}")
    assert bg_err < 1e-3, bg_err

    res = {
        "scenario": f"synthetic asu-campus-scale grid {GRID[0]}x{GRID[1]}"
                    f" = {N_UE} users, {MAX_PATHS} paths",
        "disk_mib": round(size_mb, 1),
        "load_s": round(t_load, 2),
        "config": f"{BS_SHAPE[0]}x{BS_SHAPE[1]} BS, {len(SEL_SC)} of "
                  f"{N_FFT} subcarriers",
        "tpu_render_ms": round(dt * 1e3, 1),
        "tpu_users_per_s": round(users_per_s, 1),
        "reference_cpu_users_per_s": round(ref_users_per_s, 1),
        "speedup": round(users_per_s / ref_users_per_s, 1),
        "parity_subsample": SUBSAMPLE,
        "parity_max_rel_err": float(f"{err:.3e}"),
        "beamgain_users_per_s": round(bg_users_per_s, 1),
        "beamgain_n_beams": n_beams,
        "beamgain_parity_max_rel_err": float(f"{bg_err:.3e}"),
        "timing": f"{N}-dispatch donated slope, relay rt subtracted",
        "device": str(jax.devices()[0]),
        "date": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(res, indent=2))
    if not SMOKE:
        with open(OUT_MD, "w") as f:
            f.write(
                "# End-to-end real-scenario artifact\n\n"
                "Generated by `benchmarks/run_e2e_scenario.py` — the full "
                "L2->L3->L4 path in one run: scenario written to disk in "
                "the standard format, loaded through `dm.load`, rendered "
                "on the TPU through `dataset.compute_channels("
                "to_device=True)`, and a subsample cross-checked against "
                "the upstream reference generator (reference "
                "test/test_v3_correspondence.py:353-364 analogue).\n\n"
                "```json\n" + json.dumps(res, indent=2) + "\n```\n")
        log(f"wrote {OUT_MD}")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()

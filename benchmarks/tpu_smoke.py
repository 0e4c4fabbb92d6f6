"""TPU compile-smoke gate: every production fused-kernel variant, on chip.

Round-3 postmortem: a kernel restructure landed with the default config
failing Mosaic AOT compile ("Scoped allocation 43.71M exceeded 16.00M
scoped vmem limit") — CPU tests could never catch it because they run the
kernel in interpret mode, which skips Mosaic entirely. This script is the
structural fix: it compiles AND executes one tile of every variant the
product can dispatch (fwd/bwd x packed/stacked x skip-rx x doppler, plus
the opt-in lane-packed layout in a subprocess), on the real TPU, and fails
loudly. Run it before every snapshot commit:

    PYTHONPATH=/root/repo:/root/.axon_site timeout 570 python \
        benchmarks/tpu_smoke.py | tee benchmarks/TPU_SMOKE.txt

Exit code 0 = all variants compiled and produced finite outputs.
Each variant uses exactly the production entry (fused_render / its VJP)
at the production-picked user_tile, on ONE tile of users (fast: the cost
is the Mosaic compile, not the run).
"""

import os
import sys
import time

import numpy as np


def _variants():
    # (name, rx_shape, tx_shape, p, n_k, n_s, packed, bwd, polar_amp)
    # polar_amp: per-snapshot amplitudes (amp [U, S*P] — the dual-polar
    # layout where each snapshot slot is a polarization).
    yield ("fwd_packed_skiprx_headline", (1, 1), (8, 8), 25, 64, 1, True,
           False, False)
    yield ("fwd_stacked_skiprx", (1, 1), (8, 8), 25, 64, 1, False, False,
           False)
    yield ("fwd_packed_mimo_rx", (2, 2), (8, 8), 25, 64, 1, True, False,
           False)
    yield ("fwd_packed_doppler", (1, 1), (8, 8), 25, 64, 4, True, False,
           False)
    yield ("fwd_stacked_doppler_rx", (2, 2), (4, 4), 10, 32, 3, False,
           False, False)
    yield ("fwd_packed_dualpolar", (1, 1), (8, 8), 25, 64, 4, True,
           False, True)
    yield ("bwd_packed_skiprx", (1, 1), (8, 8), 25, 64, 1, True, True,
           False)
    yield ("bwd_stacked_mimo_rx", (2, 2), (8, 8), 25, 64, 1, False, True,
           False)
    yield ("bwd_packed_doppler", (1, 1), (8, 8), 25, 64, 2, True, True,
           False)
    yield ("bwd_packed_dualpolar", (1, 1), (8, 8), 25, 64, 4, True, True,
           True)


def run_variants(tag=""):
    import jax
    import jax.numpy as jnp
    from deepmimo_tpu.ops.pallas.render import (
        fused_render, pick_user_tile, pick_user_tile_bwd)

    backend = jax.default_backend()
    interpret = backend == "cpu"
    print(f"[smoke{tag}] backend={backend} interpret={interpret}",
          flush=True)
    failures = []
    rng = np.random.RandomState(0)
    for (name, rx, tx, p, n_k, n_s, packed, bwd, polar_amp) in _variants():
        ut = pick_user_tile(0, rx, tx, p, n_k, n_s)
        if bwd:
            ut_b = pick_user_tile_bwd(rx, tx, p, n_k, n_s)
            if ut_b == 0:
                print(f"[smoke{tag}] {name}: SKIP (bwd tile does not fit "
                      "-> XLA VJP fallback)", flush=True)
                continue
        if ut == 0:
            failures.append((name, "pick_user_tile returned 0"))
            continue
        u = ut  # exactly one tile: compile cost dominates anyway
        mk = lambda *s: jnp.asarray(
            rng.uniform(-1, 1, s).astype(np.float32))
        n_sa = n_s if polar_amp else 1
        args = (mk(u, p), mk(u, p), mk(u, p), mk(u, p),   # gry grz gty gtz
                jnp.abs(mk(u, n_sa * p)),                 # amp
                mk(u, n_s * p), jnp.abs(mk(u, p)) * 0.1)  # psi omega
        t0 = time.time()
        try:
            # jit the whole variant: ONE remote compile per variant —
            # eager dispatch compiles every prologue op separately over
            # the relay (measured 30+ min for one variant cold).
            if bwd:
                f = lambda *a: fused_render(
                    *a, rx, tx, n_k, ut, interpret, "float32",
                    packed).sum()
                g_fn = jax.jit(jax.grad(f, argnums=tuple(range(7))))
                grads = g_fn(*args)
                bad = [i for i, g in enumerate(grads)
                       if not bool(jnp.isfinite(g).all())]
                ok = not bad
                detail = f"nonfinite grads at {bad}" if bad else ""
            else:
                f_fwd = jax.jit(lambda *a: fused_render(
                    *a, rx, tx, n_k, ut, interpret, "float32", packed))
                h = f_fwd(*args)
                ok = bool(jnp.isfinite(h).all())
                detail = "" if ok else "nonfinite output"
            dt = time.time() - t0
            print(f"[smoke{tag}] {name}: {'OK' if ok else 'FAIL'} "
                  f"ut={ut} {dt:.1f}s {detail}", flush=True)
            if not ok:
                failures.append((name, detail))
        except Exception as e:  # Mosaic compile errors land here
            dt = time.time() - t0
            msg = str(e).splitlines()[0][:200]
            print(f"[smoke{tag}] {name}: COMPILE-FAIL ut={ut} {dt:.1f}s "
                  f"{msg}", flush=True)
            failures.append((name, msg))
    return failures


def main():
    if os.environ.get("DM_RENDER_ABLATE"):
        print("[smoke] refusing to run with DM_RENDER_ABLATE set",
              flush=True)
        return 2
    failures = run_variants()
    # Legacy no-pack layout (the DM_RENDER_NO_PACK debug fallback):
    # trace-time module global; safe to flip here because the smoke calls
    # fused_render directly and the changed row shapes force fresh traces
    # (a SECOND process would pay the remote-compile cold start again —
    # measured ~16 min).
    from deepmimo_tpu.ops.pallas import render as R
    R.NO_PACK = True
    try:
        failures += run_variants(tag=":nopack")
    finally:
        R.NO_PACK = False
    if failures:
        print(f"[smoke] FAIL: {failures}", flush=True)
        return 1
    print("[smoke] PASS: all kernel variants compiled and ran", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

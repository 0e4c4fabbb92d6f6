"""ARCHIVED (round 3): probes the OLD full-width masked-dot lane
packing, superseded by the default 32-aligned sliced layout (see
perf_pack32.py / perf_pack32c.py). Kept for the measurement record; the
module APIs it pokes (_grouping -> int, LANE_PACK) no longer exist.

Bisect the lane-packed kernel: pack transpose vs masks vs dots/stores.

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 570 \
          python -u benchmarks/perf_lanepack.py
"""

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

U = 131_072
P = 25
BS = (8, 8)
N_K = 64


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    raise SystemExit("archived: see perf_pack32*.py (layout superseded)")
    import jax
    import jax.numpy as jnp
    import deepmimo_tpu.ops.pallas.render as R

    rng = np.random.RandomState(3)
    mk = lambda lo, hi: jnp.asarray(
        rng.uniform(lo, hi, (U, P)).astype(np.float32))
    gry = mk(-3, 3); grz = mk(-3, 3); gty = mk(-3, 3); gtz = mk(-3, 3)
    amp = mk(0, 1e-5); psi = mk(-3, 3); omega = mk(0, 0.5)

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt = {t_rt*1e3:.2f} ms")

    g = R._grouping(P)
    ut = R.pick_user_tile(U, (1, 1), BS, P, N_K)
    ug = ut // g
    u_pad = R._ceil_to(U, ut)
    nb = u_pad // ut
    log(f"group={g} user_tile={ut} ug={ug} nb={nb}")

    def timeit(name, fn, *args):
        try:
            def sync(out):
                ref = out[0] if isinstance(out, (tuple, list)) else out
                # scalar index (NOT reshape/ravel: that copies the tensor)
                float(jax.device_get(ref[(-1,) * ref.ndim]))
            sync(fn(*args))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                sync(fn(*args))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            dt = max(best - t_rt, 1e-9)
            log(f"{name:40s} {dt*1e3:8.2f} ms   {U/dt/1e6:6.2f} M users/s")
        except Exception as e:
            log(f"{name:40s} FAILED: {str(e)[:120]}")

    # 1) prologue + pack only (what feeds the kernel)
    @jax.jit
    def prologue_pack(a, b, c, d, e, f, h):
        args = R._trig_args(a, b, c, d, e, f, h, skip_rx=True)
        args = [jnp.pad(x, ((0, u_pad - U),) + ((0, 0),) * (x.ndim - 1))
                for x in args]
        return [R._pack_rows(x, nb, g, ug) for x in args]
    timeit("prologue+pack", prologue_pack, gty, gtz, amp, psi, omega,
           gry, grz)

    @jax.jit
    def prologue_only(a, b, c, d, e, f, h):
        return R._trig_args(a, b, c, d, e, f, h, skip_rx=True)
    timeit("prologue only", prologue_only, gty, gtz, amp, psi, omega,
           gry, grz)

    # 2) kernel ablations (bf16 single-pass to isolate non-dot costs)
    for ablate in ("", "nopack", "nomask", "oneres", "nopack,nomask,oneres"):
        for mm in ("bfloat16", "float32"):
            R._ABLATE = ablate
            jax.clear_caches()
            f = jax.jit(functools.partial(
                R.fused_render, rx_shape=(1, 1), tx_shape=BS, n_k=N_K,
                user_tile=ut, interpret=False, mm_dtype=mm, packed=True))
            timeit(f"kernel mm={mm:8s} ablate=[{ablate}]", f, gry, grz,
                   gty, gtz, amp, psi, omega)
    R._ABLATE = ""

    # 3) legacy unpacked layout (G forced to 1) for comparison
    orig = R._grouping
    R._grouping = lambda p: 1
    for mm in ("bfloat16", "float32"):
        jax.clear_caches()
        f = jax.jit(functools.partial(
            R.fused_render, rx_shape=(1, 1), tx_shape=BS, n_k=N_K,
            user_tile=128, interpret=False, mm_dtype=mm, packed=True))
        timeit(f"LEGACY G=1 ut=128 mm={mm}", f, gry, grz, gty, gtz,
               amp, psi, omega)
    R._grouping = orig

    # 4) packed tile sweep at the winning precision
    for ug_t in (16, 32, 64, 128):
        jax.clear_caches()
        f = jax.jit(functools.partial(
            R.fused_render, rx_shape=(1, 1), tx_shape=BS, n_k=N_K,
            user_tile=g * ug_t, interpret=False, mm_dtype="float32",
            packed=True))
        timeit(f"packed ug={ug_t} mm=float32", f, gry, grz, gty, gtz,
               amp, psi, omega)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()

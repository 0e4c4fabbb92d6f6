"""Same-process A/B: prologue ordering for the packed layout.

PACK_FIRST=True packs the 7 raw inputs then runs trig on the packed
(dense) arrays (7 transposes); the default runs trig on flat views then
packs the 13 outputs. Cross-process bench runs showed up to 2x
environmental variance, so this alternates the two orderings in ONE
process, interleaved A/B/A/B, and reports per-ordering minima — the
only comparison that survives the relay noise.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
        benchmarks/perf_prologue.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "benchmarks")
from deepmimo_tpu.ops.pallas import render as R

U, P, K = 131_072, 25, 64
TX = (8, 8)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    args = (mk(U, P), mk(U, P), mk(U, P), mk(U, P),
            jnp.abs(mk(U, P)) * 1e-4, mk(U, P), jnp.abs(mk(U, P)) * 0.1)

    tiny = jax.jit(lambda x: x * 1.000001)(jnp.ones((8, 128)))
    t_rt = min(_t(lambda: float(jax.device_get(tiny[0, 0])))
               for _ in range(5))
    log(f"relay rt = {t_rt * 1e3:.1f} ms")

    # Two separately-traced executables (trace-time flag -> distinct fns
    # via a dummy static arg so both stay in the jit cache).
    fns = {}
    for name, flag in (("trig_first", False), ("pack_first", True)):
        R.PACK_FIRST = flag
        f = jax.jit(lambda a, b, c, d, e, g, w, _tag=name: R.fused_render(
            a, b, c, d, e, g, w, (1, 1), TX, K, 512, False, "float32",
            True))
        h = f(*args)
        float(jax.device_get(h[-1, -1, -1]))      # compile + warm
        fns[name] = f
    R.PACK_FIRST = False

    times = {k: [] for k in fns}
    for rep in range(6):                           # interleaved A/B
        for name, f in fns.items():
            dt = _t(lambda: float(jax.device_get(f(*args)[-1, -1, -1])))
            times[name].append(dt - t_rt)
    for name, ts in times.items():
        best = min(ts) * 1e3
        med = sorted(ts)[len(ts) // 2] * 1e3
        log(f"{name}: best {best:7.2f} ms  median {med:7.2f} ms  "
            f"({U / (min(ts)) / 1e6:.2f} M users/s)")


if __name__ == "__main__":
    main()

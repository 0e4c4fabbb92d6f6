"""Beam-gain store-alignment A/B: padded 128-lane minor vs raw sk minor.

G [U, 16, 64] has a 64-lane minor — the ~1/8-rate store layout. pad_store
pads the stored minor to 128 lanes (2x bytes, aligned) and slices the
result. Slope-timed, interleaved, same process.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python -u \
     benchmarks/perf_bg_pad.py > /tmp/bgpad.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.pallas.beamgain import fused_beam_gain

U, P, B, N_K, N = 131_072, 25, 16, 64, 6


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    args = (mk(U, P), mk(U, P), mk(U, P), mk(U, P),
            jnp.abs(mk(U, P)) * 1e-4, mk(U, P),
            jnp.abs(mk(U, P)) * 0.1)
    w = np.exp(1j * rng.uniform(-np.pi, np.pi, (B, 64))) / 8.0
    wr = jnp.asarray(np.real(w), jnp.float32)
    wi = jnp.asarray(np.imag(w), jnp.float32)

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt {t_rt*1e3:.2f} ms")

    fns = {}
    for pad in (False, True):
        def _f(a, b, c, d, e, f, g, scratch, _pad=pad):
            del scratch
            return fused_beam_gain(a, b, c, d, e, f, g, wr, wi,
                                   (1, 1), (8, 8), N_K, user_tile=512,
                                   interpret=False, pad_store=_pad)
        fns[pad] = jax.jit(_f, donate_argnums=(7,))

    outs = {}
    for pad, f in fns.items():
        h = jnp.zeros((U, B, N_K), jnp.float32)
        h = f(*args, h)
        float(jax.device_get(h[-1, -1, -1]))
        outs[pad] = h
    np.testing.assert_allclose(
        np.asarray(jax.device_get(outs[True][:64])),
        np.asarray(jax.device_get(outs[False][:64])), rtol=1e-6)
    log("parity ok; measuring")

    res = {False: [], True: []}
    for rep in range(3):
        for pad in (False, True):
            f = fns[pad]
            h = outs[pad]

            def sweep(h=h, f=f):
                for _ in range(N):
                    h = f(*args, h)
                float(jax.device_get(h[-1, -1, -1]))
                return h
            t0 = time.perf_counter()
            outs[pad] = sweep()
            res[pad].append(time.perf_counter() - t0)
        log(f"rep {rep} done")

    for pad, v in res.items():
        s = " ".join(f"{x*1e3:7.1f}" for x in v)
        best = (min(v) - t_rt) / N
        log(f"pad_store={pad!s:5s} sweeps[ms]: {s}  per-dispatch "
            f"{best*1e3:7.2f} ms  ({U/best/1e6:5.2f} M users/s)")
    log("done")


if __name__ == "__main__":
    main()

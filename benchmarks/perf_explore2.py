"""Isolate the path-sum stage: 4-matmul vs packed-128 vs VPU reduce.

Headline shapes per user-block: e[u, q=64, p=25] (real+imag),
g[u, p=25, k=64] (real+imag) -> h[u, q, k] (real+imag).

Run: timeout 570 python benchmarks/perf_explore2.py
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


U, Q, P, K = 16384, 64, 25, 64
N_REP = 8  # sweep reps to amortize


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    log("device:", jax.devices()[0])
    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    sync = lambda o: float(jax.device_get(o.ravel()[-1]))
    sync(f_tiny(tiny))
    t_rt = min(_t(lambda: sync(f_tiny(tiny))) for _ in range(5))
    log(f"RTT {t_rt*1e3:.1f} ms")

    rng = np.random.RandomState(0)
    er = jnp.asarray(rng.randn(U, Q, P), jnp.float32)
    ei = jnp.asarray(rng.randn(U, Q, P), jnp.float32)
    gr = jnp.asarray(rng.randn(U, P, K), jnp.float32)
    gi = jnp.asarray(rng.randn(U, P, K), jnp.float32)

    mm = lambda a, b: jnp.einsum("uqp,upk->uqk", a, b,
                                 preferred_element_type=jnp.float32)

    @jax.jit
    def four_mm(er, ei, gr, gi):
        hr = mm(er, gr) - mm(ei, gi)
        hi = mm(er, gi) + mm(ei, gr)
        return jnp.stack((hr, hi))

    @jax.jit
    def packed_mm(er, ei, gr, gi):
        e2 = jnp.concatenate((er, ei), axis=1)          # [u, 2q, p]
        g2 = jnp.concatenate((gr, gi), axis=2)          # [u, p, 2k]
        m = mm(e2, g2)                                  # [u, 2q, 2k]
        q, k = er.shape[1], gr.shape[2]
        hr = m[:, :q, :k] - m[:, q:, k:]
        hi = m[:, :q, k:] + m[:, q:, :k]
        return jnp.stack((hr, hi))

    @jax.jit
    def packed_bf16(er, ei, gr, gi):
        c = lambda x: x.astype(jnp.bfloat16)
        return packed_mm(c(er), c(ei), c(gr), c(gi))

    @jax.jit
    def vpu_reduce(er, ei, gr, gi):
        # [u,q,p,k] fused reduce over p
        hr = (er[:, :, :, None] * gr[:, None] -
              ei[:, :, :, None] * gi[:, None]).sum(2)
        hi = (er[:, :, :, None] * gi[:, None] +
              ei[:, :, :, None] * gr[:, None]).sum(2)
        return jnp.stack((hr, hi))

    ref = None
    for name, fn in [("four_mm", four_mm), ("packed_mm", packed_mm),
                     ("packed_bf16", packed_bf16),
                     ("vpu_reduce", vpu_reduce)]:
        try:
            o = fn(er, ei, gr, gi)
            sync(o)
            if ref is None:
                ref = np.asarray(jax.device_get(o[:, :256]), np.float64)
            else:
                d = np.abs(np.asarray(jax.device_get(o[:, :256]),
                                      np.float64) - ref)
                log(f"  {name} rel err {d.max()/np.abs(ref).max():.2e}")

            def sweep(fn=fn):
                outs = [fn(er, ei, gr, gi) for _ in range(N_REP)]
                sync(outs[-1])

            best = (min(_t(sweep) for _ in range(3)) - t_rt) / N_REP
            ups = U / best
            log(f"{name:14s} {best*1e3:8.2f} ms/block  "
                f"{ups/1e6:6.2f} M users/s  "
                f"({8*U*Q*P*K/best/1e12:.2f} TFLOP/s)")
            del o, outs
        except Exception as e:
            log(f"{name} failed: {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()

"""Roll-free packed reassemble probe (round-5 kernel lead).

Production packed kernel: ONE [2q, 96]x[2sk, 96] dot per residue, then
roll+select on m [ug, 2q, 2sk] to form [hr|hi] (~1.8 ms of the 11 ms
headline kernel, perf_ablate_r5 'noreassemble').

Alternative (exact, same MACs): v = er.g2a^T + ei.g2b^T with
  g2a = [gr; gi] (the existing g2),
  g2b = [-gi; gr] (a sublane roll + sign of g2),
TWO [q, 96]x[2sk, 96] dots per residue, v stored directly — no roll on
the f32 m, and the dot output halves ([ug, q, 2sk] instead of
[ug, 2q, 2sk]). The g2b prep costs 2 bf16-half rolls + selects per tile.

Slope-timed A/B vs the production fused_render, bit-accuracy asserted.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
     benchmarks/perf_noroll.py > /tmp/noroll.log 2>&1
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepmimo_tpu.ops.pallas import render as R

U, P, N_K, N = 65_536, 25, 64, 6   # half chunk: both variants' outputs must fit HBM together
TX = (8, 8)
Q = 64
SK = N_K
G_GRP = 4
PP = 32
UT = 512
UG = UT // G_GRP


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _kernel_noroll(cgty_ref, sgty_ref, cgtz_ref, sgtz_ref, amp_ref,
                   cpsi_ref, spsi_ref, com_ref, som_ref, h_ref):
    f32 = jnp.float32
    amp = amp_ref[:]
    ug = amp.shape[0]
    l1 = R._best_l1(N_K)

    er, ei = R._response(cgty_ref[:], sgty_ref[:], cgtz_ref[:],
                         sgtz_ref[:], *TX)                 # [ug, Q, 128]
    gr, gi = R._ofdm_tables(cpsi_ref[:], spsi_ref[:], com_ref[:],
                            som_ref[:], amp, N_K, l1)      # [ug, SK, 128]

    g2 = jnp.concatenate((gr, gi), axis=1)                 # [ug, 2SK, L]
    # g2b = [-gi; gr]: a sublane roll of g2 by SK rows + sign on the
    # first SK rows (cheap vs rolling the f32 dot output).
    g2r = pltpu.roll(g2, SK, axis=1)                       # [gi; gr]
    row = jax.lax.broadcasted_iota(jnp.int32, g2r.shape, 1)
    g2b = jnp.where(row < SK, -g2r, g2r)

    def split(x):
        hi = x.astype(jnp.bfloat16)
        return hi, (x - hi.astype(f32)).astype(jnp.bfloat16)

    e_r = split(er)
    e_i = split(ei)
    ga = split(g2)
    gb = split(g2b)

    dn = (((2,), (2,)), ((0,), (0,)))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=f32)
    terms = ((0, 0), (0, 1), (1, 0))

    def dot3(a, b, lo):
        sl = lambda x: x[..., lo:lo + PP]
        lhs = jnp.concatenate([sl(a[ia]) for ia, _ in terms], axis=-1)
        rhs = jnp.concatenate([sl(b[ib]) for _, ib in terms], axis=-1)
        return dot(lhs, rhs)

    for res in range(G_GRP):
        lo = res * PP
        v = dot3(e_r, ga, lo) + dot3(e_i, gb, lo)          # [ug, Q, 2SK]
        rows = slice(res * ug, (res + 1) * ug)
        h_ref[rows] = v.astype(h_ref.dtype)


def build_noroll():
    spec_up = pl.BlockSpec((UG, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_psi = pl.BlockSpec((UG, 1, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((UT, Q, 2 * SK), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid = (U // UT,)

    def run(gty, gtz, amp, psi, omega):
        args = R._trig_args(None, None, gty, gtz, amp, psi, omega,
                            skip_rx=True)
        args = [R._pack_rows(x, U // UT, G_GRP, UG, PP) for x in args]
        return pl.pallas_call(
            _kernel_noroll, grid=grid,
            in_specs=[spec_up] * 4 + [spec_psi] * 3 + [spec_up] * 2,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((U, Q, 2 * SK), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 2**20),
        )(*args)
    return run


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    gty, gtz = mk(U, P), mk(U, P)
    amp = jnp.abs(mk(U, P)) * 1e-4
    psi = mk(U, P)
    omega = jnp.abs(mk(U, P)) * 0.1

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_t(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt {t_rt*1e3:.2f} ms")

    def _prod(a, b, c, d, e, scratch):
        del scratch
        return R.fused_render(jnp.zeros_like(a), jnp.zeros_like(a),
                              a, b, c, d, e, (1, 1), TX, N_K,
                              user_tile=UT, interpret=False,
                              mm_dtype="float32", packed=True)
    f_prod = jax.jit(_prod, donate_argnums=(5,))

    nr = build_noroll()

    def _nr(a, b, c, d, e, scratch):
        del scratch
        return nr(a, b, c, d, e)
    f_nr = jax.jit(_nr, donate_argnums=(5,))

    log("compiling...")
    hp = f_prod(gty, gtz, amp, psi, omega,
                jnp.zeros((U, Q, 2 * SK)))
    float(jax.device_get(hp[-1, -1, -1]))
    hn = f_nr(gty, gtz, amp, psi, omega, jnp.zeros((U, Q, 2 * SK)))
    float(jax.device_get(hn[-1, -1, -1]))
    # accuracy: both are f32-grade concat-dots of the same math
    sa = np.asarray(jax.device_get(hp[:256]))
    sb = np.asarray(jax.device_get(hn[:256]))
    scale = np.abs(sa).max()
    derr = np.abs(sa - sb).max() / scale
    log(f"noroll vs production: max rel diff {derr:.2e}")
    assert derr < 1e-5, derr

    res = {"prod": [], "noroll": []}
    for rep in range(3):
        for name, f, h in (("prod", f_prod, hp), ("noroll", f_nr, hn)):
            def sweep(h=h, f=f):
                for _ in range(N):
                    h = f(gty, gtz, amp, psi, omega, h)
                float(jax.device_get(h[-1, -1, -1]))
                return h
            t0 = time.perf_counter()
            h2 = sweep()
            if name == "prod":
                hp = h2
            else:
                hn = h2
            res[name].append(time.perf_counter() - t0)
        log(f"rep {rep} done")

    for k, v in res.items():
        s = " ".join(f"{x*1e3:7.1f}" for x in v)
        best = (min(v) - t_rt) / N
        log(f"{k:8s} sweeps[ms]: {s}  per-dispatch {best*1e3:7.2f} ms "
            f"({U/best/1e6:5.2f} M users/s)")
    log("done")


if __name__ == "__main__":
    main()

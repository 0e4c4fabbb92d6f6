"""Kill the XLA pack transposes: lane-concat the user groups IN-KERNEL.

perf_prologue measured the full fused_render call at 11.7 ms vs 7.9 ms
kernel-alone: ~3.9 ms is the XLA-side _pack_rows transposes (13 arrays).
This variant ships per-path inputs as [U, 32] blocks (pad 25 -> 32 only,
fused with the trig) and builds the [ug, 128] packed registers inside
the kernel with 4 sublane-slice loads + one lane concat — VMEM work
instead of HBM-roundtrip transposes. Output mapping unchanged.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
        benchmarks/perf_inkernel_pack.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "benchmarks")
from deepmimo_tpu.ops.pallas import render as R

U, P, PP, G = 131_072, 25, 32, 4
TX = (8, 8)
N_K = 64
L1 = R._best_l1(N_K)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _kernel_ik(cgty_ref, sgty_ref, cgtz_ref, sgtz_ref, amp_ref, cpsi_ref,
               spsi_ref, com_ref, som_ref, h_ref, *, tx_shape, n_k, l1,
               ug):
    """Inputs are [ut, (n_s,) 32] blocks in GLOBAL user order; the packed
    [ug, (n_s,) 128] registers are built here: residue r's users are rows
    [r*ug, (r+1)*ug) (contiguous sublane slices), lane-concatenated."""
    def pk(ref):
        x = ref[:]
        return jnp.concatenate(
            [x[r * ug:(r + 1) * ug] for r in range(G)], axis=-1)

    amp = pk(amp_ref)                              # [ug, 1, 128]
    n_s = cpsi_ref.shape[1]
    er, ei = R._response(pk(cgty_ref), pk(sgty_ref), pk(cgtz_ref),
                         pk(sgtz_ref), *tx_shape)
    gr, gi = R._ofdm_tables(pk(cpsi_ref), pk(spsi_ref), pk(com_ref),
                            pk(som_ref), amp, n_k, l1)

    q = tx_shape[0] * tx_shape[1]
    sk = n_s * n_k
    f32 = jnp.float32
    e2 = jnp.concatenate((er, ei), axis=1)
    g2 = jnp.concatenate((gr, gi), axis=1)
    e_hi = e2.astype(jnp.bfloat16)
    e_lo = (e2 - e_hi.astype(f32)).astype(jnp.bfloat16)
    g_hi = g2.astype(jnp.bfloat16)
    g_lo = (g2 - g_hi.astype(f32)).astype(jnp.bfloat16)

    dn = (((2,), (2,)), ((0,), (0,)))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=f32)
    for res in range(G):
        lo = res * PP
        sl = lambda x: x[:, :, lo:lo + PP]
        lhs = jnp.concatenate((sl(e_hi), sl(e_hi), sl(e_lo)), axis=2)
        rhs = jnp.concatenate((sl(g_hi), sl(g_lo), sl(g_hi)), axis=2)
        m = dot(lhs, rhs)
        rows = slice(res * ug, (res + 1) * ug)
        rolled = pltpu.roll(m[:, q:, :], sk, axis=2)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
        h_ref[rows] = m[:, :q, :] + jnp.where(lane2 < sk, -rolled, rolled)


def fwd_ik(gty, gtz, amp, psi, omega, user_tile, interpret=False):
    u, p = amp.shape
    n_s = psi.shape[1] // p
    ug = user_tile // G
    nb = u // user_tile
    q = TX[0] * TX[1]
    sk = n_s * N_K

    # Prologue: trig on flat views, output padded to 32 lanes (NO pack).
    fl = lambda x: x.reshape(-1)
    pad32 = lambda x: jnp.pad(
        x.reshape((u,) + ((n_s, p) if x.size == u * n_s * p else (p,))),
        [(0, 0)] * (2 if x.size == u * p else 2) + [(0, PP - p)]
        if x.size == u * p else [(0, 0), (0, 0), (0, PP - p)])

    def cs2(x, neg=False):
        s = jnp.sin(fl(x))
        c = jnp.cos(fl(x))
        sh = (u, p)
        mk = lambda v: jnp.pad(v.reshape(sh), [(0, 0), (0, PP - p)])
        return mk(c), mk(-s if neg else s)

    cgty, sgty = cs2(gty)
    cgtz, sgtz = cs2(gtz)
    amp3 = jnp.pad(amp.reshape(u, 1, p), [(0, 0), (0, 0), (0, PP - p)])
    spsi_ = jnp.sin(fl(psi))
    cpsi_ = jnp.cos(fl(psi))
    cpsi = jnp.pad(cpsi_.reshape(u, n_s, p),
                   [(0, 0), (0, 0), (0, PP - p)])
    spsi = jnp.pad(spsi_.reshape(u, n_s, p),
                   [(0, 0), (0, 0), (0, PP - p)])
    com, som = cs2(omega, neg=True)

    spec_up = pl.BlockSpec((user_tile, PP), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_psi = pl.BlockSpec((user_tile, n_s, PP), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_amp = pl.BlockSpec((user_tile, 1, PP), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((user_tile, q, 2 * sk), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_ik, tx_shape=TX, n_k=N_K, l1=L1,
                             ug=ug)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[spec_up] * 4 + [spec_amp] + [spec_psi] * 2 +
                 [spec_up] * 2,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((u, q, 2 * sk), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(cgty, sgty, cgtz, sgtz, amp3, cpsi, spsi, com, som)


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    args = (mk(U, P), mk(U, P), jnp.abs(mk(U, P)) * 1e-4, mk(U, P),
            jnp.abs(mk(U, P)) * 0.1)

    tiny = jax.jit(lambda x: x * 1.000001)(jnp.ones((8, 128)))
    t_rt = min(_t(lambda: float(jax.device_get(tiny[0, 0])))
               for _ in range(5))
    log(f"relay rt = {t_rt * 1e3:.1f} ms")

    # A: current production (trig-first + XLA pack), B: in-kernel pack.
    zero = jnp.zeros((U, P), jnp.float32)
    fa = jax.jit(lambda a, b, c, d, e: R.fused_render(
        zero, zero, a, b, c, d, e, (1, 1), TX, N_K, 512, False,
        "float32", True))
    fb = jax.jit(lambda a, b, c, d, e, _ut=512: fwd_ik(a, b, c, d, e,
                                                       _ut))
    fns = {"prod_xla_pack": fa, "inkernel_pack": fb}
    for f in fns.values():                         # compile + warm
        float(jax.device_get(f(*args)[-1, -1, -1]))
    times = {k: [] for k in fns}
    for _ in range(8):                             # interleaved A/B/A/B
        for name, f in fns.items():
            times[name].append(_t(lambda: float(jax.device_get(
                f(*args)[-1, -1, -1]))) - t_rt)
    for name, ts in times.items():
        log(f"{name}: best {min(ts)*1e3:7.2f} ms  median "
            f"{sorted(ts)[len(ts)//2]*1e3:7.2f} ms  "
            f"({U / min(ts) / 1e6:.2f} M users/s)")

    # parity on a slice
    n = 2048
    ha = R.fused_render(zero[:n], zero[:n], args[0][:n], args[1][:n],
                        args[2][:n], args[3][:n], args[4][:n],
                        (1, 1), TX, N_K, 128, False, "float32", True)
    hb = fwd_ik(args[0][:n], args[1][:n], args[2][:n], args[3][:n],
                args[4][:n], 128)
    d = float(jnp.max(jnp.abs(ha - hb)))
    log(f"parity: max|diff| = {d:.3e}")


if __name__ == "__main__":
    main()

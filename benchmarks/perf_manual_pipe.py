"""Manual double-buffered H stores: hide the output DMA behind compute.

SOL.md's open frontier: the fused kernel is the SUM of its stage costs —
the per-tile H store does not overlap the next tile's compute. This
variant takes the output as a whole HBM ref (BlockSpec(memory_space=ANY)),
computes each tile into one of two VMEM scratch slots, and issues the
scratch->HBM copy with make_async_copy, waiting on a slot only when it
is about to be reused two steps later. If the serial-store hypothesis is
right this hides up to ~5 ms of output DMA behind compute.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
        benchmarks/perf_manual_pipe.py
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


def _kernel_mp(cgty_ref, sgty_ref, cgtz_ref, sgtz_ref, amp_ref, cpsi_ref,
               spsi_ref, com_ref, som_ref, h_hbm, scratch, sems, *,
               tx_shape, n_k, l1, ug, user_tile, nb):
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)

    def copy_for(step, s):
        return pltpu.make_async_copy(
            scratch.at[s],
            h_hbm.at[pl.ds(step * user_tile, user_tile)],
            sems.at[s])

    # Before overwriting this slot, drain the copy issued two steps ago.
    @pl.when(i >= 2)
    def _():
        copy_for(i - 2, slot).wait()

    amp = amp_ref[:]
    n_s = cpsi_ref.shape[1]
    er, ei = R._response(cgty_ref[:], sgty_ref[:], cgtz_ref[:],
                         sgtz_ref[:], *tx_shape)
    gr, gi = R._ofdm_tables(cpsi_ref[:], spsi_ref[:], com_ref[:],
                            som_ref[:], amp, n_k, l1)

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
        scratch[slot, rows] = m[:, :q, :] + jnp.where(lane2 < sk, -rolled,
                                                      rolled)

    copy_for(i, slot).start()

    # Last step: drain both slots before the kernel retires.
    @pl.when(i == nb - 1)
    def _():
        copy_for(i, slot).wait()
        if nb >= 2:                      # static
            copy_for(i - 1, 1 - slot).wait()


def fwd_mp(gty, gtz, amp, psi, omega, user_tile):
    u, p = amp.shape
    n_s = psi.shape[1] // p
    g, pp = R._grouping(p)
    assert (g, pp) == (G, PP)
    ug = user_tile // G
    nb = u // user_tile
    q = TX[0] * TX[1]
    sk = n_s * N_K

    args = R._trig_args(None, None, gty, gtz, amp, psi, omega,
                        skip_rx=True, pack=(nb, g, ug, pp))

    spec_up = pl.BlockSpec((ug, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_psi = pl.BlockSpec((ug, n_s, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_amp = pl.BlockSpec((ug, 1, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_mp, tx_shape=TX, n_k=N_K, l1=L1,
                             ug=ug, user_tile=user_tile, nb=nb)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[spec_up] * 4 + [spec_amp] + [spec_psi] * 2 +
                 [spec_up] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((u, q, 2 * sk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, user_tile, q, 2 * sk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
    )(*args)


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    zero = jnp.zeros((U, P), jnp.float32)
    args = (mk(U, P), mk(U, P), jnp.abs(mk(U, P)) * 1e-4, mk(U, P),
            jnp.abs(mk(U, P)) * 0.1)
    tiny = jax.jit(lambda x: x * 1.000001)(jnp.ones((8, 128)))
    t_rt = min(_t(lambda: float(jax.device_get(tiny[0, 0])))
               for _ in range(5))
    log(f"relay rt {t_rt * 1e3:.1f} ms")
    out_gb = U * 64 * 128 * 4 / 1e9

    fa = jax.jit(lambda a, b, c, d, e: R.fused_render(
        zero, zero, a, b, c, d, e, (1, 1), TX, N_K, 512, False,
        "float32", True))
    fns = {"prod_auto_pipe": fa}
    for ut in (128, 256):
        fns[f"manual_pipe_{ut}"] = jax.jit(
            lambda a, b, c, d, e, _ut=ut: fwd_mp(a, b, c, d, e, _ut))
    good = {}
    for name, f in fns.items():
        try:
            h = f(*args)
            float(jax.device_get(h[-1, -1, -1]))
            good[name] = f
        except Exception as e:
            log(f"{name}: COMPILE-FAIL {str(e).splitlines()[0][:140]}")
    times = {k: [] for k in good}
    for _ in range(8):                           # interleaved
        for name, f in good.items():
            times[name].append(_t(lambda: float(jax.device_get(
                f(*args)[-1, -1, -1]))) - t_rt)
    for name, ts in times.items():
        log(f"{name}: best {min(ts)*1e3:7.2f} ms  median "
            f"{sorted(ts)[len(ts)//2]*1e3:7.2f} ms  "
            f"{U/min(ts)/1e6:6.2f} M users/s  {out_gb/min(ts):4.0f} GB/s")

    if len(good) > 1:
        n = 2048
        ha = R.fused_render(zero[:n], zero[:n], args[0][:n], args[1][:n],
                            args[2][:n], args[3][:n], args[4][:n],
                            (1, 1), TX, N_K, 128, False, "float32", True)
        hb = fwd_mp(args[0][:n], args[1][:n], args[2][:n], args[3][:n],
                    args[4][:n], 128)
        log(f"parity: max|diff| = "
            f"{float(jnp.max(jnp.abs(ha - hb))):.3e}")


if __name__ == "__main__":
    main()

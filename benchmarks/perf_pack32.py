"""Experiment: 32-lane-aligned user packing for the fused render kernel.

Round-3's lane-pack attempt (G = 128//P = 5 users/group, full-width
masked dots) lost 4x on MXU work and paid per-residue mask copies —
measured 22.3 ms vs legacy 14.5 ms (perf_lanepack.py). This probes the
alternative SOL.md defers to:

  G = 4 users per 128-lane group, each user's P paths padded to 32
  lanes. Per-path VPU stages (panel recurrences, subcarrier tables) run
  DENSE at 78% lane efficiency instead of 19.5% (P=25 on 128 lanes).
  The path-sum dot per residue SLICES its 32-lane block (32-aligned —
  a cheap lane extract, no masks) and contracts 32 lanes, exactly the
  legacy MXU cost (ceil(25, 32) = 32).

Forward-only standalone kernel variant; decides whether the layout is
worth integrating. Also sweeps user_tile now that the scoped-VMEM limit
is passed unconditionally (is ut=128 still the winner?).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 570 python \
        benchmarks/perf_pack32.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepmimo_tpu.ops.pallas import render as R

U = 131_072
P = 25
PP = 32                  # per-user padded path lanes
G = 128 // PP            # users per lane group
RX = (1, 1)
TX = (8, 8)
N_K = 64
L1 = R._best_l1(N_K)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


# ---------------------------------------------------------------------------
# Packed-32 forward kernel (skip-rx variant only: the headline config)
# ---------------------------------------------------------------------------

def _kernel32(cgty_ref, sgty_ref, cgtz_ref, sgtz_ref, amp_ref, cpsi_ref,
              spsi_ref, com_ref, som_ref, h_ref, *, tx_shape, n_k, l1,
              mm_dtype):
    """Forward kernel on the [ug, ..., G*32] dense layout.

    Row j lane (r*32 + p) is user (block, r, j), path p (p < 25; pad
    lanes carry amp = 0). All per-path stages run dense; the path-sum
    runs G dots, each contracting one 32-lane slice of the operands.
    """
    amp = amp_ref[:]                       # [ug, 1, 128]
    ug = amp.shape[0]
    n_s = cpsi_ref.shape[1]

    er, ei = R._response(cgty_ref[:], sgty_ref[:], cgtz_ref[:], sgtz_ref[:],
                         *tx_shape)        # [ug, t, 128] (skip-rx: E = atx)
    gr, gi = R._ofdm_tables(cpsi_ref[:], spsi_ref[:], com_ref[:],
                            som_ref[:], amp, n_k, l1)   # [ug, sk, 128]

    q = tx_shape[0] * tx_shape[1]
    sk = n_s * n_k
    dn = (((2,), (2,)), ((0,), (0,)))
    prep, dot = R._dot_mode(mm_dtype, dn)
    e2 = jnp.concatenate((er, ei), axis=1)          # [ug, 2q, 128]
    g2 = jnp.concatenate((gr, gi), axis=1)          # [ug, 2sk, 128]

    for res in range(G):
        lo = res * PP
        e2r = prep(e2[:, :, lo:lo + PP])            # 32-aligned lane slice
        g2r = prep(g2[:, :, lo:lo + PP])
        m = dot(e2r, g2r)                           # [ug, 2q, 2sk]
        rows = slice(res * ug, (res + 1) * ug)
        rolled = pltpu.roll(m[:, q:, :], sk, axis=2)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
        h_ref[rows] = m[:, :q, :] + jnp.where(lane2 < sk, -rolled, rolled)


def pack32(x, nb, ug):
    """[nb*G*ug, (S,) P] -> [nb*ug, (S,) G*32] (user r contiguous rows)."""
    mid = x.shape[1:-1]
    p = x.shape[-1]
    y = x.reshape((nb, G, ug) + mid + (p,))
    perm = (0, 2) + tuple(range(3, 3 + len(mid))) + (1, 3 + len(mid))
    y = y.transpose(perm)
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, PP - p)])
    return y.reshape((nb * ug,) + mid + (G * PP,))


def fwd32(gty, gtz, amp, psi, omega, user_tile, interpret=False,
          mm_dtype="float32"):
    u, p = amp.shape
    n_s = psi.shape[1] // p
    ug = user_tile // G
    nb = u // user_tile
    q = TX[0] * TX[1]
    sk = n_s * N_K

    args = R._trig_args(None, None, gty, gtz, amp, psi, omega, skip_rx=True)
    args = [pack32(x, nb, ug) for x in args]

    spec_up = pl.BlockSpec((ug, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_psi = pl.BlockSpec((ug, n_s, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_amp = pl.BlockSpec((ug, 1, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((user_tile, q, 2 * sk), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel32, tx_shape=TX, n_k=N_K, l1=L1,
                             mm_dtype=mm_dtype)
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
    )(*args)


def timed_readback(h):
    """Sync via scalar readback (block_until_ready unreliable on relay)."""
    return float(jax.device_get(h[-1, -1, -1]))


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.uniform(-3, 3, s).astype(np.float32))
    gty, gtz = mk(U, P), mk(U, P)
    amp = jnp.abs(mk(U, P)) * 1e-4
    psi = mk(U, P)
    omega = jnp.abs(mk(U, P)) * 0.1

    # relay round trip
    tiny = jax.jit(lambda x: x * 1.000001)(jnp.ones((8, 128)))
    t_rt = min(_t(lambda: float(jax.device_get(tiny[0, 0])))
               for _ in range(5))
    log(f"relay rt = {t_rt * 1e3:.1f} ms")

    out_gb = U * 64 * 128 * 4 / 1e9

    # -- E1: current production kernel, ut sweep under the new vmem limit
    for ut in (64, 128, 256):
        try:
            f = jax.jit(lambda a, b, c, d, e, g, w, _ut=ut: R.fused_render(
                a, b, c, d, e, g, w, RX, TX, N_K, _ut, False, "float32",
                True))
            h = f(gty * 0, gtz * 0, gty, gtz, amp, psi, omega)
            timed_readback(h)
            dt = min(_t(lambda: timed_readback(f(
                gty * 0, gtz * 0, gty, gtz, amp, psi, omega)))
                for _ in range(3)) - t_rt
            log(f"E1 production ut={ut:3d}: {dt * 1e3:7.2f} ms  "
                f"{U / dt / 1e6:6.2f} M users/s  {out_gb / dt:5.0f} GB/s")
        except Exception as e:
            log(f"E1 production ut={ut}: FAILED {str(e).splitlines()[0][:120]}")

    # -- E2: packed-32 kernel, ut sweep
    for ut in (64, 128, 256):
        try:
            f = jax.jit(lambda a, b, c, d, e, _ut=ut: fwd32(
                a, b, c, d, e, _ut))
            h = f(gty, gtz, amp, psi, omega)
            timed_readback(h)
            dt = min(_t(lambda: timed_readback(f(gty, gtz, amp, psi,
                                                 omega)))
                     for _ in range(3)) - t_rt
            log(f"E2 packed-32  ut={ut:3d}: {dt * 1e3:7.2f} ms  "
                f"{U / dt / 1e6:6.2f} M users/s  {out_gb / dt:5.0f} GB/s")
        except Exception as e:
            log(f"E2 packed-32  ut={ut}: FAILED {str(e).splitlines()[0][:120]}")

    # correctness spot-check vs production (small slice)
    n = 512
    hp = R.fused_render(gty[:n] * 0, gtz[:n] * 0, gty[:n], gtz[:n],
                        amp[:n], psi[:n], omega[:n], RX, TX, N_K,
                        user_tile=64, interpret=False, mm_dtype="float32",
                        packed=True)
    h32 = fwd32(gty[:n], gtz[:n], amp[:n], psi[:n], omega[:n], 64)
    d = float(jnp.max(jnp.abs(hp - h32)))
    s = float(jnp.max(jnp.abs(hp)))
    log(f"parity: max|diff| = {d:.3e} (scale {s:.3e})")


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()

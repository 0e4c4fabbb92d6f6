"""Speed-of-light accounting probe for the fused render kernel (round 3).

Measures, in ONE TPU process (results feed benchmarks/SOL.md):

  A. relay round-trip (the only honest sync is a scalar readback)
  B. output-DMA floor: kernel that only writes the packed H tile
  C. stage bisect of the CURRENT kernel (trig-hoisted prologue + packed
     layout): full / bf16 dot / nopanel / notables / nodot /
     noreassemble, all sharing the real XLA trig prologue
  D. user-tile sweep (ut = 32 / 64 / 128 / 256)
  P. prologue cost: trig args alone (XLA sincos over [U, P] arrays)
  E. dispatch patterns: fori_loop sweep (bench.py r2) vs 12 separate
     donated dispatches (the product-API pattern, bench.py r3)

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
          python -u benchmarks/perf_sol.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SMOKE = bool(int(os.environ.get("SMOKE", "0")))   # CPU interpret-mode check
if SMOKE:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepmimo_tpu.ops.pallas.render import (
    _panel_er_ei, _ofdm_tables, _trig_args, _best_l1, _ceil_to)

N_UE = 512 if bool(int(os.environ.get("SMOKE", "0"))) else 131_072
N_CHUNKS = 2 if bool(int(os.environ.get("SMOKE", "0"))) else 12
P = 25
RX_SHAPE = (1, 1)
TX_SHAPE = (8, 8)
N_K = 64
SK = N_K          # n_s = 1
Q = 64


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# --------------------------------------------------------------------------
# Ablated variants of ops/pallas/render.py:_kernel (current signatures:
# _panel_er_ei(trig_rx_4tuple, trig_tx_4tuple, rx_shape, tx_shape),
# _ofdm_tables(cpsi, spsi, com, som, scale, n_k, l1); the 13 kernel inputs
# are the _trig_args prologue outputs).
# --------------------------------------------------------------------------

def _kernel(cgry_ref, sgry_ref, cgrz_ref, sgrz_ref, cgty_ref, sgty_ref,
            cgtz_ref, sgtz_ref, amp_ref, cpsi_ref, spsi_ref, com_ref,
            som_ref, h_ref, *, variant, l1):
    f32 = jnp.float32
    amp = amp_ref[:]
    ut, p = amp.shape

    if variant == "writeonly":
        # Pure output-DMA floor: constant fill, inputs unread.
        h_ref[:] = jnp.full((ut, Q, 2 * SK), 1.2345, f32)
        return

    if variant == "nopanel":
        base = cgty_ref[:]                                  # [ut, p]
        er = jnp.broadcast_to(base[:, None, :] * 0.5 + 1.0, (ut, Q, p))
        ei = jnp.broadcast_to(base[:, None, :] * 0.25, (ut, Q, p))
    else:
        er, ei, _, _ = _panel_er_ei(
            (cgry_ref[:], sgry_ref[:], cgrz_ref[:], sgrz_ref[:]),
            (cgty_ref[:], sgty_ref[:], cgtz_ref[:], sgtz_ref[:]),
            RX_SHAPE, TX_SHAPE)

    if variant == "notables":
        b2 = cpsi_ref[:].reshape(ut, 1, 1, p)               # [ut,1,1,p]
        gr = jnp.broadcast_to(amp[:, None, :] * 0.5 + b2[:, 0], (ut, SK, p))
        gi = jnp.broadcast_to(amp[:, None, :] * 0.25, (ut, SK, p))
    else:
        gr, gi = _ofdm_tables(cpsi_ref[:], spsi_ref[:], com_ref[:],
                              som_ref[:], amp, N_K, l1)

    if variant == "nodot":
        # Consume er/ei and gr/gi (so nothing is DCE'd) but skip the MXU
        # dot: cheap row/col reductions + an output-sized broadcast.
        s_e = (er + ei).sum(axis=2, keepdims=True)           # [ut, Q, 1]
        s_g = (gr + gi).sum(axis=1, keepdims=True)           # [ut, 1, P]
        h_ref[:] = jnp.broadcast_to(
            s_e + s_g[:, :, :1], (ut, Q, 2 * SK)).astype(f32)
        return

    dn = (((2,), (2,)), ((0,), (0,)))
    cast = (lambda x: x.astype(jnp.bfloat16)) if variant == "bf16" \
        else (lambda x: x)
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=f32)
    e2 = cast(jnp.concatenate((er, ei), axis=1))
    g2 = cast(jnp.concatenate((gr, gi), axis=1))
    m = dot(e2, g2)
    if variant == "noreassemble":
        h_ref[:] = jnp.concatenate((m[:, :Q, :], m[:, Q:, :]), axis=2)[
            :, :, : 2 * SK]
        return
    rolled = pltpu.roll(m[:, Q:, :], SK, axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
    h_ref[:] = m[:, :Q, :] + jnp.where(lane < SK, -rolled, rolled)


def build(variant, ut):
    grid = (N_UE // ut,)
    spec_up = pl.BlockSpec((ut, P), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_psi = pl.BlockSpec((ut, 1, P), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ut, Q, 2 * SK), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, variant=variant, l1=_best_l1(N_K))

    def run(gry, grz, gty, gtz, amp, psi, omega):
        args = _trig_args(gry, grz, gty, gtz, amp,
                          psi.reshape(N_UE, P), omega)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[spec_up] * 9 + [spec_psi] * 2 + [spec_up] * 2,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((N_UE, Q, 2 * SK), jnp.float32),
            interpret=SMOKE,
        )(*args)
    return jax.jit(run)


def build_prologue_only():
    """The XLA trig prologue alone (reduced to a tiny output)."""
    def run(gry, grz, gty, gtz, amp, psi, omega):
        args = _trig_args(gry, grz, gty, gtz, amp,
                          psi.reshape(N_UE, P), omega)
        return sum(a.sum() for a in args)
    return jax.jit(run)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(7)
    mk = lambda lo, hi: jax.device_put(jnp.asarray(
        rng.uniform(lo, hi, (N_UE, P)), jnp.float32))
    args = (mk(-3, 3), mk(-3, 3), mk(-3, 3), mk(-3, 3),
            mk(0, 1e-4), mk(-3, 3), mk(0, 6))
    log("data on device")

    # --- A. relay round-trip ---
    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"A relay rt = {t_rt*1e3:.2f} ms")

    # --- P. prologue cost ---
    fp = build_prologue_only()
    o = fp(*args)
    float(jax.device_get(o))
    best = min(_timed(lambda: float(jax.device_get(fp(*args))))
               for _ in range(3))
    log(f"P prologue-only: {max(best - t_rt, 0)*1e3:.2f} ms")

    # --- B/C/D. kernel variants ---
    def sweep_fn(fn):
        o = fn(*args)
        float(jax.device_get(o[-1, 0, -1]))
    out_gb = N_UE * Q * 2 * SK * 4 / 1e9
    for variant, ut in [("writeonly", 64), ("full", 32), ("full", 64),
                        ("full", 128), ("full", 256), ("bf16", 64),
                        ("bf16", 128), ("nopanel", 64),
                        ("notables", 64), ("nodot", 64),
                        ("noreassemble", 64)]:
        try:
            fn = build(variant, ut)
            o = fn(*args)
            float(jax.device_get(o[-1, 0, -1]))
            del o
            best = min(_timed(lambda: sweep_fn(fn)) for _ in range(3))
            dt = max(best - t_rt, 1e-9)
            log(f"BCD {variant:12s} ut={ut:3d} dev={dt*1e3:8.2f} ms  "
                f"{N_UE/dt/1e6:6.2f} M users/s  {out_gb/dt:7.1f} GB/s out")
        except Exception as e:
            log(f"BCD {variant} ut={ut} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:100]}")

    # --- E. dispatch patterns (product API vs fori_loop) ---
    from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
    from deepmimo_tpu.ops.channel import render_channels_planes

    cfg = ChannelConfig(bs_shape=TX_SHAPE, ue_shape=RX_SHAPE,
                        freq_domain=True, subcarriers=512,
                        selected_subcarriers=tuple(range(N_K)),
                        bandwidth=10e6, num_paths=P, dtype="complex64",
                        backend="fused", planes_layout="packed")
    bs = AntennaPanel.make()
    ue = AntennaPanel.make()

    def mkpd(seed):
        r = np.random.RandomState(seed)
        m = lambda lo, hi: r.uniform(lo, hi, (N_UE, P)).astype(np.float32)
        return jax.device_put(PathData(
            power_dbw=jnp.asarray(m(-130, -60)),
            phase_deg=jnp.asarray(m(-180, 180)),
            delay_s=jnp.asarray(m(1e-7, 4e-6)),
            aoa_az_deg=jnp.asarray(m(-180, 180)),
            aoa_el_deg=jnp.asarray(m(0, 180)),
            aod_az_deg=jnp.asarray(m(-180, 180)),
            aod_el_deg=jnp.asarray(m(0, 180)),
            valid=jnp.ones((N_UE, P), bool)))
    pds = [mkpd(i) for i in range(N_CHUNKS)]
    log("E path data on device")

    # E1: fori_loop sweep over one big concatenated PathData (bench r2)
    big_pd = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *pds)

    def render_job(p, b, u, h0):
        def body(i, h):
            pc = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(
                    x, i * N_UE, N_UE, axis=0), p)
            return render_channels_planes(pc, b, u, cfg)
        return jax.lax.fori_loop(0, N_CHUNKS, body, h0)

    render_loop = jax.jit(render_job, donate_argnums=(3,))
    h = jnp.zeros((N_UE, 1, Q, 2 * SK), jnp.float32)
    h = render_loop(big_pd, bs, ue, h)
    float(jax.device_get(h[-1, 0, -1, -1]))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        h = render_loop(big_pd, bs, ue, h)
        float(jax.device_get(h[-1, 0, -1, -1]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    dt = max(best - t_rt, 1e-9)
    tot = N_UE * N_CHUNKS
    log(f"E1 fori_loop sweep: dev={dt*1e3:.1f} ms  "
        f"{tot/dt/1e6:.2f} M users/s")
    del h, big_pd

    # E2: 12 separate donated dispatches (the product-API pattern)
    @functools.partial(jax.jit, donate_argnums=(3,))
    def render_one(p, b, u, h_prev):
        del h_prev
        return render_channels_planes(p, b, u, cfg)

    h = jnp.zeros((N_UE, 1, Q, 2 * SK), jnp.float32)
    h = render_one(pds[0], bs, ue, h)
    float(jax.device_get(h[-1, 0, -1, -1]))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for pd in pds:
            h = render_one(pd, bs, ue, h)
        float(jax.device_get(h[-1, 0, -1, -1]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    dt = max(best - t_rt, 1e-9)
    log(f"E2 12 donated dispatches: dev={dt*1e3:.1f} ms  "
        f"{tot/dt/1e6:.2f} M users/s")

    log("DONE")


if __name__ == "__main__":
    main()

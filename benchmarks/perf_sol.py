"""Speed-of-light accounting probe for the fused render kernel (round 3).

Measures, in ONE TPU process (results feed benchmarks/SOL.md):

  A. relay round-trip + host-transfer bandwidth (device_get roofline)
  B. output-DMA floor: kernel that only writes the packed H tile
  C. stage bisect of the CURRENT kernel (packed layout + sincos
     recurrences): full / bf16 dot / notrig / nopanel / notables /
     nodot / noreassemble
  D. user-tile sweep (ut = 32 / 64 / 128 / 256)
  E. dispatch patterns: fori_loop sweep (bench.py r2) vs 12 separate
     donated dispatches (the product-API pattern for bench.py r3)

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
          python -u benchmarks/perf_sol.py
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

from deepmimo_tpu.ops.pallas.render import (
    _panel_er_ei, _ofdm_tables, _best_l1, _ceil_to)

N_UE = 131_072
N_CHUNKS = 12
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
# Ablated kernel variants (local copies of ops/pallas/render.py:_kernel math)
# --------------------------------------------------------------------------

def _kernel(gry_ref, grz_ref, gty_ref, gtz_ref, amp_ref, psi_ref, omega_ref,
            h_ref, *, variant, l1):
    f32 = jnp.float32
    amp, omega = amp_ref[:], omega_ref[:]
    psi_s = psi_ref[:]
    ut, p = amp.shape

    if variant == "writeonly":
        h_ref[:] = jnp.broadcast_to(amp[:, :1, None] * 0.5 + 1.0,
                                    (ut, Q, 2 * SK)).astype(f32)
        return

    if variant in ("nopanel", "notrig"):
        def fake_stacked(base, m, axis):
            cs = [base * (0.1 * i) + 1.0 for i in range(m)]
            ss = [base * (0.05 * i) for i in range(m)]
            return jnp.stack(cs, axis=axis), jnp.stack(ss, axis=axis)
        er, ei, _, _ = _panel_er_ei_fake(gry_ref[:], grz_ref[:], gty_ref[:],
                                         gtz_ref[:], fake_stacked)
    else:
        er, ei, _, _ = _panel_er_ei(gry_ref[:], grz_ref[:], gty_ref[:],
                                    gtz_ref[:], RX_SHAPE, TX_SHAPE)

    if variant in ("notables", "notrig"):
        gr, gi = _tables_fake(psi_s, omega, amp, N_K, l1)
    else:
        gr, gi = _ofdm_tables(psi_s, omega, amp, N_K, l1)

    if variant == "nodot":
        # Consume er/ei and gr/gi (so no trig work is DCE'd) but skip the
        # MXU dot: cheap row/col reductions + an output-sized broadcast.
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


def _panel_er_ei_fake(gry, grz, gty, gtz, fake_stacked):
    """Panel outer product with sincos replaced by linear ops."""
    ut, p = gty.shape
    m1, m2 = TX_SHAPE
    cm, sm = fake_stacked(gty, m1, 1)
    cn, sn = fake_stacked(gtz, m2, 1)
    re = cn[:, :, None, :] * cm[:, None, :, :] - \
        sn[:, :, None, :] * sm[:, None, :, :]
    im = cn[:, :, None, :] * sm[:, None, :, :] + \
        sn[:, :, None, :] * cm[:, None, :, :]
    return (re.reshape(ut, m1 * m2, p), im.reshape(ut, m1 * m2, p),
            None, None)


def _tables_fake(psi_s, omega, scale, n_k, l1):
    """OFDM tables with all sincos replaced by linear ops (same shapes)."""
    ut, n_s, p = psi_s.shape
    l2 = n_k // l1
    cr = psi_s * 0.5 + 1.0
    ci = psi_s * 0.25
    if scale is not None:
        cr = scale[:, None, :] * cr
        ci = scale[:, None, :] * ci
    mk = lambda m: (jnp.stack([omega * (0.1 * i) + 1.0 for i in range(m)],
                              axis=1),
                    jnp.stack([omega * (0.05 * i) for i in range(m)], axis=1))
    c1, s1 = mk(l1)
    c2, s2 = mk(l2)
    t2r = cr[:, :, None, :] * c2[:, None] - ci[:, :, None, :] * s2[:, None]
    t2i = cr[:, :, None, :] * s2[:, None] + ci[:, :, None, :] * c2[:, None]
    gr = (t2r[:, :, :, None, :] * c1[:, None, None, :, :] -
          t2i[:, :, :, None, :] * s1[:, None, None, :, :]
          ).reshape(ut, n_s * n_k, p)
    gi = (t2r[:, :, :, None, :] * s1[:, None, None, :, :] +
          t2i[:, :, :, None, :] * c1[:, None, None, :, :]
          ).reshape(ut, n_s * n_k, p)
    return gr, gi


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
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[spec_up] * 5 + [spec_psi, spec_up],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((N_UE, Q, 2 * SK), jnp.float32),
        )(gry, grz, gty, gtz, amp, psi.reshape(N_UE, 1, P), omega)
    return jax.jit(run)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(7)
    mk = lambda lo, hi: jax.device_put(jnp.asarray(
        rng.uniform(lo, hi, (N_UE, P)), jnp.float32))
    args = (mk(-3, 3), mk(-3, 3), mk(-3, 3), mk(-3, 3),
            mk(0, 1e-4), mk(-3, 3), mk(0, 6))
    log("data on device")

    # --- A. relay RT + host transfer bandwidth ---
    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda x: jnp.sum(x * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"A relay rt = {t_rt*1e3:.2f} ms")

    for mb in (64, 256, 1024):
        n = mb * 2**20 // (128 * 4)
        big = jax.device_put(jnp.ones((n, 128), jnp.float32))
        np.asarray(jax.device_get(big))  # warm
        t = min(_timed(lambda: np.asarray(jax.device_get(big)))
                for _ in range(3))
        log(f"A device_get {mb} MiB: {t*1e3:.1f} ms -> "
            f"{mb/1024/t:.3f} GiB/s")
        del big

    # --- B/C/D. kernel variants ---
    def sweep_fn(fn):
        o = fn(*args)
        float(jax.device_get(o[-1, 0, -1]))
    out_gb = N_UE * Q * 2 * SK * 4 / 1e9
    for variant, ut in [("writeonly", 64), ("full", 32), ("full", 64),
                        ("full", 128), ("full", 256), ("bf16", 64),
                        ("bf16", 128), ("notrig", 64), ("nopanel", 64),
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

"""Measure hot-path variants on the real TPU: einsum associations + dtypes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/perf_variants.py
One process at a time (single tunneled chip).
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

U, P, R, T, K = 16384, 25, 1, 64, 64
N_FFT = 512


def make_inputs(seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.uniform(-1, 1, s), dtype=dtype)
    amp = mk(U, P)
    psi = mk(U, P)
    dn = jnp.asarray(rng.uniform(0, N_FFT, (U, P)), dtype=dtype)
    aoa_t, aoa_p = mk(U, P), mk(U, P)
    aod_t, aod_p = mk(U, P), mk(U, P)
    ks = jnp.arange(K, dtype=dtype)
    return amp, psi, dn, aoa_t, aoa_p, aod_t, aod_p, ks


def a_resp(theta, phi, n_ant, spacing=0.5):
    kd = 2 * jnp.pi * spacing
    ky = kd * jnp.sin(theta) * jnp.sin(phi)
    kz = kd * jnp.cos(theta)
    idx = jnp.arange(n_ant, dtype=theta.dtype)
    ph = idx[None, :, None] * ky[:, None, :]  # [U, A, P] (linear array in y)
    del kz
    return jnp.exp(1j * ph)


def variant_current(inputs):
    """Two-step: E=outer(a_rx,a_tx) then batched matmul with g."""
    amp, psi, dn, aoa_t, aoa_p, aod_t, aod_p, ks = inputs
    a_rx = a_resp(aoa_t, aoa_p, R)
    a_tx = a_resp(aod_t, aod_p, T)
    g = (amp[..., None] *
         jnp.exp(1j * (psi[..., None] -
                       (2 * jnp.pi / N_FFT) * dn[..., None] * ks)))
    e = (a_rx[:, :, None, :] * a_tx[:, None, :, :]).reshape(U, R * T, P)
    h = jnp.einsum("uqp,upk->uqk", e, g.astype(e.dtype),
                   preferred_element_type=jnp.complex64)
    return h.reshape(U, R, T, K)


def variant_free(inputs):
    """Single einsum; XLA picks the contraction order."""
    amp, psi, dn, aoa_t, aoa_p, aod_t, aod_p, ks = inputs
    a_rx = a_resp(aoa_t, aoa_p, R)
    a_tx = a_resp(aod_t, aod_p, T)
    g = (amp[..., None] *
         jnp.exp(1j * (psi[..., None] -
                       (2 * jnp.pi / N_FFT) * dn[..., None] * ks)))
    return jnp.einsum("urp,utp,upk->urtk", a_rx, a_tx, g.astype(a_rx.dtype))


def variant_planes(inputs):
    """Real/imag planes as explicit f32 matmuls (no complex lowering)."""
    amp, psi, dn, aoa_t, aoa_p, aod_t, aod_p, ks = inputs
    a_rx = a_resp(aoa_t, aoa_p, R)
    a_tx = a_resp(aod_t, aod_p, T)
    e = (a_rx[:, :, None, :] * a_tx[:, None, :, :]).reshape(U, R * T, P)
    er, ei = jnp.real(e), jnp.imag(e)
    base = psi[..., None] - (2 * jnp.pi / N_FFT) * dn[..., None] * ks
    gr = amp[..., None] * jnp.cos(base)
    gi = amp[..., None] * jnp.sin(base)
    mm = lambda a, b: jnp.einsum("uqp,upk->uqk", a, b,
                                 preferred_element_type=jnp.float32)
    hr = mm(er, gr) - mm(ei, gi)
    hi = mm(er, gi) + mm(ei, gr)
    return (hr + 1j * hi).reshape(U, R, T, K)


def variant_planes_bf16(inputs):
    """bf16 inputs, f32 accumulation."""
    amp, psi, dn, aoa_t, aoa_p, aod_t, aod_p, ks = inputs
    a_rx = a_resp(aoa_t, aoa_p, R)
    a_tx = a_resp(aod_t, aod_p, T)
    e = (a_rx[:, :, None, :] * a_tx[:, None, :, :]).reshape(U, R * T, P)
    er = jnp.real(e).astype(jnp.bfloat16)
    ei = jnp.imag(e).astype(jnp.bfloat16)
    base = psi[..., None] - (2 * jnp.pi / N_FFT) * dn[..., None] * ks
    gr = (amp[..., None] * jnp.cos(base)).astype(jnp.bfloat16)
    gi = (amp[..., None] * jnp.sin(base)).astype(jnp.bfloat16)
    mm = lambda a, b: jnp.einsum("uqp,upk->uqk", a, b,
                                 preferred_element_type=jnp.float32)
    hr = mm(er, gr) - mm(ei, gi)
    hi = mm(er, gi) + mm(ei, gr)
    return (hr + 1j * hi).reshape(U, R, T, K)


def bench(name, fn, inputs, n=8):
    jfn = jax.jit(fn)
    out = jfn(inputs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(inputs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:22s} {dt*1e3:8.2f} ms  {U/dt/1e6:8.2f} M users/s",
          flush=True)
    return dt


if __name__ == "__main__":
    inputs = make_inputs()
    print(f"U={U} P={P} R={R} T={T} K={K}", flush=True)
    r0 = bench("current(two-step c64)", variant_current, inputs)
    bench("free-einsum c64", variant_free, inputs)
    bench("planes f32", variant_planes, inputs)
    bench("planes bf16", variant_planes_bf16, inputs)

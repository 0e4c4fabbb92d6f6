"""Gradient correctness: autodiff through the renderer vs finite differences.

The BASELINE target is allclose on "pixel-analog gradients" dH/d-path-params;
here we probe d(loss)/d(param) for a random fixed cotangent, which validates
the full VJP.
"""

import numpy as np
import jax
import jax.numpy as jnp

from deepmimo_tpu.ops.types import PathData, AntennaPanel, ChannelConfig
from deepmimo_tpu.ops.channel import render_channels
from oracle import make_synthetic_paths


def _setup(seed=0, **cfg_kw):
    data = make_synthetic_paths(n_ue=6, max_paths=5, seed=seed)
    paths = PathData.from_numpy(
        power=data["power"], phase=data["phase"], delay=data["delay"],
        aoa_az=data["aoa_az"], aoa_el=data["aoa_el"],
        aod_az=data["aod_az"], aod_el=data["aod_el"], dtype=jnp.float64)
    base = dict(bs_shape=(4, 1), ue_shape=(2, 1), freq_domain=True,
                subcarriers=64, selected_subcarriers=(0, 9),
                num_paths=5, dtype="complex128")
    base.update(cfg_kw)
    cfg = ChannelConfig(**base)
    bs = AntennaPanel.make((10.0, 5.0, -30.0), 0.5, dtype=jnp.float64)
    ue = AntennaPanel.make((0.0, 15.0, 45.0), 0.5, dtype=jnp.float64)
    rng = np.random.RandomState(123)
    h0 = render_channels(paths, bs, ue, cfg)
    cot = jnp.asarray(rng.normal(size=h0.shape) +
                      1j * rng.normal(size=h0.shape))
    return paths, bs, ue, cfg, cot


def _loss_fn(cfg, cot):
    def loss(paths, bs, ue):
        h = render_channels(paths, bs, ue, cfg)
        return jnp.real(jnp.vdot(cot, h))
    return loss


def _fd_check(f, args, grads, which, eps=1e-6, rtol=2e-4, atol=1e-10,
              n_probe=8):
    """Compare autodiff grads against central finite differences on a few
    random coordinates of argument ``which``."""
    rng = np.random.RandomState(7)
    arr = np.asarray(getattr(args[which[0]], which[1]) if which[1]
                     else args[which[0]], dtype=np.float64)
    g = np.asarray(getattr(grads[which[0]], which[1]) if which[1]
                   else grads[which[0]], dtype=np.float64)
    flat_idx = rng.choice(arr.size, size=min(n_probe, arr.size),
                          replace=False)
    # Scale for gradient magnitudes (avoid relative checks near zero)
    gscale = max(np.abs(g).max(), 1e-30)
    for fi in flat_idx:
        idx = np.unravel_index(fi, arr.shape)

        def perturbed(delta):
            new_arr = arr.copy()
            new_arr[idx] += delta
            new_args = list(args)
            if which[1]:
                obj = args[which[0]]
                new_args[which[0]] = obj.__class__(**{
                    **{f: getattr(obj, f) for f in obj.__dataclass_fields__},
                    which[1]: jnp.asarray(new_arr)})
            else:
                new_args[which[0]] = jnp.asarray(new_arr)
            return float(f(*new_args))

        fd = (perturbed(eps) - perturbed(-eps)) / (2 * eps)
        ad = g[idx]
        assert abs(fd - ad) <= rtol * gscale + atol, \
            f"{which}: fd={fd} vs ad={ad} at {idx} (scale {gscale})"


def test_grads_wrt_path_params():
    paths, bs, ue, cfg, cot = _setup(seed=30)
    loss = _loss_fn(cfg, cot)
    grads = jax.grad(loss, argnums=(0, 1, 2), allow_int=True)(paths, bs, ue)
    args = (paths, bs, ue)
    for field in ("power_dbw", "phase_deg", "aoa_az_deg",
                  "aoa_el_deg", "aod_az_deg", "aod_el_deg"):
        _fd_check(loss, args, grads, (0, field))
    # Delays need a tiny step: phase sensitivity is ~2 pi k / (N Ts) rad/s
    _fd_check(loss, args, grads, (0, "delay_s"), eps=1e-11)


def test_grads_wrt_array_geometry():
    paths, bs, ue, cfg, cot = _setup(seed=31)
    loss = _loss_fn(cfg, cot)
    grads = jax.grad(loss, argnums=(0, 1, 2), allow_int=True)(paths, bs, ue)
    args = (paths, bs, ue)
    _fd_check(loss, args, grads, (1, "rotation_deg"))
    _fd_check(loss, args, grads, (1, "spacing"))
    _fd_check(loss, args, grads, (2, "rotation_deg"))
    _fd_check(loss, args, grads, (2, "spacing"))


def test_grads_with_dipole_and_fov():
    paths, bs, ue, cfg, cot = _setup(
        seed=32, bs_pattern="halfwave-dipole", ue_pattern="halfwave-dipole",
        bs_fov=(200.0, 160.0))
    loss = _loss_fn(cfg, cot)
    grads = jax.grad(loss, argnums=(0, 1, 2), allow_int=True)(paths, bs, ue)
    args = (paths, bs, ue)
    for field in ("power_dbw", "phase_deg", "aod_el_deg"):
        _fd_check(loss, args, grads, (0, field))
    # All gradients must be finite (masking, not NaNs)
    for leaf in jax.tree_util.tree_leaves(grads):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.inexact):
            assert np.all(np.isfinite(arr))


def test_grads_masked_paths_are_zero():
    """Padded (invalid) path slots must receive exactly zero gradient."""
    paths, bs, ue, cfg, cot = _setup(seed=33)
    loss = _loss_fn(cfg, cot)
    gp = jax.grad(loss, allow_int=True)(paths, bs, ue)
    invalid = ~np.asarray(paths.valid)
    for field in ("power_dbw", "phase_deg", "delay_s", "aoa_az_deg",
                  "aoa_el_deg", "aod_az_deg", "aod_el_deg"):
        g = np.asarray(getattr(gp, field))
        assert np.all(g[invalid] == 0), field


def test_time_domain_grads_finite():
    paths, bs, ue, cfg, cot = _setup(seed=34, freq_domain=False)
    # cot shape differs in TD; rebuild
    h = render_channels(paths, bs, ue, cfg)
    rng = np.random.RandomState(5)
    cot = jnp.asarray(rng.normal(size=h.shape) +
                      1j * rng.normal(size=h.shape))
    loss = _loss_fn(cfg, cot)
    grads = jax.grad(loss, argnums=(0, 1, 2), allow_int=True)(paths, bs, ue)
    for leaf in jax.tree_util.tree_leaves(grads):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.inexact):
            assert np.all(np.isfinite(arr))
    _fd_check(loss, (paths, bs, ue), grads, (0, "phase_deg"))

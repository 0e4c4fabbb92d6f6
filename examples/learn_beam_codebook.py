"""Example: learn a BS beam codebook by differentiating through the renderer.

Gradient-based codebook design: maximize the worst-user beamforming gain
over a scenario by optimizing N_BEAMS phase-only precoding vectors jointly
with the array geometry. Demonstrates the framework's end-to-end
differentiability (channels -> beam gains -> loss -> gradients w.r.t.
codebook AND antenna spacing).

Run: python examples/learn_beam_codebook.py  [--tpu]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) backend")
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from oracle import make_synthetic_paths
    from deepmimo_tpu.ops.types import (PathData, AntennaPanel,
                                        ChannelConfig)
    from deepmimo_tpu.ops.channel import render_channels

    N_BEAMS, N_ANT, N_UE = 16, 64, 512

    data = make_synthetic_paths(n_ue=N_UE, max_paths=10, seed=1)
    paths = PathData.from_numpy(
        power=data["power"], phase=data["phase"], delay=data["delay"],
        aoa_az=data["aoa_az"], aoa_el=data["aoa_el"],
        aod_az=data["aod_az"], aod_el=data["aod_el"], dtype=jnp.float32)
    cfg = ChannelConfig(bs_shape=(N_ANT, 1), ue_shape=(1, 1),
                        freq_domain=True, subcarriers=512,
                        selected_subcarriers=(0,), num_paths=10)
    ue = AntennaPanel.make()

    def beam_gains(phases, spacing):
        """[N_UE, N_BEAMS] beamforming gains."""
        bs = AntennaPanel(rotation_deg=jnp.zeros(3), spacing=spacing)
        h = render_channels(paths, bs, ue, cfg)[:, 0, :, 0]  # [U, T]
        codebook = jnp.exp(1j * phases) / jnp.sqrt(N_ANT)    # [B, T]
        return jnp.abs(h @ codebook.T.conj()) ** 2           # [U, B]

    def loss(params):
        phases, spacing = params
        g = beam_gains(phases, spacing)
        best = jnp.max(g, axis=1)          # each user's best-beam gain
        # log utility: proportional fairness across users
        return -jnp.mean(jnp.log(best + 1e-18))

    rng = np.random.RandomState(0)
    params = (jnp.asarray(rng.uniform(0, 2 * np.pi, (N_BEAMS, N_ANT)),
                          dtype=jnp.float32),
              jnp.asarray(0.5, dtype=jnp.float32))

    value_and_grad = jax.jit(jax.value_and_grad(loss))
    lr_phase, lr_spacing = 0.3, 1e-3
    for step in range(args.steps):
        val, (g_phase, g_spacing) = value_and_grad(params)
        params = (params[0] - lr_phase * g_phase,
                  params[1] - lr_spacing * g_spacing)
        if step % 10 == 0 or step == args.steps - 1:
            gains = beam_gains(*params)
            served = float(jnp.mean(jnp.max(gains, axis=1)) /
                           jnp.mean(jnp.abs(gains)))
            print(f"step {step:4d}  loss={float(val):+.4f}  "
                  f"spacing={float(params[1]):.4f}  "
                  f"mean-best/mean gain={served:.2f}x", flush=True)

    # Serving: evaluate the LEARNED codebook over the scenario through
    # the fused render->consume kernel — the codebook folds into the
    # path-sum and H is never materialized (ops/pallas/beamgain.py;
    # benchmarks/run_beamgain_bench.py measures the speedup vs
    # render-then-read at 131k users).
    from deepmimo_tpu.ops.channel import render_beam_gains
    phases, spacing = params
    w = np.exp(1j * np.asarray(phases)) / np.sqrt(N_ANT)
    bs = AntennaPanel(rotation_deg=jnp.zeros(3), spacing=spacing)
    g_fused = render_beam_gains(
        paths, bs, ue, cfg,
        jnp.asarray(np.real(w), jnp.float32),
        jnp.asarray(np.imag(w), jnp.float32))    # [U, B, K]
    g_ref = beam_gains(*params)                  # [U, B] (K = 1 here)
    agree = float(jnp.mean(
        (jnp.argmax(g_fused[:, :, 0], axis=1) ==
         jnp.argmax(g_ref, axis=1)).astype(jnp.float32)))
    print(f"fused serving sweep: G{tuple(g_fused.shape)}, best-beam "
          f"agreement with the training-path gains: {agree:.3f}")
    assert agree > 0.99, "fused beam gains disagree with the train path"

    print("done — codebook learned through the differentiable renderer; "
          "served through the fused consumer kernel")


if __name__ == "__main__":
    main()

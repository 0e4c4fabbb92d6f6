"""Driver entry points stay healthy: single-chip compile + multichip dryrun."""

import sys

import numpy as np
import jax

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 2, 64, 64)
    assert out.dtype == np.complex64
    assert bool(jax.numpy.isfinite(jax.numpy.abs(out)).all())


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)

"""Can explicit (manual, double-buffered) output DMA beat Mosaic's ~170 GB/s
generated output pipeline? Writes the same 4.3 GB H buffer:

  mosaic  — writeonly kernel, Mosaic-managed output (baseline)
  manual  — out in ANY (HBM) space; kernel computes into a 2-slot VMEM
            scratch and issues pltpu.make_async_copy per grid step

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python -u benchmarks/perf_dma.py
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

N_UE = 131_072
Q = 64
N_K = 64
OUT_BYTES = 2 * N_UE * Q * N_K * 4


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def build_mosaic(ut):
    def kern(x_ref, h_ref):
        v = x_ref[:, :1]
        h_ref[0] = jnp.broadcast_to(v[:, :, None], (ut, Q, N_K))
        h_ref[1] = jnp.broadcast_to(v[:, :, None], (ut, Q, N_K))
    return jax.jit(lambda a: pl.pallas_call(
        kern, grid=(N_UE // ut,),
        in_specs=[pl.BlockSpec((ut, 25), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, ut, Q, N_K), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, N_UE, Q, N_K), jnp.float32))(a))


def build_manual(ut):
    n_steps = N_UE // ut

    def kern(x_ref, h_ref, scratch, sem):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)

        # Reusing a slot: wait for the copy started 2 steps ago.
        @pl.when(i >= 2)
        def _():
            pltpu.make_async_copy(
                scratch.at[slot],
                h_ref.at[:, pl.ds((i - 2) * ut, ut)],
                sem.at[slot]).wait()

        v = x_ref[:, :1]
        scratch[slot, 0] = jnp.broadcast_to(v[:, :, None], (ut, Q, N_K))
        scratch[slot, 1] = jnp.broadcast_to(v[:, :, None], (ut, Q, N_K))

        pltpu.make_async_copy(
            scratch.at[slot],
            h_ref.at[:, pl.ds(i * ut, ut)],
            sem.at[slot]).start()

        # Drain at the end.
        @pl.when(i == n_steps - 1)
        def _():
            pltpu.make_async_copy(
                scratch.at[slot], h_ref.at[:, pl.ds(i * ut, ut)],
                sem.at[slot]).wait()
            prev = jax.lax.rem(i + 1, 2)
            @pl.when(i >= 1)
            def _():
                pltpu.make_async_copy(
                    scratch.at[prev],
                    h_ref.at[:, pl.ds((i - 1) * ut, ut)],
                    sem.at[prev]).wait()

    return jax.jit(lambda a: pl.pallas_call(
        kern, grid=(n_steps,),
        in_specs=[pl.BlockSpec((ut, 25), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((2, N_UE, Q, N_K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 2, ut, Q, N_K), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))(a))


def main():
    log(f"devices: {jax.devices()}")
    x = jax.device_put(jnp.ones((N_UE, 25), jnp.float32))

    tiny = jnp.ones((8, 128))
    f_tiny = jax.jit(lambda t: jnp.sum(t * 1.000001))
    float(jax.device_get(f_tiny(tiny)))
    t_rt = min(_timed(lambda: float(jax.device_get(f_tiny(tiny))))
               for _ in range(5))
    log(f"relay rt = {t_rt*1e3:.2f} ms")

    def bench(name, fn, n=3):
        out = fn(x)
        v = float(jax.device_get(out[1, -1, 0, -1]))
        assert v == 1.0, v
        del out
        def sweep():
            o = fn(x)
            float(jax.device_get(o[1, -1, 0, -1]))
        best = min(_timed(sweep) for _ in range(n))
        dt = max(best - t_rt, 1e-9)
        log(f"{name:16s} dev={dt*1e3:8.2f} ms  -> {OUT_BYTES/dt/1e9:6.1f} GB/s")

    bench("mosaic ut=64", build_mosaic(64))
    for ut in (64, 128, 256):
        try:
            bench(f"manual ut={ut}", build_manual(ut))
        except Exception as e:
            log(f"manual ut={ut} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:110]}")
    log("DONE")


if __name__ == "__main__":
    main()

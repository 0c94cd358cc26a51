"""Where does the D=32 Stiefel-sweep step time go?  On-chip decomposition.

Two independent axes, each isolated on the same 128-point batch
(the production point_chunk at D=32):

1. recycle_iters scaling (24/48/96): if the warm power matvecs + their
   unrolled adjoint dominate, advance time scales ~linearly in ri.
2. matmul precision (highest = 6 bf16 MXU passes vs default = 1) traced
   into an otherwise identical advance: if the MXU passes dominate,
   default is up to ~6x faster; if flat, the step is latency/VPU-bound
   and precision reduction buys nothing (keep highest — it is free).

Run: python scripts/tpu_stiefel_timing_probe.py [D] [steps]
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qmps_tpu.parallel.sweep import _stiefel_sweep_programs

D = int(sys.argv[1]) if len(sys.argv) > 1 else 32
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
B = 128
gvals = np.linspace(0.5, 1.5, B).astype(np.float64)
gs = jnp.asarray(gvals, jnp.float32)
key = jax.random.PRNGKey(0)


def time_advance(ri, precision=None):
    # precision is per-advance-program since the two-phase refactor
    # (make_advance(length, precision)), no longer a _stiefel_sweep_programs
    # kwarg
    init, make_advance, finish = _stiefel_sweep_programs(
        D, 0.08, 0.9, 1, ri, 200, jnp.float32, None
    )
    xre = jax.random.normal(key, (B, 2 * D, D), jnp.float32)
    xim = jax.random.normal(jax.random.fold_in(key, 1), (B, 2 * D, D),
                            jnp.float32)
    hs, V, M, r = init(gs, xre, xim, None)
    adv = make_advance(steps, precision)
    V, M, r = adv(V, M, r, hs)  # compile
    jax.block_until_ready(V)
    t0 = time.perf_counter()
    V, M, r = adv(V, M, r, hs)
    jax.block_until_ready(V)
    dt = time.perf_counter() - t0
    es, As, rs = finish(V, r, hs)
    e = np.asarray(es)
    assert np.all(np.isfinite(e)), "non-finite readback"
    return dt / steps * 1e3, float(np.median(e))


for ri in (24, 48, 96):
    ms, med = time_advance(ri)
    print(f"D={D} ri={ri}: {ms:.2f} ms/step (B={B}), median E={med:.6f}",
          flush=True)

"""block_until_ready vs host readback on ONE large jitted dispatch.

Companion to tpu_timing_semantics_probe (which covers the chunked
multi-dispatch sweep path): a single compiled program of known FLOP
content — a scan of 100 (8192, 8192) f32 matmuls, 1.1e14 FLOP, ~3.3 s at
the v5e f32-matmul peak (highest precision = 6 bf16 passes) — so the
three windows separate cleanly:

  block honest:  block ~ seconds, read ~ 0
  block broken:  block ~ 0,       read ~ seconds

Run: python scripts/tpu_block_semantics_probe.py
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import qmps_tpu  # noqa: F401  (precision pin)

N, LOOPS = 8192, 100
x = jax.device_put(
    (np.random.default_rng(0).standard_normal((N, N)) / N**0.5).astype(
        np.float32
    )
)
jax.block_until_ready(x)


@jax.jit
def f(x):
    def it(m, _):
        m = m @ x
        # renormalize so values stay finite over 100 powers
        return m / jnp.max(jnp.abs(m)), None

    m, _ = jax.lax.scan(it, x, None, length=LOOPS)
    return m


for rep in range(3):
    t0 = time.perf_counter()
    y = f(x)
    t1 = time.perf_counter()
    jax.block_until_ready(y)
    t2 = time.perf_counter()
    s = np.asarray(y[:2, :2])
    t3 = time.perf_counter()
    assert np.all(np.isfinite(s))
    print(
        f"rep={rep}: dispatch={t1 - t0:.3f} s, block={t2 - t1:.3f} s, "
        f"read={t3 - t2:.3f} s",
        flush=True,
    )

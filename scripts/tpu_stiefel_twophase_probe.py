"""Two-phase matmul-precision schedule for the Stiefel sweep: measure it.

Round-4's precision probe (tpu_stiefel_precision_probe.py) measured the
pure-default tier ~6x faster at D=32 but median f64 error 9.8e-4 (vs
1.4e-5 at highest).  This probe measures the TWO-PHASE schedule that
sweep_ground_states_stiefel now exposes — cheap-tier descent for
steps - polish_steps, highest-tier polish tail, f64 host re-eval
unchanged — across (precision, polish_steps) to find the production
point: target D=32 well under 20 s with f64 max error < 1e-3.

All variants run in ONE process: precision is baked per advance-program
(not the global config), so programs don't contaminate each other.

Run: python scripts/tpu_stiefel_twophase_probe.py [D] [steps] [n_points]
Optionally pass a single variant as [prec] [polish] (prec "none" for
the all-highest baseline) — one variant per fresh process separates a
genuine cheap-tier divergence from rule-6 dispatch poisoning by an
earlier variant (observed: the D=16 pure-default variant read back
non-finite tensors right after a first-in-process 413 s variant).
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qmps_tpu.ham import tfim_gs_energy_f64
from qmps_tpu.parallel.sweep import sweep_ground_states_stiefel
from qmps_tpu.utils.host_eval import host_f64_sweep_energies, tfim_h64_batch

D = int(sys.argv[1]) if len(sys.argv) > 1 else 32
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 240
n_points = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

gvals = np.linspace(0.1, 2.0, n_points).astype(np.float64)
gs = jnp.asarray(gvals, jnp.float32)
exact = tfim_gs_energy_f64(gvals + 1e-3)

if len(sys.argv) > 5:
    p = sys.argv[4]
    VARIANTS = [(None if p == "none" else p, int(sys.argv[5]))]
else:
    VARIANTS = [
        (None, 0),          # round-4 baseline: all-highest
        ("default", 0),     # pure cheap tier (probe r4: fast, 9.8e-4 median)
        ("default", 30),
        ("default", 60),
        ("high", 0),
        ("high", 30),
    ]

for prec, polish in VARIANTS:
    kw = dict(D=D, steps=steps, precision=prec, polish_steps=polish)
    es, _, _ = sweep_ground_states_stiefel(gs, **kw)  # compile
    jax.block_until_ready(es)
    t0 = time.perf_counter()
    es, As, rs = sweep_ground_states_stiefel(gs + 1e-3, **kw)
    es = np.asarray(es)  # honest barrier (see tpu_stiefel_precision_probe)
    dt = time.perf_counter() - t0
    # on-chip readback hygiene BEFORE host eval: non-finite f32 energies
    # or tensors mean the chip run itself produced garbage (divergence
    # or a silently-failed dispatch), not a host re-evaluation issue
    nbad = int(np.sum(~np.isfinite(es)))
    # complex D2H is unimplemented on this backend: read float planes
    # (the direct np.asarray(As) poisons the process -- see verify skill)
    from qmps_tpu.utils.host_eval import device_to_host_c128
    Ah = device_to_host_c128(As)
    nbadA = int(np.sum(~np.all(np.isfinite(Ah), axis=(1, 2, 3))))
    if nbad or nbadA:
        print(f"prec={prec} polish={polish} D={D} steps={steps}: "
              f"{dt:.3f} s, NON-FINITE on chip: es {nbad}/{len(es)}, "
              f"As {nbadA}/{len(Ah)}", flush=True)
        continue
    e64, _ = host_f64_sweep_energies(As, rs, tfim_h64_batch(gvals + 1e-3))
    err = e64 - exact
    assert np.all(np.isfinite(err))
    print(
        f"prec={prec} polish={polish} D={D} steps={steps}: {dt:.3f} s, "
        f"median={np.median(err):.3e} max={np.max(err):.3e} "
        f"min={np.min(err):.3e} n>1e-3={int(np.sum(err > 1e-3))} "
        f"n>5e-3={int(np.sum(err > 5e-3))}",
        flush=True,
    )

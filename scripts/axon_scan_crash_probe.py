"""Minimal-repro probe for the axon worker crash on long outer scans.

Round-2 observation (docs/DESIGN.md): wrapping the density-matrix TDVP
objective's inner optimization in a production-length outer lax.scan
kills the TPU worker (same family: jax.scipy gmres-under-scan, long D=64
dense chains).  This probe isolates WHICH ingredient triggers it:

  mode=noisy_opt    outer scan over {inner adam scan over the density-
                    matrix objective}   (the real workload)
  mode=pure_opt     same structure, pure-state objective (control)
  mode=noisy_grad   outer scan over ONE value_and_grad of the noisy
                    objective (no inner scan)
  mode=noisy_fwd    outer scan over one forward evaluation only
  mode=noisy_small  noisy_grad with a 3-gate circuit (program-size axis)

Usage: python axon_scan_crash_probe.py MODE OUTER_LEN   (INNER env var
sets the inner-opt scan length, default 80)
Prints one line: PROBE <mode> <len> PASS <secs> | readback value, or
dies/hangs (driver applies a timeout).  Fresh process per probe; the
backend needs ~2 min cooldown after a crash before compiles work again.
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

mode = sys.argv[1]
L = int(sys.argv[2])
INNER = int(os.environ.get("INNER", "80"))

import optax

from qmps_tpu.circuits import ansatze
from qmps_tpu.embed.unitaries import unitary_to_tensor
from qmps_tpu.objectives.noise import noisy_tdvp_objective
from qmps_tpu.objectives.overlap import tdvp_objective
from qmps_tpu.mps import transfer as tr

gate = ansatze.shallow_full_state
u2t = lambda p: unitary_to_tensor(gate(p))
W = np.eye(4, dtype=np.complex64)
p_noise = 0.001
opt = optax.adam(3e-2)


def small_noisy_obj(A, B, Wm, p):
    """3-moment density-matrix circuit (program-size control)."""
    from qmps_tpu.objectives.noise import noisy_circuit_rho
    from qmps_tpu.embed.unitaries import tensor_to_unitary

    U = tensor_to_unitary(A)
    Ud = tensor_to_unitary(B)
    ops = [(U, (0, 1)), (Wm.astype(U.dtype), (0, 1)), (Ud.conj().T, (0, 1))]
    rho = noisy_circuit_rho(ops, 2, p)
    return rho[0, 0].real


def make_body():
    if mode == "noisy_opt" or mode == "pure_opt":
        def loss(pp, A):
            B = u2t(pp)
            if mode == "noisy_opt":
                return noisy_tdvp_objective(A, B, W, p_noise)
            return tdvp_objective(A, B, W)

        vg = jax.value_and_grad(loss)

        def body(p, _):
            A = u2t(p)

            def inner(carry, _):
                pp, s = carry
                v, g = vg(pp, A)
                up, s = opt.update(g, s)
                return (optax.apply_updates(pp, up), s), v

            (p2, _), vs = jax.lax.scan(inner, (p, opt.init(p)), None, length=INNER)
            return p2, vs[-1]

        return body
    if mode in ("noisy_grad", "noisy_fwd", "noisy_small"):
        def loss(pp, A):
            B = u2t(pp)
            if mode == "noisy_small":
                return small_noisy_obj(A, B, jnp.asarray(W), p_noise)
            return noisy_tdvp_objective(A, B, W, p_noise)

        if mode == "noisy_fwd":
            def body(p, _):
                v = loss(p, u2t(p))
                return p + 1e-6, v
        else:
            vg = jax.value_and_grad(loss)

            def body(p, _):
                v, g = vg(p, u2t(p))
                return p - 1e-3 * g, v

        return body
    raise SystemExit(f"unknown mode {mode}")


body = make_body()


@jax.jit
def run(p0):
    p, vs = jax.lax.scan(body, p0, None, length=L)
    return p, vs


p0 = jax.device_put(np.random.default_rng(0).standard_normal(15).astype(np.float32) * 0.5)
t0 = time.perf_counter()
p, vs = run(p0)
jax.block_until_ready((p, vs))
dt = time.perf_counter() - t0
# hard readback (a silent failure times absurdly fast)
vs_h = np.asarray(vs)
assert np.all(np.isfinite(vs_h)), vs_h
print(f"PROBE {mode} {L} PASS {dt:.1f}s last={float(vs_h[-1]):.6f}", flush=True)

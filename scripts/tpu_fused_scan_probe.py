"""TPU probe: production-length outer scan over the FUSED TDVP objective.

batched_quench_sweep / loschmidt_family_sweep (engine="pallas") wrap
tdvp_objective_pallas — which now dispatches every D = 2 call to the
fully fused kernel — in {outer scan over time} x {inner warm-started
optimization scan}.  The long-scan compile pathology (docs/DESIGN.md) is
body-size x scan-length sensitive, so the fused dispatch must be
re-validated at production scan lengths.

Usage: python tpu_fused_scan_probe.py [outer] [inner] [batch]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

outer = int(sys.argv[1]) if len(sys.argv) > 1 else 300
inner = int(sys.argv[2]) if len(sys.argv) > 2 else 80
B = int(sys.argv[3]) if len(sys.argv) > 3 else 64

from qmps_tpu.objectives.overlap import tdvp_objective_pallas

rng = np.random.default_rng(0)


def ht(b):
    X = rng.standard_normal((b, 2, 2, 2)) + 1j * rng.standard_normal((b, 2, 2, 2))
    X = X / np.linalg.norm(X.reshape(b, -1), axis=1)[:, None, None, None]
    X = X.astype(np.complex64)
    return X.real.copy(), X.imag.copy()


Are, Aim = ht(B)
Wh = np.eye(4, dtype=np.complex64)
args = jax.device_put([Are, Aim, Wh.real.copy(), Wh.imag.copy()])
jax.block_until_ready(args)

lr = 3e-2


@jax.jit
def run(ar, ai, wr, wi):
    A = jax.lax.complex(ar, ai)
    W = jax.lax.complex(wr, wi)

    def loss(Bt):
        return jnp.sum(tdvp_objective_pallas(A, Bt, W, 48, False))

    vg = jax.value_and_grad(loss)

    def outer_body(Bt, _):
        def inner_body(b, _):
            v, g = vg(b)
            return b - lr * g.conj(), v

        Bt, vs = jax.lax.scan(inner_body, Bt, None, length=inner)
        return Bt, vs[-1]

    Bfin, vs = jax.lax.scan(outer_body, A, None, length=outer)
    return jnp.real(Bfin), vs


t0 = time.perf_counter()
Bfin, vs = run(*args)
jax.block_until_ready((Bfin, vs))
dt = time.perf_counter() - t0
vs_h = np.asarray(vs)
assert np.all(np.isfinite(vs_h)), vs_h
print(
    f"PROBE fused-scan outer={outer} inner={inner} B={B} PASS {dt:.1f}s "
    f"last={float(vs_h[-1]):.6f}",
    flush=True,
)

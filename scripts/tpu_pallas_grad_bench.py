"""TPU probe: gradient-capable Pallas eigensolver vs dense repeated squaring
inside a batched TDVP sweep step (value+grad of sum of -|x| over the batch).

Run on the TPU host:  QMPS_TPU_X64=0 python scripts/tpu_pallas_grad_bench.py

Backend rules this script obeys (violations fail at RUNTIME and poison the
process — every later program errors and block_until_ready hides it):
- complex arrays must NOT be runtime jit args (H2D complex transfer is
  unimplemented): pass float32 real/imag planes, lax.complex in-program;
- complex jit OUTPUTS likewise can't transfer D2H: return real planes;
- host numpy complex constants captured by the jit are fine (HLO literals).
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qmps_tpu.objectives.overlap import tdvp_objective, tdvp_objective_pallas
from qmps_tpu.ham import tfim

B = int(os.environ.get("B", 4096))
ITERS = int(os.environ.get("ITERS", 48))
REPS = int(os.environ.get("REPS", 50))


def make_batch(B):
    import scipy.linalg as sla

    rng = np.random.default_rng(0)

    def canon(raw):
        q, _ = np.linalg.qr(raw.reshape(4, 2))
        return q.reshape(2, 2, 2)

    As = np.stack([canon(rng.normal(size=(2, 2, 2)) + 1j * rng.normal(size=(2, 2, 2))) for _ in range(B)])
    Bs = np.stack([canon(np.asarray(As[i]) + 0.05 * (rng.normal(size=(2, 2, 2)) + 1j * rng.normal(size=(2, 2, 2)))) for i in range(B)])
    W = np.asarray(sla.expm(-1j * 0.1 * np.asarray(tfim(1.0).to_matrix())))
    f32 = np.float32
    return (As.real.astype(f32), As.imag.astype(f32),
            Bs.real.astype(f32), Bs.imag.astype(f32), W.astype(np.complex64))


def bench(fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ar, ai, br, bi, W = make_batch(B)
    # device-resident args: numpy args re-transfer through the tunnel per call
    ar, ai, br, bi = jax.device_put((ar, ai, br, bi))
    jax.block_until_ready((ar, ai, br, bi))

    def cplx(r, i):
        return jax.lax.complex(r, i)

    def obj_pallas(ar, ai, br, bi):
        return tdvp_objective_pallas(cplx(ar, ai), cplx(br, bi), W, ITERS)

    def obj_dense(ar, ai, br, bi):
        return jax.vmap(lambda x, y: tdvp_objective(x, y, W))(cplx(ar, ai), cplx(br, bi))

    def gplanes(g):
        return jnp.stack([jnp.real(g), jnp.imag(g)])

    loss_p = jax.jit(lambda *a: jnp.sum(obj_pallas(*a)))
    loss_d = jax.jit(lambda *a: jnp.sum(obj_dense(*a)))
    # grads w.r.t. the real planes of B (the real production parametrization:
    # objectives take real parameter vectors)
    grad_p = jax.jit(jax.grad(lambda br, bi, ar, ai: jnp.sum(obj_pallas(ar, ai, br, bi)), argnums=(0, 1)))
    grad_d = jax.jit(jax.grad(lambda br, bi, ar, ai: jnp.sum(obj_dense(ar, ai, br, bi)), argnums=(0, 1)))

    for name, f, args in [
        ("fwd  pallas", loss_p, (ar, ai, br, bi)),
        ("fwd  dense ", loss_d, (ar, ai, br, bi)),
        ("grad pallas", grad_p, (br, bi, ar, ai)),
        ("grad dense ", grad_d, (br, bi, ar, ai)),
    ]:
        t0 = time.perf_counter()
        dt = bench(f, *args)
        print(f"{name}: {dt*1e3:8.3f} ms/call  {B/dt/1e6:9.2f} M objectives/s  (first+compile {time.perf_counter()-t0:.1f}s)")

    # agreement: separate programs per engine, real outputs, host comparison
    vp = np.asarray(jax.jit(obj_pallas)(ar, ai, br, bi))
    vd = np.asarray(jax.jit(obj_dense)(ar, ai, br, bi))
    gp = [np.asarray(g) for g in grad_p(br, bi, ar, ai)]
    gd = [np.asarray(g) for g in grad_d(br, bi, ar, ai)]
    print("objective values sane:", vp[:3], "(expect ~ -0.99)")
    print("value agreement (max):", np.max(np.abs(vp - vd)))
    print("grad  agreement (max):", max(np.max(np.abs(p - d)) for p, d in zip(gp, gd)),
          " scale", max(np.max(np.abs(d)) for d in gd))


if __name__ == "__main__":
    main()

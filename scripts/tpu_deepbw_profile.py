"""TPU probe: where does the deep-brickwork D=8 sweep's per-step time go?

Times, at the sweep's shapes (B=1024 points, D=8, depth=n+1=5), jitted
scans of (a) the brick-wall build alone, (b) build + warm-env energy
forward, (c) full value_and_grad, each amortized over `reps` scan
iterations per dispatch and readback-validated (axon rule 7).

Usage: python tpu_deepbw_profile.py [B] [D] [reps]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
D = int(sys.argv[2]) if len(sys.argv) > 2 else 8
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 30

from qmps_tpu.circuits.brickwork_deep import (
    _n_qubits,
    brick_wall_tensor,
    n_brick_params,
)
from qmps_tpu.ham import tfim
from qmps_tpu.optim.riemann import isometry_energy_warm

n = _n_qubits(D)
depth = n + 1
npar = n_brick_params(n, depth)
h = np.asarray(tfim(1.0).to_matrix())
hre = jax.device_put(np.ascontiguousarray(h.real, np.float32))
him = jax.device_put(np.ascontiguousarray(h.imag, np.float32))
x0 = jax.device_put(
    (np.random.default_rng(0).standard_normal((B, npar)) * 0.3).astype(
        np.float32
    )
)
jax.block_until_ready((hre, him, x0))


def build_one(p):
    A = brick_wall_tensor(p, D, depth)
    return A.transpose(1, 0, 2).reshape(2 * D, D)


def loss_one(p, r):
    V = build_one(p)
    return isometry_energy_warm(V, jax.lax.complex(hre, him), D, r, 24)


# host numpy planes: a complex device constant would need D2H at trace
# time, which is unimplemented on this backend
r0_re = np.eye(D, dtype=np.float32) / np.sqrt(D)


def r0_b():
    return jnp.broadcast_to(
        jax.lax.complex(jnp.asarray(r0_re), jnp.zeros_like(jnp.asarray(r0_re))),
        (B, D, D),
    )


def timed(tag, make_scan):
    f = jax.jit(make_scan)
    out = f(x0)
    jax.block_until_ready(out)
    s = np.asarray(out[:4] if out.ndim else out)
    assert np.all(np.isfinite(s)), (tag, s)
    t0 = time.perf_counter()
    out = f(x0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    s = np.asarray(out[:4] if out.ndim else out)
    assert np.all(np.isfinite(s)), (tag, s)
    print(f"{tag}: {dt / reps * 1e3:.2f} ms/step (B={B})", flush=True)


# (a) build alone
def scan_build(x):
    def step(c, _):
        V = jax.vmap(build_one)(x + c * 1e-6)
        return c + jnp.sum(jnp.abs(V[0, 0, 0])), None

    c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
    return c


timed("build", scan_build)


# (b) build + warm energy forward
def scan_fwd(x):
    def step(carry, _):
        c, r = carry
        e, rn = jax.vmap(lambda p, rr: loss_one(p, rr))(x + c * 1e-6, r)
        return (c + jnp.sum(e) * 1e-9, rn), None

    (c, _), _ = jax.lax.scan(
        step, (jnp.float32(0.0), r0_b()), None,
        length=reps,
    )
    return c


timed("fwd", scan_fwd)


# (c) full value_and_grad
def scan_vg(x):
    vg = jax.value_and_grad(
        lambda p, rr: loss_one(p, jax.lax.stop_gradient(rr))[0], has_aux=False
    )

    def step(carry, _):
        c, r = carry
        (e, g) = jax.vmap(vg)(x + c * 1e-6, r)
        _, rn = jax.vmap(lambda p, rr: loss_one(p, rr))(x, r)
        return (c + jnp.sum(e) * 1e-9 + jnp.sum(g[0]) * 1e-12, rn), None

    (c, _), _ = jax.lax.scan(
        step, (jnp.float32(0.0), r0_b()), None,
        length=reps,
    )
    return c


timed("vg", scan_vg)


# (d) vg WITHOUT re-running fwd (grad includes aux env via has_aux path)
def scan_vg_aux(x):
    vg = jax.value_and_grad(
        lambda p, rr: loss_one(p, jax.lax.stop_gradient(rr)), has_aux=True
    )

    def step(carry, _):
        c, r = carry
        (e, rn), g = jax.vmap(vg)(x + c * 1e-6, r)
        return (c + jnp.sum(e) * 1e-9 + jnp.sum(g[0]) * 1e-12, rn), None

    (c, _), _ = jax.lax.scan(
        step, (jnp.float32(0.0), r0_b()), None,
        length=reps,
    )
    return c


timed("vg_aux", scan_vg_aux)


# (e) vg with the GMRES matvec adjoint instead of the batched 65x65 LU
def loss_one_gmres(p, r):
    V = build_one(p)
    return isometry_energy_warm(
        V, jax.lax.complex(hre, him), D, r, 24, bwd="gmres"
    )


def scan_vg_gmres(x):
    vg = jax.value_and_grad(
        lambda p, rr: loss_one_gmres(p, jax.lax.stop_gradient(rr)),
        has_aux=True,
    )

    def step(carry, _):
        c, r = carry
        (e, rn), g = jax.vmap(vg)(x + c * 1e-6, r)
        return (c + jnp.sum(e) * 1e-9 + jnp.sum(g[0]) * 1e-12, rn), None

    (c, _), _ = jax.lax.scan(
        step, (jnp.float32(0.0), r0_b()), None,
        length=reps,
    )
    return c


timed("vg_gmres", scan_vg_gmres)

# (f) vg of the energy w.r.t. V directly (no brick build in the graph)
Vre = jax.device_put(
    np.random.default_rng(1).standard_normal((B, 2 * D, D)).astype(np.float32)
)
Vim = jax.device_put(
    np.random.default_rng(2).standard_normal((B, 2 * D, D)).astype(np.float32)
)
jax.block_until_ready((Vre, Vim))


def scan_vg_energy(x):
    def loss_v(vre, vim, rr):
        V = jax.lax.complex(vre, vim)
        Q, _ = jnp.linalg.qr(V)
        return isometry_energy_warm(
            Q, jax.lax.complex(hre, him), D, jax.lax.stop_gradient(rr), 24
        )

    vg = jax.value_and_grad(loss_v, argnums=(0, 1), has_aux=True)

    def step(carry, _):
        c, r = carry
        (e, rn), g = jax.vmap(vg)(Vre + c * 1e-6, Vim, r)
        return (c + jnp.sum(e) * 1e-9 + jnp.sum(g[0][0]) * 1e-12, rn), None

    (c, _), _ = jax.lax.scan(
        step, (jnp.float32(0.0), r0_b()), None, length=reps
    )
    return c


timed("vg_energy_only(+qr)", scan_vg_energy)


# (h) vg with plain AD through the warm iterations (bwd="unroll")
def scan_vg_unroll(x):
    def loss_u(p, rr):
        V = build_one(p)
        return isometry_energy_warm(
            V, jax.lax.complex(hre, him), D,
            jax.lax.stop_gradient(rr), 24, bwd="unroll",
        )

    vg = jax.value_and_grad(loss_u, has_aux=True)

    def step(carry, _):
        c, r = carry
        (e, rn), g = jax.vmap(vg)(x + c * 1e-6, r)
        return (c + jnp.sum(e) * 1e-9 + jnp.sum(g[0]) * 1e-12, rn), None

    (c, _), _ = jax.lax.scan(
        step, (jnp.float32(0.0), r0_b()), None, length=reps
    )
    return c


timed("vg_unroll", scan_vg_unroll)


# (g) vg through the build with a cheap quadratic head (no env solve)
def scan_vg_build(x):
    def loss_b(p):
        V = build_one(p)
        return jnp.sum(jnp.abs(V) ** 2) + jnp.abs(V[0, 0]) ** 2

    vg = jax.value_and_grad(loss_b)

    def step(c, _):
        e, g = jax.vmap(vg)(x + c * 1e-6)
        return c + jnp.sum(e) * 1e-9 + jnp.sum(g[0]) * 1e-12, None

    c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
    return c


timed("vg_build_only", scan_vg_build)

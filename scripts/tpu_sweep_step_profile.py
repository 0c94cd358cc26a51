"""TPU probe: where does the config-4 sweep's per-step time go?

One sweep optimizer step per point = value_and_grad of
energy_exact_env(full_state_suN(p, D), h) + adam update, vmapped over the
batch.  Candidates for a fused Pallas objective: the energy-from-tensor
pipeline (transfer build + right fixed point + <h> contraction) vs the
su(2D) expm ansatz map.  This probe times, at D=2:

  step      the full adam step (the production per-point cost)
  vg_full   value_and_grad through expm + energy
  vg_energy value_and_grad of energy_exact_env w.r.t. U (expm excluded)
  expm_fwd  the ansatz map alone (forward)

Axon rules: float32 planes as args, device_put once, readback-validate
after every timed loop (docs/DESIGN.md rules 6-7).
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
rng = np.random.default_rng(0)

from qmps_tpu.circuits import ansatze
from qmps_tpu.objectives.energy import energy_exact_env
from qmps_tpu.parallel.sweep import tfim_matrix

n_params = 15  # suN at D=2
ps_h = (rng.standard_normal((B, n_params)) * 0.5).astype(np.float32)
gs_h = np.linspace(0.2, 1.9, B).astype(np.float32)
args = jax.device_put([ps_h, gs_h])
jax.block_until_ready(args)

opt = optax.adam(0.05)


def loss(p, g):
    return energy_exact_env(ansatze.full_state_suN(p, 2), tfim_matrix(g))


vg = jax.value_and_grad(loss)


@jax.jit
def step(ps, gs):
    def one(p, g):
        v, gr = vg(p, g)
        up, _ = opt.update(gr, opt.init(p))
        return optax.apply_updates(p, up), v

    return jax.vmap(one)(ps, gs)


@jax.jit
def vg_full(ps, gs):
    return jax.vmap(vg)(ps, gs)


@jax.jit
def us_of(ps, gs):
    Ur = jax.vmap(lambda p: ansatze.full_state_suN(p, 2))(ps)
    return jnp.real(Ur).astype(jnp.float32), jnp.imag(Ur).astype(jnp.float32)


ur_h, ui_h = [np.asarray(x) for x in us_of(*args)]
uargs = jax.device_put([ur_h, ui_h, gs_h])
jax.block_until_ready(uargs)


@jax.jit
def vg_energy(ur, ui, gs):
    U = jax.lax.complex(ur, ui)

    def f(u, g):
        return energy_exact_env(u, tfim_matrix(g))

    vals, grads = jax.vmap(jax.value_and_grad(f, holomorphic=False))(
        U.astype(jnp.complex64), gs
    )
    return vals, jnp.abs(grads)


# ground truth for element 0: dense numpy energy
def np_tfim(g):
    # host mirror of parallel.sweep.tfim_matrix (NO eager jnp on TPU)
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.array([[1.0, 0.0], [0.0, -1.0]])
    I2 = np.eye(2)
    return -np.kron(Z, Z) + g / 2.0 * (np.kron(X, I2) + np.kron(I2, X))


def np_energy(U, g):
    # unitary_to_tensor convention (embed/unitaries.py:31-39), verified
    # against the package on CPU to 1e-16
    A = U.reshape(2, 2, 2, 2)[:, :, 0, :].transpose(1, 0, 2)
    # independent check via dense transfer fixed point
    AA = np.einsum("sik,tkj->stij", A, A).reshape(4, 2, 2)
    E = np.einsum("sik,sjl->ijkl", AA, AA.conj()).reshape(4, 4)
    w, v = np.linalg.eig(E)
    i = np.argmax(w.real)
    r = v[:, i].reshape(2, 2)
    r = r / np.trace(r)
    h = np_tfim(float(g))
    return np.einsum("ts,sij,jk,tik->", h, AA, r, AA.conj()).real


def run(name, fn, fargs, n_iters, check):
    out = fn(*fargs)
    jax.block_until_ready(out)
    check(out, name + " warmup")
    wins = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(*fargs)
        jax.block_until_ready(out)
        wins.append(time.perf_counter() - t0)
    check(out, name + " post")
    best = min(wins) / n_iters
    print(
        f"{name}: {best * 1e3:.3f} ms/call  ({B / best / 1e3:.1f}k pt/s)  "
        f"windows={[round(w, 3) for w in wins]}",
        flush=True,
    )
    return best


U0 = (ur_h[0] + 1j * ui_h[0]).astype(np.complex64)
e_truth = np_energy(U0.astype(np.complex128), gs_h[0])
print("element-0 energy ground truth:", e_truth, flush=True)


def check_vals(out, tag):
    v = np.asarray(out[1][:4] if isinstance(out, tuple) else out[:4])
    assert np.all(np.isfinite(v)), (tag, v)


def check_vg(out, tag):
    vals = np.asarray(out[0][:4])
    assert np.all(np.isfinite(vals)), (tag, vals)
    assert abs(float(vals[0]) - e_truth) < 1e-4, (tag, float(vals[0]), e_truth)


run("step", step, args, 30, check_vals)
run("vg_full", vg_full, args, 30, check_vg)
run("vg_energy", vg_energy, uargs, 30, check_vg)
run("expm_fwd", us_of, args, 30, lambda o, t: check_vals(o[0][:4], t))
print("OK", flush=True)

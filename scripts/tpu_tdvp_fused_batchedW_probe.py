"""TPU probe: fused batched-W TDVP objective (per-trajectory (B, 4, 4)
gates) — on-chip agreement vs numpy ground truth + throughput, fwd and
fwd+grad.  Axon rules (docs/DESIGN.md): float32 planes as jit args,
device_put once, validate outputs vs ground truth AFTER every timed loop.
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

rng = np.random.default_rng(0)


def host_tensors(b):
    X = rng.standard_normal((b, 2, 2, 2)) + 1j * rng.standard_normal((b, 2, 2, 2))
    X = X / np.linalg.norm(X.reshape(b, -1), axis=1)[:, None, None, None] * 2
    return X.astype(np.complex64)


A = host_tensors(B)
Bt = host_tensors(B)
import scipy.linalg

Hs = rng.standard_normal((B, 4, 4))
Hs = Hs + Hs.transpose(0, 2, 1)
Wh = np.stack([scipy.linalg.expm(-0.05j * h) for h in Hs[: min(B, 4)]])
# tile the expensive expm over the batch with a phase twist so every
# trajectory's gate is distinct but host prep stays O(1)
reps = -(-B // Wh.shape[0])
Wh = np.tile(Wh, (reps, 1, 1))[:B]
Wh = Wh * np.exp(1j * np.linspace(0, 0.1, B))[:, None, None]
Wh = Wh.astype(np.complex64)

args = jax.device_put(
    [A.real.copy(), A.imag.copy(), Bt.real.copy(), Bt.imag.copy(),
     Wh.real.copy(), Wh.imag.copy()]
)
jax.block_until_ready(args)

# ground truth for elements 0 and 1 (distinct gates) on host
truth = []
for b in range(2):
    AA = np.einsum("sik,tkj->stij", A[b], A[b]).reshape(4, 2, 2)
    WAA = np.einsum("st,tij->sij", Wh[b], AA)
    BB = np.einsum("sik,tkj->stij", Bt[b], Bt[b]).reshape(4, 2, 2)
    E = np.einsum("sik,sjl->ijkl", WAA, BB.conj()).reshape(4, 4)
    truth.append(-abs(max(np.linalg.eigvals(E.astype(np.complex128)), key=abs)))
print("ground truth -|lam| elems 0,1:", truth, flush=True)

from qmps_tpu.kernels.tdvp_fused import tdvp_objective_fused


def cplx(re, im):
    return jax.lax.complex(re, im)


def fused(ar, ai, br, bi, wr, wi):
    return tdvp_objective_fused(cplx(ar, ai), cplx(br, bi), cplx(wr, wi), 48, False)


def grad_fn(ar, ai, br, bi, wr, wi):
    def loss(br_, bi_, wr_, wi_):
        return jnp.sum(fused(ar, ai, br_, bi_, wr_, wi_))

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(br, bi, wr, wi)
    return fused(ar, ai, br, bi, wr, wi)[:2], g


def check_obj(out, tag):
    s = np.asarray(out[:2])
    assert np.all(np.isfinite(s)), (tag, s)
    for b in range(2):
        assert abs(float(s[b]) - truth[b]) < 3e-5, (tag, b, float(s[b]), truth[b])


def check_grad(out, tag):
    val, grads = out
    check_obj(np.asarray(val), tag)
    for g in grads:
        s = np.asarray(g[:2])
        assert np.all(np.isfinite(s)), (tag, "grad nonfinite")


def run(name, fn, n_iters, check):
    out = fn(*args)
    jax.block_until_ready(out)
    check(out, name + " warmup")
    wins = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(*args)
        jax.block_until_ready(out)
        wins.append(time.perf_counter() - t0)
    check(out, name + " post")
    best = min(wins)
    print(
        f"{name}: {best / n_iters * 1e3:.3f} ms/call  "
        f"({B * n_iters / best / 1e6:.2f}M evals/s)  windows={[round(w, 3) for w in wins]}",
        flush=True,
    )
    return best / n_iters


run("fused batchedW fwd", jax.jit(fused), 50, check_obj)
run("fused batchedW fwd+grad", jax.jit(grad_fn), 20, check_grad)
print("OK", flush=True)

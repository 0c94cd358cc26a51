"""TPU probe: fused vs unfused batched TDVP objective, fwd and fwd+grad.

Axon rules (docs/DESIGN.md): float32 planes as jit args, device_put once,
validate outputs vs numpy ground truth AFTER every timed loop (a silently
failed dispatch times absurdly fast), fresh process per probe.
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("QMPS_TPU_X64", "0")  # x64 i64 consts break Mosaic
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
MODE = sys.argv[2] if len(sys.argv) > 2 else "all"  # fused|unfused|all

rng = np.random.default_rng(0)


def host_tensors(b):
    X = rng.standard_normal((b, 2, 2, 2)) + 1j * rng.standard_normal((b, 2, 2, 2))
    X = X / np.linalg.norm(X.reshape(b, -1), axis=1)[:, None, None, None] * 2
    X = X.astype(np.complex64)
    return X.real.copy(), X.imag.copy()


Are, Aim = host_tensors(B)
Bre, Bim = host_tensors(B)
import scipy.linalg

H = rng.standard_normal((4, 4))
H = H + H.T
Wh = scipy.linalg.expm(-0.05j * H).astype(np.complex64)

args = jax.device_put([Are, Aim, Bre, Bim, Wh.real.copy(), Wh.imag.copy()])
jax.block_until_ready(args)

# ground truth on host
AAh = np.einsum("bsik,btkj->bstij", Are + 1j * Aim, Are + 1j * Aim).reshape(B, 4, 2, 2)
WAAh = np.einsum("st,btij->bsij", Wh, AAh)
BBh = np.einsum("bsik,btkj->bstij", Bre + 1j * Bim, Bre + 1j * Bim).reshape(B, 4, 2, 2)
Eh = np.einsum("sik,sjl->ijkl", WAAh[0], BBh[0].conj()).reshape(4, 4)
lam_truth = max(np.linalg.eigvals(Eh.astype(np.complex128)), key=abs)
print("ground truth -|lam| elem0:", -abs(lam_truth), flush=True)


def run(name, fn, n_iters, check):
    out = fn(*args)
    jax.block_until_ready(out)
    check(out, name + " warmup")
    best = np.inf
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
        f"({B * n_iters / best / 1e6:.2f}M evals/s)  windows={[round(w,3) for w in wins]}",
        flush=True,
    )
    return best / n_iters


def check_obj(out, tag):
    s = np.asarray(out[:4] if out.ndim else out)
    assert np.all(np.isfinite(s)), (tag, s)
    assert abs(float(np.asarray(out[0])) - (-abs(lam_truth))) < 2e-5, (
        tag, float(np.asarray(out[0])), -abs(lam_truth),
    )


def check_grad(out, tag):
    val, grads = out
    check_obj(np.asarray([val]).reshape(1), tag)
    for g in grads:
        s = np.asarray(g[:2] if g.ndim > 1 else g)
        assert np.all(np.isfinite(s)), (tag, "grad nonfinite")


from qmps_tpu.objectives.overlap import tdvp_objective_pallas
from qmps_tpu.kernels.tdvp_fused import tdvp_objective_fused
from qmps_tpu.kernels.pallas_power import dominant_eigval_batched
from qmps_tpu.objectives.overlap import mixed_transfer_with_gate
from qmps_tpu.mps import transfer as tr


def cplx(re, im):
    return jax.lax.complex(re, im)


def unfused(ar, ai, br, bi, wr, wi):
    As, Bs, W = cplx(ar, ai), cplx(br, bi), cplx(wr, wi)

    def build_E(A, Bt):
        WAA, BB = mixed_transfer_with_gate(A, Bt, W)
        return tr.transfer_dense(WAA, BB)

    Es = jax.vmap(build_E)(As, Bs)
    return -jnp.abs(dominant_eigval_batched(Es, 48, False))


def fused(ar, ai, br, bi, wr, wi):
    return tdvp_objective_fused(cplx(ar, ai), cplx(br, bi), cplx(wr, wi), 48, False)


def grad_wrap(obj):
    def f(ar, ai, br, bi, wr, wi):
        def loss(br_, bi_):
            return jnp.sum(obj(ar, ai, br_, bi_, wr, wi))

        g = jax.grad(loss, argnums=(0, 1))(br, bi)
        first = obj(ar, ai, br, bi, wr, wi)[0]
        return first, g

    return f


t = {}
if MODE in ("all", "fused"):
    t["fused_fwd"] = run("fused fwd", jax.jit(fused), 50, check_obj)
    t["fused_grad"] = run("fused fwd+grad", jax.jit(grad_wrap(fused)), 20, check_grad)
if MODE in ("all", "unfused"):
    t["unfused_fwd"] = run("unfused fwd", jax.jit(unfused), 10, check_obj)
    t["unfused_grad"] = run(
        "unfused fwd+grad", jax.jit(grad_wrap(unfused)), 5, check_grad
    )
if len(t) == 4:
    print(
        f"SPEEDUP fwd: {t['unfused_fwd']/t['fused_fwd']:.1f}x   "
        f"fwd+grad: {t['unfused_grad']/t['fused_grad']:.1f}x",
        flush=True,
    )

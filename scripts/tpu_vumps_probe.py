"""TPU probe: VUMPS at large bond dimension (BASELINE config 5 flagship).

Times vumps_ground_state with the GMRES environment path at D = 32/64 on
chip and reports the achieved energy error vs the exact TFIM integral —
computed by an f64 HOST re-evaluation of the returned tensor (ARPACK
fixed points of the transfer map in operator form; the on-chip f32
readout resolves only ~1e-7 relative, far above the D=32 truncation
error).

Usage: python tpu_vumps_probe.py [D] [iters] [k]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

D = int(sys.argv[1]) if len(sys.argv) > 1 else 32
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 150
k = int(sys.argv[3]) if len(sys.argv) > 3 else 24

from qmps_tpu.ham import tfim, tfim_gs_energy
from qmps_tpu.mps.tdvp import vumps_ground_state


def host_energy_f64(AL_dev, h64):
    """f64 gauge-free energy of the returned tensor: ARPACK dominant left
    /right fixed points of the transfer map (operator form, O(d D^3) per
    matvec), then the two-site contraction."""
    from scipy.sparse.linalg import LinearOperator, eigs

    split = jax.jit(lambda X: (jnp.real(X).astype(jnp.float32),
                               jnp.imag(X).astype(jnp.float32)))
    ar, ai = split(AL_dev)
    A = np.asarray(ar, np.float64) + 1j * np.asarray(ai, np.float64)
    Dl = A.shape[-1]

    def right_mv(x):
        r = x.reshape(Dl, Dl)
        return np.einsum("sik,kl,sjl->ij", A, r, A.conj(),
                         optimize=True).ravel()

    def left_mv(x):
        l = x.reshape(Dl, Dl)
        return np.einsum("ski,kl,slj->ij", A.conj(), l, A,
                         optimize=True).ravel()

    wr, vr = eigs(LinearOperator((Dl * Dl,) * 2, matvec=right_mv), k=1,
                  which="LM")
    wl, vl = eigs(LinearOperator((Dl * Dl,) * 2, matvec=left_mv), k=1,
                  which="LM")

    def herm(m):
        tr = np.trace(m)
        m = m * (np.conj(tr) / abs(tr)) if abs(tr) > 1e-30 else m
        return (m + m.conj().T) / 2

    r = herm(vr[:, 0].reshape(Dl, Dl))
    l = herm(vl[:, 0].reshape(Dl, Dl))
    lam = abs(wr[0])
    A2 = np.einsum("sij,tjk->stik", A, A).reshape(4, Dl, Dl)
    num = np.einsum("ts,ai,sij,jk,tak->", h64, l, A2, r, A2.conj(),
                    optimize=True)
    return (num / (lam ** 2 * np.einsum("ai,ia->", l, r))).real


h = np.asarray(tfim(1.0).to_matrix(), np.float32)
h64 = np.asarray(tfim(1.0).to_matrix(), np.float64)
e_exact = float(tfim_gs_energy(1.0))

t0 = time.perf_counter()
AL, C, e, info = vumps_ground_state(h, D, iters=iters, k=k,
                                    env_solver="gmres")
print(f"cold (incl. compile): {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
AL, C, e, info = vumps_ground_state(h, D, iters=iters, k=k,
                                    env_solver="gmres",
                                    key=jax.random.PRNGKey(2))
dt = time.perf_counter() - t0
gn = float(np.asarray(info["grad_norms"][-1]))
assert np.isfinite(gn), gn
print(f"vumps D={D} warm: {dt:.3f}s ({iters / dt:.1f} iters/s), "
      f"grad_norm={gn:.2e}", flush=True)

t0 = time.perf_counter()
e64 = host_energy_f64(AL, h64)
print(f"f64 host energy ({time.perf_counter() - t0:.1f}s): "
      f"err={e64 - e_exact:.3e} (on-chip f32 err={float(e) - e_exact:.3e})",
      flush=True)

"""TPU probe: Pallas eigensolver kernel throughput WITH readback validation.

Run:  QMPS_TPU_X64=0 python scripts/tpu_kernel_throughput.py
Honest-measurement rules: real-plane args only, sample readback before and
after timing (a silently failed execution on this backend times as a no-op).
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qmps_tpu.kernels.pallas_power import dominant_eig_batched

B = int(os.environ.get("B", 262144))
ITERS = int(os.environ.get("ITERS", 40))
REPS = int(os.environ.get("REPS", 30))


def main():
    rng = np.random.default_rng(0)
    # known dominant eigenvalues via unitary conjugation of a diagonal
    lams = (1.0 + 0.1 * (np.arange(B) % 7)).astype(np.float32)
    q, _ = np.linalg.qr(rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4)))
    d = np.zeros((B, 4, 4), np.complex64)
    d[:, 0, 0] = lams
    d[:, 1, 1], d[:, 2, 2], d[:, 3, 3] = 0.3, 0.2, 0.1
    E = np.einsum("ij,bjk,kl->bil", q, d, q.conj().T).astype(np.complex64)
    # device_put ONCE: numpy args would re-transfer ~32MB through the axon
    # tunnel on every call and the timing would measure H2D, not the kernel
    Ere = jax.device_put(E.real.copy())
    Eim = jax.device_put(E.imag.copy())
    jax.block_until_ready((Ere, Eim))

    for method in ("squaring", "power"):
        f = jax.jit(
            lambda er, ei: jnp.abs(
                dominant_eig_batched(jax.lax.complex(er, ei), ITERS, method=method)[0]
            )
        )
        t0 = time.perf_counter()
        out = f(Ere, Eim)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        err = float(np.max(np.abs(np.asarray(out) - lams)))  # hard readback
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(Ere, Eim)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS
        err2 = float(np.max(np.abs(np.asarray(out) - lams)))
        print(
            f"{method:9s}: {dt*1e3:8.3f} ms/call  {B/dt/1e6:9.1f} M eigensolves/s  "
            f"max|lam err| {max(err, err2):.2e}  (compile {compile_s:.1f}s)"
        )


if __name__ == "__main__":
    main()

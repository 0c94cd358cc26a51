"""Benchmark: gen-2 TDVP overlap contraction throughput on TPU.

The reference's one measured hot kernel is the 13-tensor brickwork TDVP
overlap contraction (new_tdvp/output_results.txt: 2.262 ms/call numpy,
0.866 ms/call jax-jit on the author's machine — BASELINE.md).  We run the
same contraction vmapped over a large batch of brick pairs on the TPU and
report evaluations/second; vs_baseline is against the reference's best
jitted time (1 / 8.658e-4 s = 1155 evals/s).

Prints exactly one JSON line.
"""
import json
import os
import time

os.environ.setdefault("QMPS_TPU_X64", "0")

import jax
import jax.numpy as jnp

REFERENCE_EVALS_PER_SEC = 1.0 / 8.658e-4  # new_tdvp/output_results.txt:2


def main():
    import numpy as np

    from qmps_tpu.kernels import manifold_overlap_batched

    B = 65536
    rng = np.random.default_rng(0)

    def host_unitaries(b, n):
        A = rng.standard_normal((b, n, n)) + 1j * rng.standard_normal((b, n, n))
        Q, _ = np.linalg.qr(A)
        return jnp.asarray(Q.astype(np.complex64))

    U1, U2, U1p, U2p = (host_unitaries(B, 4) for _ in range(4))
    M = host_unitaries(B, 2)
    W = host_unitaries(1, 16)[0]

    @jax.jit
    def batch(U1, U2, U1p, U2p, M, W):
        out = manifold_overlap_batched(
            U1, U2, U1p, U2p, M, jnp.swapaxes(M, -1, -2).conj(), W
        )
        return jnp.abs(out)  # real output (complex D2H is unsupported on axon)

    out = batch(U1, U2, U1p, U2p, M, W)
    out.block_until_ready()  # warm up / compile

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = batch(U1, U2, U1p, U2p, M, W)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    evals_per_sec = B * iters / dt
    print(
        json.dumps(
            {
                "metric": "tdvp_overlap_evals_per_sec",
                "value": round(evals_per_sec, 1),
                "unit": "evals/s",
                "vs_baseline": round(evals_per_sec / REFERENCE_EVALS_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

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

    # Backend rule: complex arrays must NOT be runtime jit args (H2D complex
    # transfer is unimplemented on axon and the failed execution poisons the
    # process silently — block_until_ready does NOT propagate it).  Pass
    # float32 real/imag planes and lax.complex in-program, return real, and
    # READ BACK a value so the timing provably measures successful work.
    def host_unitaries(b, n):
        A = rng.standard_normal((b, n, n)) + 1j * rng.standard_normal((b, n, n))
        Q, _ = np.linalg.qr(A)
        Q = Q.astype(np.complex64)
        return Q.real.copy(), Q.imag.copy()

    planes = [host_unitaries(B, 4) for _ in range(4)]  # U1 U2 U1p U2p
    Mre, Mim = host_unitaries(B, 2)
    Wre, Wim = host_unitaries(1, 16)
    # device_put once — numpy args would re-transfer ~35MB through the
    # remote-TPU tunnel every call and the loop would time H2D, not compute
    args = jax.device_put(
        [p for pair in planes for p in pair] + [Mre, Mim, Wre[0], Wim[0]]
    )
    jax.block_until_ready(args)

    @jax.jit
    def batch(u1r, u1i, u2r, u2i, p1r, p1i, p2r, p2i, mr, mi, wr, wi):
        c = jax.lax.complex
        U1, U2, U1p, U2p = c(u1r, u1i), c(u2r, u2i), c(p1r, p1i), c(p2r, p2i)
        M, W = c(mr, mi), c(wr, wi)
        out = manifold_overlap_batched(
            U1, U2, U1p, U2p, M, jnp.swapaxes(M, -1, -2).conj(), W
        )
        return jnp.abs(out)  # real output (complex D2H is unsupported on axon)

    out = batch(*args)
    out.block_until_ready()  # warm up / compile
    sample = np.asarray(out[:4])  # hard readback: fails loudly if the
    assert np.all(np.isfinite(sample)), sample  # execution silently errored

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = batch(*args)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(out[:4])))

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

"""Native C++ contraction-path planner (qmps_tpu/native)."""
import numpy as np
import pytest

from qmps_tpu.native import optimal_einsum_path, plan_total_flops


def test_chain_contraction_order():
    """A(2,100) B(100,2) C(2,2): optimal order contracts AB first."""
    ops = [[0, 1], [1, 2], [2, 3]]
    dims = {0: 2, 1: 100, 2: 2, 3: 2}
    path = optimal_einsum_path(ops, dims, [0, 3])
    if path == "greedy":
        pytest.skip("native toolchain unavailable")
    assert path[0] == "einsum_path"
    A = np.random.randn(2, 100)
    B = np.random.randn(100, 2)
    C = np.random.randn(2, 2)
    r = np.einsum("ij,jk,kl->il", A, B, C, optimize=path)
    np.testing.assert_allclose(r, A @ B @ C, atol=1e-12)


def test_optimal_beats_or_matches_greedy():
    """On a heterogeneous-dim network the DP plan is never worse than
    numpy's greedy path."""
    import re

    rng = np.random.default_rng(0)
    ops = [[0, 1, 2], [2, 3], [3, 4, 5], [5, 6], [6, 0], [1, 4]]
    dims = {0: 3, 1: 8, 2: 17, 3: 2, 4: 9, 5: 5, 6: 11}
    out = []
    path = optimal_einsum_path(ops, dims, out)
    if path == "greedy":
        pytest.skip("native toolchain unavailable")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    sub = ",".join("".join(alpha[i] for i in t) for t in ops) + "->"
    views = [np.zeros([dims[i] for i in t]) for t in ops]
    _, ig = np.einsum_path(sub, *views, optimize="greedy")
    _, io = np.einsum_path(sub, *views, optimize=path)
    fg = float(re.search(r"Optimized FLOP count:\s+([\d.e+]+)", ig).group(1))
    fo = float(re.search(r"Optimized FLOP count:\s+([\d.e+]+)", io).group(1))
    assert fo <= fg * (1 + 1e-12)
    # numeric agreement
    views = [rng.standard_normal([dims[i] for i in t]) for t in ops]
    r1 = np.einsum(sub, *views, optimize=path)
    r2 = np.einsum(sub, *views, optimize="greedy")
    np.testing.assert_allclose(r1, r2, rtol=1e-10)


def test_brickwork_network_planned():
    from qmps_tpu.circuits.brickwork import _MANIFOLD_PATH

    assert _MANIFOLD_PATH == "greedy" or len(_MANIFOLD_PATH) == 12

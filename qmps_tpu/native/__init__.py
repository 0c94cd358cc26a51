"""Native runtime components (C++ via ctypes).

``optimal_einsum_path``: exact minimal-flop contraction order for a tensor
network, computed by the DP planner in pathfinder.cpp.  Compiled on first
use with g++ (cached .so next to the source); falls back to 'greedy' when a
toolchain is unavailable so the package never hard-depends on it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Dict, List, Sequence

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpathfinder.so")
_SRC = os.path.join(_DIR, "pathfinder.cpp")


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.plan_path.restype = ctypes.c_longlong
    lib.plan_path.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    return lib


def optimal_einsum_path(
    operands: Sequence[Sequence[int]],
    dims: Dict[int, int],
    output: Sequence[int],
):
    """opt_einsum-style pairwise path [(i, j), ...] minimizing total flops.

    operands: per-tensor index-id lists; dims: id -> dimension; output:
    ids kept in the result.  Returns 'greedy' if the native planner is
    unavailable or the network is too large (> 20 tensors / > 63 ids).
    """
    lib = _lib()
    ids = sorted({i for t in operands for i in t} | set(output))
    n = len(operands)
    if lib is None or n > 20 or len(ids) > 63 or n < 2:
        return "greedy"
    remap = {idx: k for k, idx in enumerate(ids)}
    masks = (ctypes.c_uint64 * n)(
        *[sum(1 << remap[i] for i in set(t)) for t in operands]
    )
    dim_arr = (ctypes.c_longlong * len(ids))(*[int(dims[i]) for i in ids])
    out_mask = sum(1 << remap[i] for i in set(output))
    ml = (ctypes.c_uint32 * (n - 1))()
    mr = (ctypes.c_uint32 * (n - 1))()
    flops = lib.plan_path(n, masks, len(ids), dim_arr, out_mask, ml, mr)
    if flops < 0:
        return "greedy"

    # convert subset-mask merge list to opt_einsum positional pairs: keep a
    # working list of subset masks (initially singletons); each merge pops
    # the two operands by position and appends the union.
    work: List[int] = [1 << i for i in range(n)]
    path: List = ["einsum_path"]  # numpy/opt_einsum explicit-path marker
    for k in range(n - 1):
        a, b = int(ml[k]), int(mr[k])
        ia, ib = work.index(a), work.index(b)
        i, j = sorted((ia, ib))
        path.append((i, j))
        hi = work.pop(j)
        lo = work.pop(i)
        work.append(lo | hi)
    return path


def plan_total_flops(
    operands: Sequence[Sequence[int]], dims: Dict[int, int], output: Sequence[int]
) -> int:
    """Total flops of the optimal plan (for diagnostics/benchmarks)."""
    lib = _lib()
    if lib is None:
        return -1
    ids = sorted({i for t in operands for i in t} | set(output))
    remap = {idx: k for k, idx in enumerate(ids)}
    n = len(operands)
    masks = (ctypes.c_uint64 * n)(*[sum(1 << remap[i] for i in set(t)) for t in operands])
    dim_arr = (ctypes.c_longlong * len(ids))(*[int(dims[i]) for i in ids])
    out_mask = sum(1 << remap[i] for i in set(output))
    ml = (ctypes.c_uint32 * (n - 1))()
    mr = (ctypes.c_uint32 * (n - 1))()
    return int(lib.plan_path(n, masks, len(ids), dim_arr, out_mask, ml, mr))

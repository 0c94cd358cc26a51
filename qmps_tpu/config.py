"""Global numerics / device policy.

The reference gets 1e-10 agreement by running float64 scipy/numpy on CPU.  We
keep complex128 as the *correctness* dtype (tests, parity checks) and
complex64 as the *speed* dtype for TPU hot loops; every hot-path entry point
takes an explicit ``dtype=`` so callers choose.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

#: correctness dtype — all tests and parity checks run in this.  When the
#: package was imported with QMPS_TPU_X64=0 (TPU mode), requests for 64-bit
#: dtypes would be silently truncated anyway, so point the aliases at the
#: 32-bit types to keep dtype handling explicit and warning-free.
if jax.config.jax_enable_x64:
    CDTYPE = jnp.complex128
    RDTYPE = jnp.float64
else:
    CDTYPE = jnp.complex64
    RDTYPE = jnp.float32

# numpy twins for module-level constants.  Constants MUST be host numpy
# arrays, not device arrays: the axon TPU backend cannot transfer complex
# arrays device->host, so a jit that closure-captures a device constant
# fails at trace time; numpy constants embed directly into the HLO.
import numpy as _np  # noqa: E402

NP_CDTYPE = _np.complex128 if jax.config.jax_enable_x64 else _np.complex64
NP_RDTYPE = _np.float64 if jax.config.jax_enable_x64 else _np.float32

#: TPU hot-path dtype.
FAST_CDTYPE = jnp.complex64
FAST_RDTYPE = jnp.float32


def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


# persistent jit cache: compiles are expensive through this backend's
# remote-compile tunnel; cache them across processes.  TPU mode only —
# CPU AOT cache entries are microarch-specific and reloading them on a
# different host risks SIGILL (observed loader warnings).  Opt out with
# QMPS_TPU_NO_JIT_CACHE=1.
import os as _os  # noqa: E402

if (
    _os.environ.get("QMPS_TPU_NO_JIT_CACHE", "0") != "1"
    and _os.environ.get("QMPS_TPU_X64", "1") == "0"
    # a session pinned to CPU must NOT share this cache: XLA:CPU AOT
    # entries are host-microarch-specific, and loading one compiled on a
    # different machine risks SIGILL (observed cpu_aot_loader feature
    # -mismatch warnings after a CPU session wrote entries here); the
    # platform check is on the CONFIG, not jax.default_backend(), so no
    # backend is initialized at import time
    and jax.config.jax_platforms != "cpu"
):
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("QMPS_TPU_JIT_CACHE", "/tmp/qmps_tpu_jit_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


@dataclasses.dataclass(frozen=True)
class Precision:
    """Bundle of dtypes threaded through hot paths."""

    cdtype: jnp.dtype = CDTYPE
    rdtype: jnp.dtype = RDTYPE

    @classmethod
    def fast(cls) -> "Precision":
        return cls(cdtype=FAST_CDTYPE, rdtype=FAST_RDTYPE)


DEFAULT = Precision()
FAST = Precision.fast()

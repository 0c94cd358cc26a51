"""Environment representation ("represent" capability).

The RepresentMPS API the reference's tests import but whose module is
missing from the tree (tests/test_represent.py:6 — SURVEY.md section 2.8),
rebuilt with all three environment strategies:

- 'exact':        transfer fixed point (qmps/tools.py:176-182)
- 'variational':  bloch-tomography matching (qmps/represent.py:18-53)
- 'power':        k-fold transfer application (qmps/represent.py:235-248)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..embed.unitaries import environment_to_unitary
from ..env.exact import get_env_exact, power_method_env
from ..env.variational import get_env_variational


class RepresentMPS:
    def __init__(self, U: jnp.ndarray, strategy: str = "exact", **kwargs):
        self.U = jnp.asarray(U)
        self.strategy = strategy
        self.kwargs = kwargs
        self.v = None

    def get_env(self) -> jnp.ndarray:
        """Return the environment unitary V (V|00> = vec(C), C C^dag = r)."""
        if self.strategy == "exact":
            self.v = get_env_exact(self.U)
        elif self.strategy == "variational":
            self.v, self.loss = get_env_variational(self.U, **self.kwargs)
        elif self.strategy == "power":
            from ..mps.imps import _cholesky_psd

            k = self.kwargs.get("k", 20)
            r = power_method_env(self.U, k)
            # dtype-aware jitter (a fixed 1e-14 underflows in f32 and the
            # cholesky of a rank-deficient r silently NaNs — imps.py)
            C = _cholesky_psd(r)
            self.v = environment_to_unitary(C.reshape(-1))
        else:
            raise ValueError(f"unknown strategy {self.strategy}")
        return self.v

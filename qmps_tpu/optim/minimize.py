"""Gradient optimizers for jitted objectives.

The reference drives every objective with derivative-free scipy
(Nelder-Mead/Powell, qmps/tools.py:248-270) — O(10^3-10^4) function
evaluations each costing a circuit simulation.  Here objectives are
differentiable, so we run optax adam / L-BFGS entirely inside jit with a
lax.scan over steps (convergence history recorded on-device), plus a scipy
bridge for parity experiments.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class OptResult:
    """Mirrors the fields qMPS consumers read off scipy's OptimizeResult."""

    x: jnp.ndarray
    fun: float
    history: jnp.ndarray | None = None
    nit: int = 0
    message: str = ""


def minimize_adam(
    loss: Callable,
    x0: jnp.ndarray,
    steps: int = 1000,
    lr: float = 1e-2,
    store_values: bool = True,
) -> OptResult:
    """Adam with cosine-decayed lr, fully jitted (one XLA program)."""
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    opt = optax.adam(sched)
    vg = jax.value_and_grad(loss)

    @jax.jit
    def run(x0):
        def step(carry, _):
            x, s = carry
            v, g = vg(x)
            up, s = opt.update(g, s)
            return (optax.apply_updates(x, up), s), v

        (x, _), hist = jax.lax.scan(step, (x0, opt.init(x0)), None, length=steps)
        return x, hist

    x, hist = run(x0)
    return OptResult(
        x=x,
        fun=float(jax.jit(loss)(x)),  # jitted: eager complex ops fail on axon
        history=hist if store_values else None,
        nit=steps,
        message="adam/scan completed",
    )


def minimize_lbfgs(
    loss: Callable,
    x0: jnp.ndarray,
    steps: int = 200,
    store_values: bool = True,
) -> OptResult:
    """optax L-BFGS with zoom linesearch, jitted scan."""
    opt = optax.lbfgs()
    vg = jax.value_and_grad(loss)

    @jax.jit
    def run(x0):
        def step(carry, _):
            x, s = carry
            v, g = vg(x)
            up, s = opt.update(
                g, s, x, value=v, grad=g, value_fn=loss
            )
            return (optax.apply_updates(x, up), s), v

        (x, _), hist = jax.lax.scan(step, (x0, opt.init(x0)), None, length=steps)
        return x, hist

    x, hist = run(x0)
    return OptResult(
        x=x,
        fun=float(jax.jit(loss)(x)),  # jitted: eager complex ops fail on axon
        history=hist if store_values else None,
        nit=steps,
        message="lbfgs/scan completed",
    )


def retry_until_monotone(
    run_once: Callable,
    key,
    max_tries: int = 3,
    eps: float = 1e-4,
    last_best: float = float("inf"),
):
    """Numerical fault handling: rerun an optimization with fresh seeds until
    the result doesn't regress past the previous best (the reference's
    retry-until-monotone loops, scripts/ground_state_finding.py:139-154,
    scripts/noisy_optimization.py).

    run_once(key) -> OptResult; returns the best result across tries.
    """
    import jax

    best = None
    for t in range(max_tries):
        key, sub = jax.random.split(key)
        res = run_once(sub)
        if jnp.isfinite(res.fun) and (best is None or res.fun < best.fun):
            best = res
        if best is not None and best.fun < last_best + eps:
            break
    return best


def minimize_scipy(
    loss: Callable,
    x0: jnp.ndarray,
    method: str = "Nelder-Mead",
    tol: float = 1e-8,
    maxiter: int = 10000,
    with_grad: bool = False,
) -> OptResult:
    """Parity bridge to scipy.optimize.minimize (the reference's optimizer
    settings, qmps/tools.py:212-219); jit-compiles the objective once."""
    import numpy as np
    from scipy.optimize import minimize as sp_minimize

    jloss = jax.jit(loss)
    f = lambda x: float(jloss(jnp.asarray(x)))
    jac = None
    if with_grad:
        jg = jax.jit(jax.grad(loss))
        jac = lambda x: np.asarray(jg(jnp.asarray(x)), dtype=float)
    res = sp_minimize(f, np.asarray(x0), method=method, tol=tol, jac=jac,
                      options={"maxiter": maxiter})
    return OptResult(
        x=jnp.asarray(res.x), fun=float(res.fun), nit=int(res.get("nit", 0)),
        message=str(res.message),
    )

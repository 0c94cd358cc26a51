"""Jittable Rotosolve / double-Rotosolve.

The reference's double_rotosolve (qmps/tools.py:422-457) fits, per
coordinate, the exact 2-harmonic cost section
f(x) = P sin(2x + u) + Q sin(x + v) from 5 evaluations, then minimizes it
with scipy minimize_scalar.  Here the whole coordinate sweep is a
lax.fori_loop inside one jitted program: the 5-point stencil is identical
and the 1-D minimization is a dense grid + one Newton polish (exact to
machine precision for this analytic family).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _min_two_harmonic(P, u, Q, v, n_grid: int = 512):
    """argmin over [-pi, pi) of P sin(2x+u) + Q sin(x+v)."""
    xs = jnp.linspace(-jnp.pi, jnp.pi, n_grid, endpoint=False)

    def f(x):
        return P * jnp.sin(2 * x + u) + Q * jnp.sin(x + v)

    x0 = xs[jnp.argmin(f(xs))]

    def newton(x, _):
        d1 = 2 * P * jnp.cos(2 * x + u) + Q * jnp.cos(x + v)
        d2 = -4 * P * jnp.sin(2 * x + u) - Q * jnp.sin(x + v)
        step = jnp.where(d2 > 1e-12, d1 / jnp.maximum(d2, 1e-12), 0.0)
        return x - jnp.clip(step, -0.1, 0.1), None

    x, _ = jax.lax.scan(newton, x0, None, length=8)
    return x


def rotosolve_step(loss: Callable, params: jnp.ndarray) -> jnp.ndarray:
    """One full single-harmonic rotosolve sweep (qmps/rotosolve.py:154-181):
    theta_i <- argmin of the exact sinusoid through 3 evaluations."""
    n = params.shape[0]
    eye = jnp.eye(n)

    def body(i, p):
        e = eye[i]
        f0 = loss(p)
        fp = loss(p + e * (jnp.pi / 2))
        fm = loss(p - e * (jnp.pi / 2))
        th = -jnp.pi / 2 - jnp.arctan2(2 * f0 - fp - fm, fp - fm)
        th = jnp.arctan2(jnp.sin(th), jnp.cos(th))
        return p + e * th

    return jax.lax.fori_loop(0, n, body, params)


def double_rotosolve_step(loss: Callable, params: jnp.ndarray) -> jnp.ndarray:
    """One full 2-harmonic sweep with the reference's 5-point stencil
    (qmps/tools.py:431-452)."""
    n = params.shape[0]
    eye = jnp.eye(n)

    def body(i, p):
        e = eye[i]

        def M(x):
            return loss(p + e * x)

        A = M(0.0) + M(jnp.pi)
        B = M(0.0) - M(jnp.pi)
        C = M(jnp.pi / 2) + M(-jnp.pi / 2)
        D = M(jnp.pi / 2) - M(-jnp.pi / 2)
        E = M(jnp.pi / 4) - M(-jnp.pi / 4)
        a = (2 * E - jnp.sqrt(2.0) * D) / 4
        b = (A - C) / 4
        c = D / 2
        d = B / 2
        P = jnp.sqrt(a**2 + b**2)
        u = jnp.arctan2(b, a)
        Q = jnp.sqrt(c**2 + d**2)
        v = jnp.arctan2(d, c)
        th = _min_two_harmonic(P, u, Q, v)
        th = jnp.arctan2(jnp.sin(th), jnp.cos(th))
        return p + e * th

    return jax.lax.fori_loop(0, n, body, params)


def rotosolve(loss: Callable, x0: jnp.ndarray, n_sweeps: int = 100, double: bool = True):
    """Full rotosolve optimization: jitted scan of coordinate sweeps.

    Returns (params, history of loss after each sweep).
    """
    step = double_rotosolve_step if double else rotosolve_step

    @jax.jit
    def run(x0):
        def sweep(p, _):
            p = step(loss, p)
            return p, loss(p)

        return jax.lax.scan(sweep, x0, None, length=n_sweeps)

    return run(x0)


def double_rotosolve(loss: Callable, x0: jnp.ndarray, n_sweeps: int = 100):
    return rotosolve(loss, x0, n_sweeps, double=True)

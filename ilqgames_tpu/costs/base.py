"""Cost and constraint primitives with autodiff quadraticization.

Reference parity:
  - Cost::Evaluate / Cost::Quadraticize (cost/cost.h:55-77): each cost maps
    (relative time, input vector) -> scalar, and contributes a gradient and
    Hessian. Here quadraticization defaults to jax.grad / jax.hessian of the
    evaluate function — which reproduces the reference's analytic derivatives
    for every cost whose shipped formulas are the true derivatives. Costs
    whose shipped derivatives *deviate* from the truth (the convex proximity
    family and parts of the polyline family) provide a custom `quad_fn` that
    replicates the shipped behavior exactly, since it affects which fixed
    point the solver reaches.
  - Constraint (constraint/constraint.h:63-140): scalar g with augmented-
    Lagrangian term lambda*g + mu_eff*g^2/2, where mu_eff gates to zero for
    satisfied, inactive inequalities (constraint.h:112-117). Multipliers are
    explicit arrays in solver state, not globals.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ilqgames_tpu.types import SMALL_NUMBER


def assemble_vector(d, entries, like):
    """[d] vector from static (index, scalar) pairs, built with a stack
    instead of scatters — Mosaic (Pallas TPU) has no scatter lowering, and
    this code runs inside the sweep kernel. Duplicate indices accumulate.
    `like`: any scalar tracer, for a correctly-batched zero."""
    acc = {}
    for i, v in entries:
        acc[i] = acc[i] + v if i in acc else v
    zero = jnp.zeros_like(like)
    return jnp.stack([acc.get(i, zero) for i in range(d)])


def assemble_matrix(d, entries, like):
    """[d, d] matrix from static ((i, j), scalar) pairs; see
    assemble_vector. Under vmap the stacks batch into a handful of
    concatenates, not per-instance work."""
    acc = {}
    for ij, v in entries:
        acc[ij] = acc[ij] + v if ij in acc else v
    zero = jnp.zeros_like(like)
    return jnp.stack([
        jnp.stack([acc.get((i, j), zero) for j in range(d)])
        for i in range(d)
    ])


@dataclasses.dataclass(frozen=True, eq=False)
class Cost:
    """A scalar stage cost on one input vector (a state x or one player's u).

    evaluate: (t_rel, v) -> scalar. t_rel is time since the plan start.
    quad_fn:  optional (t_rel, v) -> (hess [d,d], grad [d]) override.
    support:  optional tuple of input indices the cost actually reads.
              When set, autodiff gradients/Hessians are computed over the
              |support|-dimensional restriction and scattered back — a
              large saving on TPU, where most costs touch 1-4 dims of a
              ~16-dim state (each Hessian column is a JVP pass).
    """

    name: str
    evaluate: Callable
    quad_fn: Optional[Callable] = None
    support: Optional[Tuple[int, ...]] = None
    # Optional sparse gradient: (t, v) -> list[(dim, scalar)]. The merit
    # path accumulates these pairs across a player's costs and assembles
    # ONE dense vector per player, instead of one [d]-stack per cost —
    # the stacks were the dominant op count in the Pallas sweep kernel.
    grad_pairs_fn: Optional[Callable] = None
    # Optional sparse quadraticization: (t, v) -> (hess pairs, grad
    # pairs) — see quad_pairs().
    quad_pairs_fn: Optional[Callable] = None

    def _restricted(self, t, v):
        # Stack-based reassembly (no scatters) so the trace runs unchanged
        # inside Pallas kernels.
        idx = self.support
        pos = {i: n for n, i in enumerate(idx)}
        d = v.shape[0]

        def f(sub):
            vv = jnp.stack([
                sub[pos[i]] if i in pos else v[i] for i in range(d)
            ])
            return self.evaluate(t, vv)

        return f, jnp.stack([v[i] for i in idx])

    def gradient(self, t, v):
        """Gradient alone (no Hessian work) — the merit path's primitive."""
        pairs = self.gradient_pairs(t, v)
        if pairs is not None:
            return assemble_vector(v.shape[0], pairs, v[0])
        if self.quad_fn is not None:
            return self.quad_fn(t, v)[1]
        return jax.grad(self.evaluate, argnums=1)(t, v)

    def gradient_pairs(self, t, v):
        """Sparse gradient as (dim, scalar) pairs, or None if only a
        dense gradient is available (quad_fn without grad_pairs_fn, or
        unrestricted autodiff)."""
        if self.grad_pairs_fn is not None:
            pp = self.grad_pairs_fn(t, v)
            return None if pp is None else list(pp)
        if self.quad_fn is not None:
            return None
        if self.support is not None:
            f, sub = self._restricted(t, v)
            g = jax.grad(f)(sub)
            return [(i, g[n]) for n, i in enumerate(self.support)]
        return None

    def quadraticize(self, t, v):
        if self.quad_fn is not None:
            return self.quad_fn(t, v)
        if self.support is not None:
            f, sub = self._restricted(t, v)
            idx = self.support
            g = jax.grad(f)(sub)
            h = jax.hessian(f)(sub)
            d = v.shape[0]
            grad = assemble_vector(
                d, [(i, g[n]) for n, i in enumerate(idx)], v[0])
            hess = assemble_matrix(
                d,
                [((i, i2), h[n, n2])
                 for n, i in enumerate(idx) for n2, i2 in enumerate(idx)],
                v[0])
            return hess, grad
        grad = jax.grad(self.evaluate, argnums=1)(t, v)
        hess = jax.hessian(self.evaluate, argnums=1)(t, v)
        return hess, grad

    def quad_pairs(self, t, v):
        """Sparse quadraticization: (hess ((i,j), scalar) pairs, grad
        (i, scalar) pairs), or None if only a dense form exists. Same
        scalars as `quadraticize` — the fused stage kernel accumulates
        pairs across a player's costs and assembles ONE dense Q/l per
        player (per-cost dense accumulation costs xdim^2 vreg adds per
        cost inside a Pallas kernel, which gets no fusion/DCE)."""
        if self.quad_pairs_fn is not None:
            return self.quad_pairs_fn(t, v)
        if self.quad_fn is not None:
            return None
        if self.support is not None:
            f, sub = self._restricted(t, v)
            idx = self.support
            g = jax.grad(f)(sub)
            h = jax.hessian(f)(sub)
            hp = [((i, i2), h[n, n2])
                  for n, i in enumerate(idx) for n2, i2 in enumerate(idx)]
            gp = [(i, g[n]) for n, i in enumerate(idx)]
            return hp, gp
        return None


@dataclasses.dataclass(frozen=True, eq=False)
class Constraint:
    """A scalar constraint g(t, v) == 0 (equality) or g(t, v) <= 0.

    g: (t_rel, v) -> scalar constraint value.
    quad_fn: optional (t_rel, v, lam, mu) -> (hess, grad) override for the
      augmented-Lagrangian quadraticization.
    """

    name: str
    g: Callable
    is_equality: bool = False
    quad_fn: Optional[Callable] = None
    support: Optional[Tuple[int, ...]] = None
    # Optional sparse AL gradient: (t, v, lam, mu) -> list[(dim, scalar)]
    # — see Cost.grad_pairs_fn.
    al_grad_pairs_fn: Optional[Callable] = None
    # Optional sparse AL quadraticization: (t, v, lam, mu) ->
    # (hess pairs, grad pairs) — see Cost.quad_pairs().
    al_quad_pairs_fn: Optional[Callable] = None

    def effective_mu(self, g_val, lam, mu):
        """mu switches off for satisfied inactive inequalities
        (constraint/constraint.h:112-117)."""
        if self.is_equality:
            return mu
        inactive = (g_val <= SMALL_NUMBER) & (jnp.abs(lam) <= SMALL_NUMBER)
        return jnp.where(jax.lax.stop_gradient(inactive), 0.0, mu)

    def evaluate_al(self, t, v, lam, mu):
        """lambda*g + mu_eff*g^2/2 (constraint/constraint.h:83-88)."""
        g_val = self.g(t, v)
        mu_eff = self.effective_mu(jax.lax.stop_gradient(g_val), lam, mu)
        return lam * g_val + 0.5 * mu_eff * g_val * g_val

    def _restricted_al(self, t, v, lam, mu):
        idx = self.support
        pos = {i: n for n, i in enumerate(idx)}
        d = v.shape[0]

        def f(sub):
            vv = jnp.stack([
                sub[pos[i]] if i in pos else v[i] for i in range(d)
            ])
            return self.evaluate_al(t, vv, lam, mu)

        return f, jnp.stack([v[i] for i in idx])

    def gradient_al(self, t, v, lam, mu):
        """AL-term gradient alone (merit path)."""
        pairs = self.gradient_al_pairs(t, v, lam, mu)
        if pairs is not None:
            return assemble_vector(v.shape[0], pairs, v[0])
        if self.quad_fn is not None:
            return self.quad_fn(t, v, lam, mu)[1]
        return jax.grad(self.evaluate_al, argnums=1)(t, v, lam, mu)

    def gradient_al_pairs(self, t, v, lam, mu):
        """Sparse AL gradient as (dim, scalar) pairs, or None if only a
        dense form exists."""
        if self.al_grad_pairs_fn is not None:
            pp = self.al_grad_pairs_fn(t, v, lam, mu)
            return None if pp is None else list(pp)
        if self.quad_fn is not None:
            return None
        if self.support is not None:
            f, sub = self._restricted_al(t, v, lam, mu)
            g = jax.grad(f)(sub)
            return [(i, g[n]) for n, i in enumerate(self.support)]
        return None

    def quadraticize_al(self, t, v, lam, mu):
        """Gradient/Hessian of the AL term. Autodiff of evaluate_al yields
        exactly the reference's ModifyDerivatives algebra
        (src/constraint.cpp:62-89):
          d  = (lam + mu_eff*g) * dg
          dd = lam*ddg + mu_eff*(dg dg^T + g*ddg)."""
        if self.quad_fn is not None:
            return self.quad_fn(t, v, lam, mu)
        if self.support is not None:
            f, sub = self._restricted_al(t, v, lam, mu)
            idx = self.support
            g = jax.grad(f)(sub)
            h = jax.hessian(f)(sub)
            d = v.shape[0]
            grad = assemble_vector(
                d, [(i, g[n]) for n, i in enumerate(idx)], v[0])
            hess = assemble_matrix(
                d,
                [((i, i2), h[n, n2])
                 for n, i in enumerate(idx) for n2, i2 in enumerate(idx)],
                v[0])
            return hess, grad
        grad = jax.grad(self.evaluate_al, argnums=1)(t, v, lam, mu)
        hess = jax.hessian(self.evaluate_al, argnums=1)(t, v, lam, mu)
        return hess, grad

    def quad_al_pairs(self, t, v, lam, mu):
        """Sparse AL quadraticization as (hess pairs, grad pairs), or
        None if only a dense form exists — see Cost.quad_pairs()."""
        if self.al_quad_pairs_fn is not None:
            return self.al_quad_pairs_fn(t, v, lam, mu)
        if self.quad_fn is not None:
            return None
        if self.support is not None:
            f, sub = self._restricted_al(t, v, lam, mu)
            idx = self.support
            g = jax.grad(f)(sub)
            h = jax.hessian(f)(sub)
            hp = [((i, i2), h[n, n2])
                  for n, i in enumerate(idx) for n2, i2 in enumerate(idx)]
            gp = [(i, g[n]) for n, i in enumerate(idx)]
            return hp, gp
        return None

    def is_satisfied(self, g_val):
        if self.is_equality:
            return jnp.abs(g_val) <= SMALL_NUMBER
        return g_val <= SMALL_NUMBER


def increment_lambda(constraint: Constraint, lam, mu, g_val):
    """lambda <- lambda + mu*g, clamped at 0 for inequalities
    (constraint/constraint.h:98-102)."""
    new_lam = lam + mu * g_val
    if constraint.is_equality:
        return new_lam
    return jnp.maximum(0.0, new_lam)

"""Tensor-product barycentric Lagrange interpolation — jittable, batched.

One ``TensorInterpolant`` holds the full tensor of training values on the
cartesian product of per-dimension Leja knots; evaluation is d successive
contractions of barycentric factor vectors against the value tensor — pure
``jnp`` (gathers + fma + one small matmul per dim), vmapped over query batches.
This replaces amisc's per-(alpha,beta) Lagrange interpolants (SURVEY.md §2.4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hallthrusterpem_tpu.surrogate.knots import barycentric_weights

__all__ = ["TensorInterpolant", "tensor_grid_points"]


def tensor_grid_points(knots_1d: Sequence[np.ndarray]) -> np.ndarray:
    """Cartesian product of per-dim knot vectors -> (num_points, d) array (C order:
    last dim fastest)."""
    grids = np.meshgrid(*knots_1d, indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1)


@dataclass
class TensorInterpolant:
    """Tensor-product interpolant on nested Leja grids.

    :param knots: per-dim node vectors (lengths n_1..n_d)
    :param values: (n_1, ..., n_d, n_out) training values on the tensor grid
    :param method: ``"lagrange"`` (global barycentric polynomial per dim — fast
        spectral convergence on smooth maps) or ``"linear"`` (piecewise-linear
        hat basis per dim — LOCAL support, so an extreme-but-finite training
        value at a domain corner cannot ring across the whole domain; constant
        beyond the end knots). Both are interpolatory on nested knots, so the
        MISC combination telescopes identically.
    """

    knots: tuple
    values: np.ndarray  # set after model evals
    method: str = "lagrange"

    def __post_init__(self):
        self.knots = tuple(np.asarray(k, dtype=np.float64) for k in self.knots)
        if getattr(self, "method", "lagrange") == "linear":
            # hat-basis evaluation needs sorted nodes: sort each dim's knots and
            # permute the value tensor axes to match, once, at construction
            order = tuple(np.argsort(k) for k in self.knots)
            self.knots = tuple(k[o] for k, o in zip(self.knots, order))
            vals = np.asarray(self.values)
            for d, o in enumerate(order):
                vals = np.take(vals, o, axis=d)
            self.values = vals
            self._weights = tuple(np.ones_like(k) for k in self.knots)  # unused
        else:
            self._weights = tuple(barycentric_weights(k) for k in self.knots)

    @property
    def ndim(self) -> int:
        return len(self.knots)

    @property
    def n_out(self) -> int:
        return self.values.shape[-1]

    def grid_points(self) -> np.ndarray:
        return tensor_grid_points(self.knots)

    def __call__(self, x):
        """Evaluate at ``x`` of shape (..., d) -> (..., n_out).

        Pure NumPy on the host: interpolant tensors are tiny and surrogate
        evaluation inside UQ loops is latency-critical — on a remote-TPU setup
        every accelerator dispatch costs a network round-trip that dwarfs the math
        (and ``jax.default_device`` does not reliably keep work off the tunnel).
        """
        x = np.asarray(x, dtype=np.float64)
        batch_shape = x.shape[:-1]
        xq = x.reshape((-1, self.ndim))
        if getattr(self, "method", "lagrange") == "linear":
            out = _eval_tensor_linear_np(self.knots, np.asarray(self.values), xq)
        else:
            out = _eval_tensor_np(self.knots, self._weights, np.asarray(self.values), xq)
        return out.reshape(batch_shape + (self.values.shape[-1],))


def _eval_tensor_np(knots, weights, values, xq: np.ndarray) -> np.ndarray:
    """Vectorized NumPy barycentric tensor contraction: ``xq`` (N, d) -> (N, n_out)."""
    v = None
    for d, (kn, w) in enumerate(zip(knots, weights)):
        diff = xq[:, d : d + 1] - kn[None, :]  # (N, n_d)
        near = np.abs(diff) < 1e-13 * (1.0 + np.abs(kn)[None, :])
        any_near = near.any(axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = w[None, :] / np.where(near, 1.0, diff)
            smooth = terms / terms.sum(axis=1, keepdims=True)
        exact = near.astype(np.float64)
        exact /= np.maximum(exact.sum(axis=1, keepdims=True), 1.0)
        L = np.where(any_near, exact, smooth)  # (N, n_d) factor matrix
        if v is None:
            v = np.tensordot(L, values, axes=(1, 0))  # (N, n_2, ..., n_out)
        else:
            v = np.einsum("bi,bi...->b...", L, v)
    return v


def _linear_factor_np(kn: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Piecewise-linear hat weights: ``q`` (N,) on sorted nodes ``kn`` (n,) ->
    (N, n) factor matrix (rows sum to 1; constant beyond the end nodes)."""
    n = kn.size
    out = np.zeros((q.size, n))
    if n == 1:
        out[:, 0] = 1.0
        return out
    qc = np.clip(q, kn[0], kn[-1])
    hi = np.clip(np.searchsorted(kn, qc, side="right"), 1, n - 1)
    lo = hi - 1
    t = (qc - kn[lo]) / np.maximum(kn[hi] - kn[lo], 1e-300)
    rows = np.arange(q.size)
    out[rows, lo] = 1.0 - t
    out[rows, hi] += t
    return out


def _eval_tensor_linear_np(knots, values, xq: np.ndarray) -> np.ndarray:
    """Piecewise-multilinear tensor contraction: ``xq`` (N, d) -> (N, n_out)."""
    v = None
    for d, kn in enumerate(knots):
        L = _linear_factor_np(kn, xq[:, d])
        if v is None:
            v = np.tensordot(L, values, axes=(1, 0))
        else:
            v = np.einsum("bi,bi...->b...", L, v)
    return v


def jit_eval_tensor(knots, weights, values, xq, method: str = "lagrange"):
    """Jittable barycentric tensor evaluation (for fusing a trained surrogate into
    an on-device program, e.g. a jitted posterior). The host path uses
    ``_eval_tensor_np``; this twin keeps the math available under ``jit``."""

    def factor(q, nodes, w):
        if method == "linear":
            n = nodes.shape[0]
            if n == 1:
                return jnp.ones(1, dtype=jnp.result_type(q, nodes))
            qc = jnp.clip(q, nodes[0], nodes[-1])
            hi = jnp.clip(jnp.searchsorted(nodes, qc, side="right"), 1, n - 1)
            lo = hi - 1
            t = (qc - nodes[lo]) / jnp.maximum(nodes[hi] - nodes[lo], 1e-300)
            base = jnp.zeros(n, dtype=jnp.result_type(q, nodes))
            return base.at[lo].add(1.0 - t).at[hi].add(t)
        diff = q - nodes
        near = jnp.abs(diff) < 1e-13 * (1.0 + jnp.abs(nodes))
        terms = w / jnp.where(near, 1.0, diff)
        smooth = terms / jnp.sum(terms)
        exact = near.astype(smooth.dtype)
        exact = exact / jnp.maximum(jnp.sum(exact), 1.0)
        return jnp.where(jnp.any(near), exact, smooth)

    def eval_one(q):
        v = values
        for d in range(len(knots)):
            v = jnp.tensordot(factor(q[d], knots[d], weights[d]), v, axes=[[0], [0]])
        return v

    return jax.vmap(eval_one)(xq)

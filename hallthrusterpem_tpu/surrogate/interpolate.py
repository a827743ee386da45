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


def _cpu_device():
    return jax.devices("cpu")[0]


def tensor_grid_points(knots_1d: Sequence[np.ndarray]) -> np.ndarray:
    """Cartesian product of per-dim knot vectors -> (num_points, d) array (C order:
    last dim fastest)."""
    grids = np.meshgrid(*knots_1d, indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1)


@dataclass
class TensorInterpolant:
    """Barycentric tensor-product interpolant on nested Leja grids.

    :param knots: per-dim node vectors (lengths n_1..n_d)
    :param values: (n_1, ..., n_d, n_out) training values on the tensor grid
    """

    knots: tuple
    values: np.ndarray  # set after model evals

    def __post_init__(self):
        self.knots = tuple(np.asarray(k, dtype=np.float64) for k in self.knots)
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

        Runs on the host CPU backend: interpolant tensors are tiny, and surrogate
        evaluation inside UQ loops is latency-critical — on a remote-TPU setup
        every accelerator dispatch costs a network round-trip that dwarfs the math.
        """
        x = np.asarray(x)
        batch_shape = x.shape[:-1]
        xq = x.reshape((-1, self.ndim))
        with jax.default_device(_cpu_device()):
            out = _eval_tensor(
                tuple(jnp.asarray(k) for k in self.knots),
                tuple(jnp.asarray(w) for w in self._weights),
                jnp.asarray(self.values),
                jnp.asarray(xq),
            )
            out = np.asarray(out)
        return out.reshape(batch_shape + (self.values.shape[-1],))


def _factor(q, nodes, weights):
    """Barycentric factor vector L(q): (n,) with sum 1; exact at nodes."""
    diff = q - nodes
    near = jnp.abs(diff) < 1e-13 * (1.0 + jnp.abs(nodes))
    any_near = jnp.any(near)
    safe = jnp.where(near, 1.0, diff)
    terms = weights / safe
    smooth = terms / jnp.sum(terms)
    exact = near.astype(smooth.dtype)
    exact = exact / jnp.maximum(jnp.sum(exact), 1.0)
    return jnp.where(any_near, exact, smooth)


def _eval_one(knots, weights, values, q):
    v = values
    for d in range(len(knots)):
        L = _factor(q[d], knots[d], weights[d])
        v = jnp.tensordot(L, v, axes=[[0], [0]])
    return v


@jax.jit
def _eval_tensor(knots, weights, values, xq):
    return jax.vmap(lambda q: _eval_one(knots, weights, values, q))(xq)

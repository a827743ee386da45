"""Typed random variables with the distribution/norm mini-languages of the reference
YAML DSL (reference ``scripts/pem_v0/pem_v0_SPT-100.yml:8-17,31,45,143,156`` and the
amisc 0.8 ``Variable`` API surface reconstructed in SURVEY.md §2.4).

Supported distribution strings: ``U(a, b)`` / ``Uniform(a, b)``, ``LogUniform(a, b)``,
``N(mu, sd)`` / ``Normal(mu, sd)``, ``Relative(pct)`` (uniform ±pct% about nominal),
``Tolerance(tol)`` (uniform ±tol about nominal).
Supported norms: ``log10``, ``log``, ``linear(scale)``, ``none`` (chainable with ";").
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

__all__ = ["Distribution", "Norm", "Compression", "Variable", "parse_distribution", "parse_norms"]

_CALL_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:\((.*)\))?\s*$")


def _parse_call(spec: str) -> tuple[str, list[float]]:
    """Parse ``Name(a, b, ...)`` into (name, [a, b, ...])."""
    m = _CALL_RE.match(spec)
    if m is None:
        raise ValueError(f"Cannot parse spec string: {spec!r}")
    name = m.group(1)
    args = []
    if m.group(2):
        for tok in m.group(2).split(","):
            tok = tok.strip()
            if tok:
                args.append(float(tok))
    return name, args


def _parse_domain(domain) -> Optional[tuple[float, float]]:
    """Parse a domain spec like ``(a, b)`` (string or 2-sequence) into floats."""
    if domain is None:
        return None
    if isinstance(domain, str):
        toks = domain.strip().lstrip("([").rstrip(")]").split(",")
        return (float(toks[0]), float(toks[1]))
    lo, hi = domain
    return (float(lo), float(hi))


# ----------------------------------------------------------------------------------
# Distributions
# ----------------------------------------------------------------------------------
@dataclass(frozen=True)
class Distribution:
    """A 1-D sampling distribution. ``kind`` in {uniform, loguniform, normal, relative,
    tolerance}. ``relative``/``tolerance`` are resolved against a nominal at sample time.
    """

    kind: str
    params: tuple[float, ...]

    def sample(self, key, shape, nominal: Optional[float] = None):
        import jax

        if self.kind == "uniform":
            lo, hi = self.params
            return jax.random.uniform(key, shape, minval=lo, maxval=hi)
        if self.kind == "loguniform":
            lo, hi = self.params
            u = jax.random.uniform(key, shape, minval=np.log10(lo), maxval=np.log10(hi))
            return 10.0 ** u
        if self.kind == "normal":
            mu, sd = self.params
            return mu + sd * jax.random.normal(key, shape)
        if self.kind == "relative":
            (pct,) = self.params
            if nominal is None:
                raise ValueError("Relative() distribution requires a nominal value")
            # nominal may be a scalar OR a per-sample array (e.g. jittering a
            # batch of experimental operating conditions in a likelihood)
            nom = jnp.asarray(nominal)
            a, b = nom * (1 - pct / 100.0), nom * (1 + pct / 100.0)
            lo, hi = jnp.minimum(a, b), jnp.maximum(a, b)
            u = jax.random.uniform(key, shape)
            return lo + (hi - lo) * u
        if self.kind == "tolerance":
            (tol,) = self.params
            if nominal is None:
                raise ValueError("Tolerance() distribution requires a nominal value")
            nom = jnp.asarray(nominal)
            u = jax.random.uniform(key, shape)
            return (nom - tol) + 2.0 * tol * u
        raise ValueError(f"Unknown distribution kind {self.kind!r}")

    def pdf(self, x, nominal: Optional[float] = None):
        xp = jnp if isinstance(x, jnp.ndarray) else np
        x = xp.asarray(x)
        if self.kind == "uniform":
            lo, hi = self.params
            return xp.where((x >= lo) & (x <= hi), 1.0 / (hi - lo), 0.0)
        if self.kind == "loguniform":
            lo, hi = self.params
            c = 1.0 / (np.log(hi) - np.log(lo))
            return xp.where((x >= lo) & (x <= hi), c / xp.maximum(x, 1e-300), 0.0)
        if self.kind == "normal":
            mu, sd = self.params
            return xp.exp(-0.5 * ((x - mu) / sd) ** 2) / (sd * np.sqrt(2 * np.pi))
        if self.kind in ("relative", "tolerance"):
            if nominal is None:
                raise ValueError(f"{self.kind} pdf requires a nominal value")
            if self.kind == "relative":
                (pct,) = self.params
                lo, hi = nominal * (1 - pct / 100.0), nominal * (1 + pct / 100.0)
                lo, hi = min(lo, hi), max(lo, hi)
            else:
                (tol,) = self.params
                lo, hi = nominal - tol, nominal + tol
            return xp.where((x >= lo) & (x <= hi), 1.0 / (hi - lo), 0.0)
        raise ValueError(f"Unknown distribution kind {self.kind!r}")

    def bounds(self, nominal: Optional[float] = None) -> Optional[tuple[float, float]]:
        if self.kind in ("uniform", "loguniform"):
            return (self.params[0], self.params[1])
        if self.kind == "normal":
            mu, sd = self.params
            return (mu - 3 * sd, mu + 3 * sd)
        if self.kind == "relative" and nominal is not None:
            (pct,) = self.params
            lo, hi = nominal * (1 - pct / 100.0), nominal * (1 + pct / 100.0)
            return (min(lo, hi), max(lo, hi))
        if self.kind == "tolerance" and nominal is not None:
            (tol,) = self.params
            return (nominal - tol, nominal + tol)
        return None

    @property
    def mu(self) -> float:
        """Mean (legacy ``amisc.rv.NormalRV.mu`` accessor, reference ``monte_carlo.py:93``)."""
        if self.kind == "normal":
            return self.params[0]
        if self.kind in ("uniform",):
            return 0.5 * (self.params[0] + self.params[1])
        raise AttributeError(f"mu undefined for {self.kind}")


def parse_distribution(spec) -> Optional[Distribution]:
    if spec is None or isinstance(spec, Distribution):
        return spec
    name, args = _parse_call(str(spec))
    key = name.lower()
    kind = {
        "u": "uniform",
        "uniform": "uniform",
        "loguniform": "loguniform",
        "n": "normal",
        "normal": "normal",
        "relative": "relative",
        "rel": "relative",
        "tolerance": "tolerance",
        "tol": "tolerance",
    }.get(key)
    if kind is None:
        raise ValueError(f"Unknown distribution {name!r}")
    return Distribution(kind, tuple(args))


# ----------------------------------------------------------------------------------
# Norms (normalization transforms)
# ----------------------------------------------------------------------------------
def _xp(x):
    """Array namespace: NumPy for host data (keeps UQ hot loops off the
    accelerator — on a remote-TPU tunnel every dispatch is a network round-trip),
    jnp for traced/jax arrays so transforms stay jittable."""
    return jnp if isinstance(x, jnp.ndarray) else np


@dataclass(frozen=True)
class Norm:
    """One normalization transform. ``kind`` in {log10, log, linear, zscore, minmax, none}."""

    kind: str
    params: tuple[float, ...] = ()

    def forward(self, x):
        xp = _xp(x)
        if self.kind == "log10":
            return xp.log10(x)
        if self.kind == "log":
            return xp.log(x)
        if self.kind == "linear":
            scale = self.params[0] if self.params else 1.0
            offset = self.params[1] if len(self.params) > 1 else 0.0
            return x * scale + offset
        if self.kind == "zscore":
            mu, sd = self.params
            return (x - mu) / sd
        if self.kind == "minmax":
            lo, hi = self.params[:2]
            return (x - lo) / (hi - lo)
        if self.kind == "none":
            return x
        raise ValueError(f"Unknown norm {self.kind!r}")

    def inverse(self, y):
        xp = _xp(y)
        if self.kind == "log10":
            return 10.0 ** xp.asarray(y)
        if self.kind == "log":
            return xp.exp(y)
        if self.kind == "linear":
            scale = self.params[0] if self.params else 1.0
            offset = self.params[1] if len(self.params) > 1 else 0.0
            return (y - offset) / scale
        if self.kind == "zscore":
            mu, sd = self.params
            return y * sd + mu
        if self.kind == "minmax":
            lo, hi = self.params[:2]
            return y * (hi - lo) + lo
        if self.kind == "none":
            return y
        raise ValueError(f"Unknown norm {self.kind!r}")


def parse_norms(spec) -> tuple[Norm, ...]:
    """Parse a norm spec like ``"log10"`` or ``"linear(1e6)"`` or a list of them."""
    if spec is None:
        return ()
    if isinstance(spec, Norm):
        return (spec,)
    if isinstance(spec, (list, tuple)):
        out: list[Norm] = []
        for s in spec:
            out.extend(parse_norms(s))
        return tuple(out)
    out = []
    for part in str(spec).split(";"):
        part = part.strip()
        if not part:
            continue
        name, args = _parse_call(part)
        out.append(Norm(name.lower(), tuple(args)))
    return tuple(out)


# ----------------------------------------------------------------------------------
# Field compression spec (SVD)
# ----------------------------------------------------------------------------------
@dataclass
class Compression:
    """SVD compression of a field quantity to low-rank latent coefficients.

    Mirrors ``amisc`` ``var.compression`` usage at reference ``scripts/gen_data.py:278-294``
    and the YAML spec at ``pem_v0_SPT-100.yml:211-214,277-280``. The projection/
    reconstruction are plain matmuls, so encode/decode are jittable.
    """

    method: str = "svd"
    rank: Optional[int] = None
    energy_tol: Optional[float] = None
    reconstruction_tol: Optional[float] = 0.01
    fields: Optional[Sequence[str]] = None
    coords: Optional[np.ndarray] = None
    data_matrix: Optional[np.ndarray] = None
    projection: Optional[np.ndarray] = None  # (grid, rank) orthonormal columns

    def compute_map(self, data_matrix=None):
        """Compute the SVD projection map from a snapshot matrix.

        :param data_matrix: ``(grid_dim, num_snapshots)`` matrix of (normalized) field
            snapshots; defaults to ``self.data_matrix``.
        """
        from hallthrusterpem_tpu.ops.svd import svd_rank

        A = np.asarray(self.data_matrix if data_matrix is None else data_matrix)
        if A.ndim != 2:
            raise ValueError(f"data_matrix must be 2-D (grid, snapshots); got {A.shape}")
        self.data_matrix = A
        U, r = svd_rank(
            A, rank=self.rank, energy_tol=self.energy_tol, reconstruction_tol=self.reconstruction_tol
        )
        self.projection = np.asarray(U[:, :r])
        self.rank = int(r)
        return self.projection

    @property
    def latent_size(self) -> int:
        if self.projection is None:
            raise ValueError("compression map not computed yet; call compute_map()")
        return self.projection.shape[1]

    def compress(self, fields):
        """Project ``(..., grid)`` fields to ``(..., rank)`` latent coefficients."""
        if isinstance(fields, jnp.ndarray):
            return fields @ jnp.asarray(self.projection)
        return np.asarray(fields) @ np.asarray(self.projection)

    def reconstruct(self, latent):
        """Reconstruct ``(..., rank)`` latents back to ``(..., grid)`` fields."""
        if isinstance(latent, jnp.ndarray):
            return latent @ jnp.asarray(self.projection).T
        return np.asarray(latent) @ np.asarray(self.projection).T

    @staticmethod
    def from_dict(d: dict) -> "Compression":
        d = dict(d)
        known = {k: d.pop(k) for k in list(d) if k in Compression.__dataclass_fields__}
        return Compression(**known)


# ----------------------------------------------------------------------------------
# Variable
# ----------------------------------------------------------------------------------
@dataclass
class Variable:
    """A named model input/output with category, distribution, domain, norm, and
    optional field compression — the amisc ``Variable`` equivalent (SURVEY.md §2.4).
    """

    name: str
    description: str = ""
    category: str = ""  # operating | calibration | nuisance | output (free-form)
    tex: str = ""
    units: str = ""
    nominal: Optional[float] = None
    domain: Optional[tuple[float, float]] = None
    distribution: Optional[Distribution] = None
    norm: tuple[Norm, ...] = field(default_factory=tuple)
    compression: Optional[Compression] = None

    def __post_init__(self):
        self.domain = _parse_domain(self.domain)
        self.distribution = parse_distribution(self.distribution)
        if not isinstance(self.norm, tuple) or (self.norm and not isinstance(self.norm[0], Norm)):
            self.norm = parse_norms(self.norm)

    # -- normalization -------------------------------------------------------------
    def normalize(self, x, denorm: bool = False):
        """Apply (or invert, with ``denorm=True``) this variable's norm chain."""
        if denorm:
            return self.denormalize(x)
        for n in self.norm:
            x = n.forward(x)
        return x

    def denormalize(self, y):
        for n in reversed(self.norm):
            y = n.inverse(y)
        return y

    def normalized_domain(self) -> Optional[tuple[float, float]]:
        dom = self.get_domain()
        if dom is None:
            return None
        lo, hi = (float(np.asarray(self.normalize(v))) for v in dom)
        return (min(lo, hi), max(lo, hi))

    # -- domains and bounds ----------------------------------------------------------
    def get_domain(self) -> Optional[tuple[float, float]]:
        """The variable's domain; falls back to distribution support."""
        if self.domain is not None:
            return self.domain
        if self.distribution is not None:
            return self.distribution.bounds(self.nominal)
        return None

    def bounds(self) -> Optional[tuple[float, float]]:
        """Legacy alias (reference ``mcmc.py:110-120``)."""
        return self.get_domain()

    # -- sampling --------------------------------------------------------------------
    def sample_domain(self, key, shape):
        """Sample uniformly over the (denormalized) domain."""
        import jax

        dom = self.get_domain()
        if dom is None:
            raise ValueError(f"Variable {self.name} has no domain to sample")
        return jax.random.uniform(key, shape, minval=dom[0], maxval=dom[1])

    def sample(self, key, shape, nominal: Optional[float] = None):
        """Sample from the distribution pdf (falling back to uniform over domain)."""
        nom = self.nominal if nominal is None else nominal
        if self.distribution is not None:
            return self.distribution.sample(key, shape, nominal=nom)
        return self.sample_domain(key, shape)

    def pdf(self, x, nominal: Optional[float] = None):
        nom = self.nominal if nominal is None else nominal
        if self.distribution is not None:
            return self.distribution.pdf(x, nominal=nom)
        dom = self.get_domain()
        xp = jnp if isinstance(x, jnp.ndarray) else np
        if dom is None:
            return xp.ones_like(xp.asarray(x))
        lo, hi = dom
        return xp.where((xp.asarray(x) >= lo) & (xp.asarray(x) <= hi), 1.0 / (hi - lo), 0.0)

    # -- display -----------------------------------------------------------------------
    def get_tex(self, units: bool = False, symbol: bool = True) -> str:
        """TeX label (reference usage ``gen_data.py:415``, ``fit_surr.py:177``)."""
        label = self.tex if (symbol and self.tex) else self.name
        if units and self.units:
            label = f"{label} [{self.units}]"
        return label

    def to_tex(self, **kwargs) -> str:
        return self.get_tex(**kwargs)

    @property
    def mu(self):
        if self.distribution is not None:
            return self.distribution.mu
        return self.nominal

    @property
    def param_type(self) -> str:
        """Legacy ``param_type`` accessor (reference ``monte_carlo.py:56-59``):
        the variable's category, or 'output' when uncategorized."""
        return self.category or "output"

    @staticmethod
    def from_dict(d: dict) -> "Variable":
        d = dict(d)
        comp = d.pop("compression", None)
        known = {k: d.pop(k) for k in list(d) if k in Variable.__dataclass_fields__}
        var = Variable(**known)
        if comp is not None:
            var.compression = comp if isinstance(comp, Compression) else Compression.from_dict(comp)
        return var

    def __eq__(self, other):
        if isinstance(other, Variable):
            return self.name == other.name
        return self.name == other

    def __hash__(self):
        return hash(self.name)

    def __str__(self):
        return self.name

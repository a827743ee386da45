"""System-level MLP-ensemble surrogate — the TPU-native data-rich regressor.

Why this exists: the reference workflow gates all downstream UQ on <10%
surrogate error (reference ``scripts/README.md:67``), but tensor-product MISC
interpolants plateau at ~0.2-0.3 rel-L2 on the rough 17-dim pem_v0 response
surface (breathing-mode transitions inside the prior box; see
``docs/validation.md``). On TPU the in-process batched solver makes labeled
data cheap (~10 full-fidelity evals/s/chip), which inverts the reference's
design constraint: instead of squeezing an interpolant onto few expensive
CPU/Julia evals (the reference runs one subprocess per sample,
``hallthruster_jl`` at reference ``models/thruster.py``), we train a small
MLP ensemble on tens of thousands of evals. The result is natively jittable,
so MCMC posteriors, Sobol' sweeps and Monte Carlo ride the device path
(SURVEY.md §3.4) instead of a host-NumPy loop.

Architecture notes (TPU-first):
- one network maps ALL normalized system inputs to ALL normalized outputs
  (scalars + SVD latents of field quantities) — a single fused matmul chain
  instead of per-component host hops;
- an ensemble of K independent members is trained *jointly* via ``jax.vmap``
  over stacked parameters (one XLA program, K-way batched matmuls feed the
  MXU); the predictive is the ensemble mean and the spread is an epistemic
  error estimate;
- a failure head (extra logit) learns the solver's failure boundary
  (quenched/blown-up samples are NaN-masked by the wrapper guards, same
  semantics as reference solver crashes) so UQ callers can avoid or mask the
  failed region — this is the "cheap classifier for the failure boundary"
  of the domain-trimming workflow;
- field latents are scaled per block (single RMS scale), not per column, so
  the MSE loss weights latent columns by their true variance contribution —
  per-column standardization would over-weight noise-dominated trailing modes.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MLPSurrogate", "generate_training_data", "load_training_caches"]


def load_training_caches(run_dir, system, pattern: str = "{name}_mlp_train_data*.pkl",
                         drop: tuple = ("discharge_current_trace", "trace_times")):
    """Concatenate every labeled training-data cache in ``run_dir``.

    Caches are per-seed (``generate_training_data`` resumes only at fixed
    (n, seed)); the labeled inputs ride along inside the cached outputs, so the
    pairing cannot drift even if the sampling filter changed between runs.
    Returns ``(samples, outputs)`` dicts of stacked arrays.
    """
    in_names = [v.name for v in system.inputs()]
    paths = sorted(Path(run_dir).glob(pattern.format(name=system.name)))
    if not paths:
        raise FileNotFoundError(f"no training-data caches under {run_dir}")
    all_s, all_o = [], []
    for path in paths:
        with open(path, "rb") as fd:
            cache = pickle.load(fd)
        outputs, n_done = cache["outputs"], cache["done"]
        if not all(k in outputs for k in in_names):
            raise ValueError(f"{path}: cache lacks input columns")
        all_s.append({k: np.asarray(outputs[k])[:n_done] for k in in_names})
        all_o.append({k: np.asarray(v)[:n_done] for k, v in outputs.items() if k not in drop})
        system.logger.info("%s: %d labeled samples", path.name, n_done)
    samples = {k: np.concatenate([s[k] for s in all_s]) for k in all_s[0]}
    outputs = {k: np.concatenate([o[k] for o in all_o]) for k in all_o[0]
               if all(k in o for o in all_o)}
    return samples, outputs


def generate_training_data(system, n: int, seed: int = 0, chunk: int = 1024,
                           cache_path=None, use_pdf=("calibration", "nuisance"),
                           domain_filter=None) -> tuple[dict, dict]:
    """Sample the prior and label ``n`` points with the true coupled model, in
    resumable chunks.

    Each completed chunk is appended to ``cache_path`` (a pickle of the partial
    dataset), so an interrupted run (device preemption, wall-clock) restarts
    where it left off — the TPU-side analogue of the reference's per-sample
    subprocess checkpointing (reference ``gen_data.py:236-259`` persists every
    model output file).
    """
    samples = system.sample_inputs(n, seed=seed, use_pdf=list(use_pdf), domain_filter=domain_filter)
    samples = {k: np.asarray(v) for k, v in samples.items()}
    done, outputs = 0, {}
    if cache_path is not None and Path(cache_path).exists():
        with open(cache_path, "rb") as fd:
            d = pickle.load(fd)
        if d.get("n") == n and d.get("seed") == seed:
            done, outputs = d["done"], d["outputs"]
            system.logger.info("resuming training-data generation at %d/%d", done, n)
    while done < n:
        m = min(chunk, n - done)
        batch = {k: v[done:done + m] for k, v in samples.items()}
        out = system.predict(batch, use_model="best")
        out = {k: np.asarray(v) for k, v in out.items()
               if np.asarray(v).dtype.kind == "f" and np.asarray(v).ndim >= 1}
        for k, v in out.items():
            outputs[k] = v if k not in outputs else np.concatenate([outputs[k], v], axis=0)
        done += m
        system.logger.info("training data: %d/%d evaluated", done, n)
        if cache_path is not None:
            tmp = Path(cache_path).with_suffix(".tmp")
            with open(tmp, "wb") as fd:
                pickle.dump({"n": n, "seed": seed, "done": done, "outputs": outputs}, fd)
            tmp.replace(cache_path)
    return samples, outputs


def _net_forward(params, x):
    """Single-member forward: ``x (n, D) -> (n, P+1)`` (last column = fail logit).

    Matmuls pinned to float32: the TPU default (bf16 passes) adds ~0.4%
    per-output jitter, which a Metropolis likelihood integrates into O(10+)
    log-posterior noise — measured round 4: the same stretch-ensemble chain
    accepted 0.30 on CPU (true f32) and 0.01 on TPU (bf16 default)."""
    h = x
    for w, b in params[:-1]:
        h = jax.nn.gelu(jnp.dot(h, w, precision=jax.lax.Precision.HIGHEST) + b)
    w, b = params[-1]
    return jnp.dot(h, w, precision=jax.lax.Precision.HIGHEST) + b


class MLPSurrogate:
    """End-to-end surrogate of a coupled :class:`~hallthrusterpem_tpu.core.system.System`.

    Drop-in for the UQ surfaces of the MISC component surrogates: ``predict``
    returns denormalized scalars and latent coefficients for compressed fields
    (same contract as ``ComponentSurrogate.predict``), ``reconstruct_field``
    maps latents back to profiles, and ``as_jax_fn`` returns a pure jittable
    prediction function.
    """

    kind = "mlp"

    def __init__(self, system, hidden: Sequence[int] = (256, 256, 256),
                 ensemble: int = 8, seed: int = 0, log_outputs="auto"):
        self.system = system
        self.hidden = tuple(int(h) for h in hidden)
        self.ensemble = int(ensemble)
        self.seed = int(seed)
        self.in_vars = list(system.inputs())
        self.out_slices = None  # built lazily (raw-field widths come from data)
        self.n_out = None
        self.n_in = len(self.in_vars)
        self.params = None      # list of (W, b) with leading ensemble dim
        self.x_mu = self.x_sd = None
        self.y_mu = self.y_sd = None
        #: scalar outputs regressed in log10 space. The pem_v0 response spans
        #: ~2 decades on I_d across the prior (0.5-36 A: the anomalous-transport
        #: scale a_1 is LogUniform over 1.5 decades), so plain MSE concentrates
        #: capacity on the high-current tail — measured: global rel-L2 0.21 with
        #: MEDIAN per-sample error 12%. Log targets make the loss relative.
        #: "auto" = any all-positive scalar with >5x dynamic range in the data.
        self.log_outputs = log_outputs
        self.log_names: Optional[set] = None if log_outputs == "auto" else set(log_outputs or ())
        self.train_info: dict = {}

    # ------------------------------------------------------------------ layout
    def _build_layout(self, outputs: Optional[dict] = None, spec=None):
        """Output slices ``(var, start, size, kind)`` over all system outputs.

        Compressed fields become latent blocks; uncompressed fields ("raw") take
        their width from the data (or a saved layout spec); everything else is a
        scalar column.
        """
        if self.out_slices is not None:
            return
        spec_sizes = {name: (size, kind) for name, size, kind in (spec or [])}
        self.out_slices = []
        start = 0
        for var in self.system.outputs():
            if var.compression is not None and var.compression.projection is not None:
                size, kind = var.compression.latent_size, "latent"
            elif var.name in spec_sizes:
                size, kind = spec_sizes[var.name]
            elif outputs is not None and var.name in outputs:
                arr = np.asarray(outputs[var.name])
                size = int(np.prod(arr.shape[1:])) if arr.ndim > 1 else 1
                kind = "raw" if size > 1 else "scalar"
            else:
                size, kind = 1, "scalar"
            self.out_slices.append((var, start, size, kind))
            start += size
        self.n_out = start

    # ------------------------------------------------------------------ packing
    def pack_inputs(self, samples: dict, normalized: bool = False) -> np.ndarray:
        cols = []
        for var in self.in_vars:
            val = np.asarray(samples[var.name], dtype=np.float64).reshape(-1)
            cols.append(val if normalized else np.asarray(var.normalize(val)))
        return np.stack(cols, axis=1)

    def pack_outputs(self, outputs: dict) -> np.ndarray:
        """Named outputs -> ``(N, n_out)`` normalized/compressed matrix (NaN rows
        mark failed samples). Fields are re-gridded onto the compression coords
        when the model grid differs (the ``{var}_coords`` convention)."""
        self._build_layout(outputs)
        n = None
        for var, *_ in self.out_slices:
            if var.name in outputs:
                n = np.asarray(outputs[var.name]).shape[0]
                break
        if n is None:
            raise KeyError("none of the system outputs found in the dataset")
        if self.log_names is None:  # resolve "auto" on first (training) pack
            # robust trigger (advisor round-4): the quantile ratio p99/p1, not
            # max/min — one near-zero positive sample in an otherwise
            # narrow-range output must not flip it to log targets and
            # permanently sign-constrain its predictions
            self.log_names = set()
            for var, start, size, kind in self.out_slices:
                if kind != "scalar" or var.name not in outputs:
                    continue
                val = np.asarray(outputs[var.name], dtype=np.float64).reshape(-1)
                pos = val[np.isfinite(val)]
                if pos.size and (pos > 0).all():
                    p1, p99 = np.percentile(pos, [1, 99])
                    if p1 > 0 and p99 > 5 * p1:
                        self.log_names.add(var.name)
        mat = np.full((n, self.n_out), np.nan)
        for var, start, size, kind in self.out_slices:
            if var.name not in outputs:
                continue
            val = np.asarray(outputs[var.name], dtype=np.float64)
            if kind == "scalar" and var.name in self.log_names:
                # log-space regression target; non-positive values cannot be
                # represented and are masked like failures
                with np.errstate(divide="ignore", invalid="ignore"):
                    mat[:, start] = np.where(val > 0, np.log10(np.maximum(val, 1e-300)), np.nan)
                continue
            if kind == "latent":
                comp_coords = var.compression.coords
                model_coords = outputs.get(f"{var.name}_coords")
                if (comp_coords is not None and model_coords is not None
                        and val.shape[-1] != np.asarray(comp_coords).shape[-1]):
                    from hallthrusterpem_tpu.ops.interp import interp1d

                    mc = np.asarray(model_coords, dtype=np.float64)
                    cc = np.asarray(comp_coords, dtype=np.float64)
                    val = np.asarray(interp1d(cc, mc[0] if mc.ndim > 1 else mc, jnp.asarray(val)))
                normed = np.asarray(var.normalize(val))
                mat[:, start:start + size] = np.asarray(var.compression.compress(normed))
            else:
                mat[:, start:start + size] = np.asarray(var.normalize(val)).reshape(n, size)
        return mat

    # ------------------------------------------------------------------ training
    def _init_params(self, key):
        sizes = [self.n_in, *self.hidden, self.n_out + 1]
        params = []
        for din, dout in zip(sizes[:-1], sizes[1:]):
            key, k = jax.random.split(key)
            w = jax.random.normal(k, (self.ensemble, din, dout)) * jnp.sqrt(2.0 / din)
            params.append((w.astype(jnp.float32), jnp.zeros((self.ensemble, 1, dout), jnp.float32)))
        return params

    def fit(self, samples: dict, outputs: dict, *, steps: int = 6000, batch: int = 2048,
            lr: float = 2e-3, weight_decay: float = 1e-5, cls_weight: float = 0.2,
            val_frac: float = 0.1, normalized: bool = False, verbose: bool = True,
            log_every: int = 500) -> dict:
        """Train the ensemble on a ``(samples, outputs)`` dataset.

        Failed samples (any non-finite output) contribute only to the failure
        head; finite elements contribute per-element MSE so partially-valid
        rows are still used.
        """
        import optax

        X = self.pack_inputs(samples, normalized=normalized).astype(np.float32)
        Y = self.pack_outputs(outputs).astype(np.float32)
        n = X.shape[0]
        fail = ~np.isfinite(Y).all(axis=1)

        self.x_mu = X.mean(axis=0)
        self.x_sd = np.where(X.std(axis=0) > 1e-12, X.std(axis=0), 1.0)
        ok = np.isfinite(Y)
        y_mu = np.zeros(self.n_out, np.float32)
        y_sd = np.ones(self.n_out, np.float32)
        for var, start, size, kind in self.out_slices:
            blk = Y[:, start:start + size]
            m = ok[:, start:start + size]
            if not m.any():
                continue
            mu = np.array([blk[m[:, j], j].mean() if m[:, j].any() else 0.0 for j in range(size)])
            y_mu[start:start + size] = mu
            cen = np.where(m, blk - mu, 0.0)
            if size > 1:
                # one RMS scale per field block: keep the latent/grid columns'
                # relative variance so the loss mirrors the field L2 error
                rms = float(np.sqrt((cen**2).sum() / max(m.sum(), 1)))
                y_sd[start:start + size] = max(rms, 1e-12)
            else:
                sd = float(np.sqrt((cen[:, 0] ** 2).sum() / max(m[:, 0].sum(), 1)))
                y_sd[start] = max(sd, 1e-12)
        self.y_mu, self.y_sd = y_mu, y_sd

        Xs = (X - self.x_mu) / self.x_sd
        Ys = np.where(ok, (np.nan_to_num(Y) - y_mu) / y_sd, 0.0)
        mask = ok.astype(np.float32)

        rng = np.random.default_rng(self.seed)
        perm = rng.permutation(n)
        n_val = max(int(n * val_frac), 1) if val_frac > 0 else 0
        val_idx, tr_idx = perm[:n_val], perm[n_val:]
        xt, yt, mt, ft = (jnp.asarray(Xs[tr_idx]), jnp.asarray(Ys[tr_idx]),
                          jnp.asarray(mask[tr_idx]), jnp.asarray(fail[tr_idx], jnp.float32))
        n_tr = len(tr_idx)
        batch = min(batch, n_tr)

        key = jax.random.PRNGKey(self.seed)
        params = self._init_params(key)
        sched = optax.cosine_decay_schedule(lr, steps, alpha=0.02)
        opt = optax.adamw(sched, weight_decay=weight_decay)
        opt_state = opt.init(params)
        fwd = jax.vmap(_net_forward, in_axes=(0, 0))  # member-specific minibatches

        def loss_fn(p, xb, yb, mb, fb):
            out = fwd(p, xb)                        # (K, b, P+1)
            pred, logit = out[..., :-1], out[..., -1]
            mse = jnp.sum(mb * (pred - yb) ** 2) / jnp.maximum(jnp.sum(mb), 1.0)
            bce = jnp.mean(optax.sigmoid_binary_cross_entropy(logit, fb))
            return mse + cls_weight * bce, (mse, bce)

        @jax.jit
        def step(p, s, k):
            idx = jax.random.randint(k, (self.ensemble, batch), 0, n_tr)
            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, xt[idx], yt[idx], mt[idx], fb=ft[idx])
            upd, s = opt.update(g, s, p)
            return optax.apply_updates(p, upd), s, l, aux

        history = []
        for i in range(steps):
            key, k = jax.random.split(key)
            params, opt_state, l, (mse, bce) = step(params, opt_state, k)
            if verbose and (i % log_every == 0 or i == steps - 1):
                history.append({"step": i, "loss": float(l), "mse": float(mse), "bce": float(bce)})
                self.system.logger.info("mlp step %d: loss %.4f (mse %.4f, bce %.4f)", i, l, mse, bce)
        self.params = params

        info = {"n_train": int(n_tr), "n_val": int(n_val), "steps": steps, "batch": batch,
                "fail_frac": float(fail.mean()), "history": history}
        if n_val:
            xv, yv, mv = Xs[val_idx], Ys[val_idx], mask[val_idx]
            pv = np.asarray(self._raw_predict(jnp.asarray(xv)))[..., :-1]
            num = (mv * (pv - yv) ** 2).sum()
            info["val_rmse"] = float(np.sqrt(num / max(mv.sum(), 1.0)))
            pf = 1 / (1 + np.exp(-np.asarray(self._raw_predict(jnp.asarray(xv)))[..., -1]))
            info["val_fail_acc"] = float(((pf > 0.5) == fail[val_idx]).mean())
        self.train_info = info
        return info

    # ------------------------------------------------------------------ prediction
    def _raw_predict(self, xs):
        """Standardized inputs -> ensemble-mean standardized outputs ``(n, P+1)``
        (regression cols averaged in standardized space; fail logit averaged)."""
        out = jax.vmap(_net_forward, in_axes=(0, None))(self.params, xs)
        return out.mean(axis=0)

    def as_jax_fn(self, training: bool = True, qoi_ind: Optional[Sequence[str]] = None):
        """Pure jittable ``samples (model units) -> outputs`` function: scalars
        denormalized, compressed fields as latent coefficients (the
        ``System.as_jax_fn`` contract; SURVEY.md §3.4)."""
        if self.params is None:
            raise ValueError("MLPSurrogate is not trained")
        params = self.params
        x_mu, x_sd = jnp.asarray(self.x_mu), jnp.asarray(self.x_sd)
        y_mu, y_sd = jnp.asarray(self.y_mu), jnp.asarray(self.y_sd)
        in_vars = list(self.in_vars)
        slices = list(self.out_slices)
        log_names = frozenset(self.log_names or ())
        keep = None if qoi_ind is None else set(qoi_ind)

        def fn(samples: dict) -> dict:
            cols = [jnp.asarray(in_vars[d].normalize(samples[in_vars[d].name])).reshape(-1)
                    for d in range(len(in_vars))]
            xs = (jnp.stack(cols, axis=1) - x_mu) / x_sd
            out = jax.vmap(_net_forward, in_axes=(0, None))(params, xs.astype(jnp.float32))
            mean = out.mean(axis=0)
            pred = mean[..., :-1] * y_sd + y_mu
            result = {}
            for var, start, size, kind in slices:
                if keep is not None and var.name not in keep:
                    continue
                block = pred[..., start:start + size]
                if kind == "latent":
                    result[var.name] = block
                elif kind == "raw":
                    result[var.name] = var.denormalize(block)
                elif var.name in log_names:
                    result[var.name] = 10.0 ** block[..., 0]
                else:
                    result[var.name] = var.denormalize(block[..., 0])
            result["sys_fail_prob"] = jax.nn.sigmoid(mean[..., -1])
            return result

        return fn

    def predict(self, samples: dict, training: bool = False, denormalize: bool = True,
                normalized: bool = False, qoi_ind=None) -> dict:
        """Batched prediction (host entry point; one device dispatch)."""
        fn = self.as_jax_fn(qoi_ind=qoi_ind)
        if normalized:
            samples = {v.name: v.denormalize(np.asarray(samples[v.name]))
                       for v in self.in_vars if v.name in samples}
        out = fn({k: jnp.asarray(np.asarray(v).reshape(-1)) for k, v in samples.items()})
        return {k: np.asarray(v) for k, v in out.items()}

    def fail_prob(self, samples: dict, normalized: bool = False) -> np.ndarray:
        """Failure-boundary classifier head: P(sample fails the solver guards)."""
        return self.predict(samples, normalized=normalized)["sys_fail_prob"]

    def reconstruct_field(self, var_name: str, latents):
        for var, start, size, kind in self.out_slices:
            if var.name == var_name and kind == "latent":
                return var.denormalize(var.compression.reconstruct(jnp.asarray(latents)))
        raise KeyError(f"{var_name} is not a compressed field output of {self.system.name}")

    def test_errors(self, xt: dict, yt: dict, targets=None) -> dict:
        """Held-out relative-L2 per target (same metric as the MISC trainer:
        global norm ratio for scalars, per-sample mean for fields)."""
        from hallthrusterpem_tpu.surrogate.train import relative_l2

        pred = self.predict(xt)
        errors = {}
        for var, start, size, kind in self.out_slices:
            name = var.name
            if (targets and name not in targets) or name not in yt:
                continue
            ref = np.asarray(yt[name], dtype=np.float64)
            got = np.asarray(pred[name], dtype=np.float64)
            if kind == "latent":
                got = np.asarray(self.reconstruct_field(name, got))
                if got.shape != ref.shape:
                    continue
            errors[name] = relative_l2(got, ref, axis=-1 if ref.ndim > 1 else None)
        return errors

    # ------------------------------------------------------------------ io
    def to_state(self) -> dict:
        return {
            "kind": self.kind, "hidden": self.hidden, "ensemble": self.ensemble,
            "seed": self.seed,
            "params": [(np.asarray(w), np.asarray(b)) for w, b in (self.params or [])],
            "x_mu": np.asarray(self.x_mu) if self.x_mu is not None else None,
            "x_sd": np.asarray(self.x_sd) if self.x_sd is not None else None,
            "y_mu": np.asarray(self.y_mu) if self.y_mu is not None else None,
            "y_sd": np.asarray(self.y_sd) if self.y_sd is not None else None,
            "train_info": {k: v for k, v in self.train_info.items() if k != "history"},
            "layout": [(v.name, size, kind) for v, _, size, kind in (self.out_slices or [])],
            "log_names": sorted(self.log_names or ()),
        }

    @classmethod
    def from_state(cls, state: dict, system) -> "MLPSurrogate":
        surr = cls(system, hidden=state["hidden"], ensemble=state["ensemble"], seed=state["seed"])
        spec = state.get("layout") or []
        surr._build_layout(spec=spec)
        built = [(v.name, size, kind) for v, _, size, kind in surr.out_slices]
        if spec and built != [tuple(s) for s in spec]:
            raise ValueError(f"system outputs {built} do not match saved MLP layout {spec}")
        surr.params = [(jnp.asarray(w), jnp.asarray(b)) for w, b in state["params"]]
        surr.x_mu, surr.x_sd = state["x_mu"], state["x_sd"]
        surr.y_mu, surr.y_sd = state["y_mu"], state["y_sd"]
        surr.log_names = set(state.get("log_names", ()))
        surr.train_info = state.get("train_info", {})
        return surr

    def save(self, path):
        with open(path, "wb") as fd:
            pickle.dump(self.to_state(), fd)

    @classmethod
    def load(cls, path, system) -> "MLPSurrogate":
        with open(Path(path), "rb") as fd:
            return cls.from_state(pickle.load(fd), system)

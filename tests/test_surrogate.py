"""Surrogate engine tests: knots, tensor interpolation, MISC sets, adaptive fit."""

import numpy as np
import pytest

from hallthrusterpem_tpu.core.component import Component
from hallthrusterpem_tpu.core.system import System
from hallthrusterpem_tpu.core.variables import Variable
from hallthrusterpem_tpu.surrogate import (
    ComponentSurrogate,
    TensorInterpolant,
    candidate_neighbors,
    combination_coefficients,
    fit_system,
    is_downward_closed,
    knots_for_level,
    leja_sequence,
    relative_l2,
    tensor_grid_points,
)


def test_leja_nested_and_bounded():
    x5 = leja_sequence(5)
    x9 = leja_sequence(9)
    assert np.allclose(x9[:5], x5)  # nested
    assert np.all(np.abs(x9) <= 1.0)
    assert len(np.unique(np.round(x9, 10))) == 9


def test_knots_for_level_mapping():
    k = knots_for_level(2, knots_per_level=2, domain=(10.0, 20.0))
    assert k.shape == (5,)
    assert k.min() >= 10.0 and k.max() <= 20.0
    k0 = knots_for_level(0, 2, domain=(10.0, 20.0))
    assert k0.shape == (1,)


def test_tensor_interpolant_polynomial_exactness():
    # 5 knots per dim -> exact for polys up to degree 4 per dim
    knots = (knots_for_level(2, 2, (-1, 1)), knots_for_level(2, 2, (0, 2)))
    pts = tensor_grid_points(knots)
    f = lambda x: (3 * x[..., 0] ** 3 - x[..., 0] + 0.5) * (x[..., 1] ** 2 + 1.0)
    vals = f(pts)[:, None]
    interp = TensorInterpolant(knots=knots, values=vals.reshape(5, 5, 1))
    rng = np.random.default_rng(0)
    xq = np.stack([rng.uniform(-1, 1, 200), rng.uniform(0, 2, 200)], axis=-1)
    got = np.asarray(interp(xq))[:, 0]
    assert np.max(np.abs(got - f(xq))) < 5e-4  # f32 eval
    # exact at the nodes
    got_nodes = np.asarray(interp(pts))[:, 0]
    assert np.max(np.abs(got_nodes - f(pts))) < 1e-4


def test_linear_basis_interpolates_and_is_local():
    """The piecewise-linear hat basis reproduces knot values exactly and keeps an
    extreme corner value LOCAL — the failure mode that motivates it: a global
    Lagrange basis rings across the whole domain from one wild-but-finite knot."""
    from hallthrusterpem_tpu.surrogate.interpolate import TensorInterpolant
    from hallthrusterpem_tpu.surrogate.knots import knots_for_level

    kn = knots_for_level(2, 2, domain=(-1.0, 1.0))  # 5 Leja points incl. both ends
    vals = np.sin(kn)  # smooth baseline
    vals_wild = vals.copy()
    vals_wild[np.argmin(kn)] += 50.0  # extreme response at the left corner

    lin = TensorInterpolant(knots=(kn,), values=vals_wild[:, None], method="linear")
    lag = TensorInterpolant(knots=(kn,), values=vals_wild[:, None], method="lagrange")

    # both exact at the knots
    for interp in (lin, lag):
        got = np.asarray(interp(kn[:, None]))[:, 0]
        assert np.allclose(got, vals_wild, atol=1e-9), interp.method

    # away from the wild corner (right half), the linear basis is unpolluted
    xq = np.linspace(0.2, 1.0, 50)[:, None]
    err_lin = np.max(np.abs(np.asarray(lin(xq))[:, 0] - np.sin(xq[:, 0])))
    err_lag = np.max(np.abs(np.asarray(lag(xq))[:, 0] - np.sin(xq[:, 0])))
    assert err_lin < 0.05, err_lin
    assert err_lag > 1.0, err_lag  # the polynomial rings: documents the motivation

    # constant extrapolation beyond the end knots
    got = np.asarray(lin(np.array([[1.5], [-1.5]])))[:, 0]
    assert got[0] == np.asarray(lin(np.array([[1.0]])))[0, 0]


def test_linear_basis_misc_convergence_and_jit_parity():
    """MISC combination telescopes with the hat basis, and the jittable
    evaluation path matches the host path."""
    import jax.numpy as jnp

    comp = _toy_component()
    comp.training_data = {"method": "sparse-grid", "knots_per_level": 2,
                          "interpolation": "linear"}
    comp.data_fidelity = (4, 4)
    surr = ComponentSurrogate(comp)
    assert surr.interpolation == "linear"
    surr.initialize()
    rng = np.random.default_rng(0)
    for _ in range(14):
        best, best_err = None, -1.0
        for kappa in sorted(surr.candidates):
            err, _, cost = surr.candidate_surplus(kappa, num_refine=128, rng=rng)
            if err / max(cost, 1e-9) > best_err:
                best_err, best = err / max(cost, 1e-9), kappa
        surr.activate_index(best)
    xt = {"x": rng.uniform(-1, 1, 300), "y": rng.uniform(0, 2, 300)}
    truth = comp.fn(xt)
    pred = surr.predict(xt, training=True)
    assert relative_l2(np.asarray(pred["f"]), truth["f"]) < 0.05
    assert relative_l2(np.asarray(pred["g"]), truth["g"]) < 0.05

    jfn = surr.as_jax_fn()
    jpred = jfn({k: jnp.asarray(v) for k, v in xt.items()})
    assert relative_l2(np.asarray(jpred["f"]), np.asarray(pred["f"])) < 1e-4


def test_combination_coefficients_vs_bruteforce():
    """The O(|S|^2 d) coefficient sweep must match the 2^d inclusion-exclusion."""
    from itertools import product
    import random

    rng = random.Random(0)
    for d in (2, 3, 4):
        # build a random downward-closed set
        s = {(0,) * d}
        for _ in range(15):
            base = rng.choice(sorted(s))
            i = rng.randrange(d)
            cand = base[:i] + (base[i] + 1,) + base[i + 1 :]
            if all(cand[:j] + (cand[j] - 1,) + cand[j + 1 :] in s for j in range(d) if cand[j] > 0):
                s.add(cand)
        brute = {}
        for kappa in s:
            c = sum((-1) ** sum(e) for e in product((0, 1), repeat=d)
                    if tuple(k + de for k, de in zip(kappa, e)) in s)
            if c:
                brute[kappa] = c
        assert combination_coefficients(s) == brute


def test_misc_sets():
    active = {(0, 0), (1, 0), (0, 1)}
    assert is_downward_closed(active)
    assert not is_downward_closed({(0, 0), (2, 0)})
    cands = candidate_neighbors(active, [2, 2])
    assert (2, 0) in cands and (1, 1) in cands and (0, 2) in cands
    coeffs = combination_coefficients(active)
    # classic Smolyak: c(0,0) = -1, c(1,0) = c(0,1) = 1
    assert coeffs == {(0, 0): -1, (1, 0): 1, (0, 1): 1}
    # telescoping identity: sum of coefficients == 1
    assert sum(coeffs.values()) == 1


def _toy_component():
    def model(inputs):
        x = np.asarray(inputs["x"])
        y = np.asarray(inputs["y"])
        return {"f": np.sin(2 * x) * np.exp(-0.3 * y) + 0.1 * y, "g": x * y}

    return Component(
        name="Toy",
        model=model,
        inputs=[
            Variable(name="x", domain=(-1.0, 1.0)),
            Variable(name="y", domain=(0.0, 2.0)),
        ],
        outputs=[Variable(name="f"), Variable(name="g")],
        data_fidelity=(3, 3),
    )


def test_component_surrogate_converges():
    comp = _toy_component()
    surr = ComponentSurrogate(comp)
    surr.initialize()
    rng = np.random.default_rng(0)
    for _ in range(10):
        best, best_err = None, -1.0
        for kappa in sorted(surr.candidates):
            err, _, cost = surr.candidate_surplus(kappa, num_refine=128, rng=rng)
            if err / max(cost, 1e-9) > best_err:
                best_err, best = err / max(cost, 1e-9), kappa
        surr.activate_index(best)
    xt = {"x": rng.uniform(-1, 1, 300), "y": rng.uniform(0, 2, 300)}
    truth = comp.fn(xt)
    pred = surr.predict(xt, training=True)
    err_f = relative_l2(np.asarray(pred["f"]), truth["f"])
    err_g = relative_l2(np.asarray(pred["g"]), truth["g"])
    assert err_f < 0.01, err_f
    assert err_g < 1e-3, err_g  # bilinear: exact once (1,1) activates


def test_fit_system_and_history():
    comp = _toy_component()
    system = System([comp], name="toy-system")
    rng = np.random.default_rng(1)
    xt = {"x": rng.uniform(-1, 1, 200), "y": rng.uniform(0, 2, 200)}
    yt = comp.fn(xt)
    history = fit_system(system, max_iter=8, max_tol=1e-6, test_set=(xt, yt), verbose=False)
    assert len(history) >= 1
    errs = [h["test_error"]["f"] for h in history if "f" in h["test_error"]]
    assert errs[-1] < 0.05
    assert errs[-1] <= errs[0] * 1.5  # error broadly decreasing
    # surrogate-backed System.predict
    pred = system.predict(xt, use_model=None, training=True)
    assert relative_l2(np.asarray(pred["f"]), yt["f"]) < 0.05
    # allocation accounting has entries
    alloc, model_cost, overhead, evals = system.get_allocation()
    assert evals["Toy"]
    # clear() drops surrogate state (reference fit_surr.py:144)
    system.clear()
    assert comp.surrogate is None


def test_field_output_with_compression():
    """Field outputs train on SVD latents and reconstruct (gen_data.py:261-294 flow)."""
    zgrid = np.linspace(0, 1, 40)

    def model(inputs):
        x = np.asarray(inputs["x"])[..., None]
        prof = np.sin(3 * zgrid)[None, :] * x + zgrid[None, :] ** 2
        return {"prof": prof, "prof_coords": np.broadcast_to(zgrid, prof.shape)}

    from hallthrusterpem_tpu.core.variables import Compression

    var_out = Variable(name="prof", compression=Compression(reconstruction_tol=0.01))
    comp = Component(
        name="FieldToy",
        model=model,
        inputs=[Variable(name="x", domain=(-1.0, 1.0))],
        outputs=[var_out],
        data_fidelity=(3,),
    )
    # build the compression map from snapshots (the gen_data 'compression' stage)
    rng = np.random.default_rng(0)
    snaps = model({"x": rng.uniform(-1, 1, 50)})["prof"]
    var_out.compression.coords = zgrid
    var_out.compression.compute_map(snaps.T)
    assert var_out.compression.latent_size <= 3

    surr = ComponentSurrogate(comp)
    surr.initialize()
    for kappa in [(1,), (2,)]:
        surr.activate_index(kappa)
    x_test = {"x": rng.uniform(-1, 1, 64)}
    pred = surr.predict(x_test, training=True)
    rec = np.asarray(surr.reconstruct_field("prof", pred["prof"]))
    truth = model(x_test)["prof"]
    assert rec.shape == truth.shape
    assert relative_l2(rec, truth, axis=-1) < 0.01


def test_surplus_weights_per_variable_not_per_column():
    """A many-latent field output must not outvote scalar outputs in refinement
    (measured failure: a 22-latent u_ion out-voted I_d/T 22:1 per column, so a
    120-iter pem_v0 fit never refined mdot_a/V_a — the top I_d/T drivers)."""
    from hallthrusterpem_tpu.core.variables import Compression

    zgrid = np.linspace(0, 1, 30)

    def model(inputs):
        x = np.asarray(inputs["x"])  # drives the scalar strongly
        y = np.asarray(inputs["y"])  # drives the field weakly (but high-rank)
        prof = 1.0 + 0.05 * np.sin(np.pi * np.outer(1.0 + y, zgrid))
        return {
            "s": 1.0 + 4.0 * x,
            "prof": prof,
            "prof_coords": np.broadcast_to(zgrid, prof.shape),
        }

    prof_var = Variable(name="prof", compression=Compression(rank=20))
    comp = Component(
        name="BlockToy",
        model=model,
        inputs=[Variable(name="x", domain=(-1.0, 1.0)),
                Variable(name="y", domain=(-1.0, 1.0))],
        outputs=[Variable(name="s"), prof_var],
        data_fidelity=(2, 2),
    )
    rng = np.random.default_rng(0)
    snaps = model({"x": rng.uniform(-1, 1, 40), "y": rng.uniform(-1, 1, 40)})["prof"]
    prof_var.compression.coords = zgrid
    # rank-20 latent so the field has many columns to (wrongly) vote with
    prof_var.compression.compute_map(snaps.T)
    assert prof_var.compression.latent_size >= 10

    surr = ComponentSurrogate(comp)
    surr.initialize()
    err_x, _, _ = surr.candidate_surplus((1, 0), num_refine=256, rng=np.random.default_rng(1))
    err_y, _, _ = surr.candidate_surplus((0, 1), num_refine=256, rng=np.random.default_rng(1))
    assert err_x > err_y, (err_x, err_y)


def test_multifidelity_thruster_regridding():
    """Model-fidelity refinement changes the solver grid (ncells = 50*(a0+2));
    field outputs must regrid onto the compression coordinates before SVD
    projection (the '{var}_coords' convention, SURVEY.md §5.7)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from hallthrusterpem_tpu.core.component import Component
    from hallthrusterpem_tpu.core.variables import Compression, Variable
    from hallthrusterpem_tpu.models.thruster import hallthruster_jl
    from hallthrusterpem_tpu.surrogate.component import ComponentSurrogate

    def fast_thruster(inputs, model_fidelity=(0, 0)):
        return hallthruster_jl(
            inputs, thruster="SPT-100", model_fidelity=model_fidelity,
            simulation={"dt": 1.0e-8, "duration": 6e-5},
            postprocess={"average_start_time": 3e-5},
            fidelity_function=lambda alpha, cfgd: {
                "num_cells": 40 + 20 * alpha[0], "ncharge": 1, "dt": 1.0e-8,
            },
        )

    u_ion = Variable(name="u_ion", norm="linear(1e-3)",
                     compression=Compression(reconstruction_tol=0.05))
    comp = Component(
        name="FastThruster",
        model=fast_thruster,
        model_fidelity=(1, 0),
        data_fidelity=(1, 1),
        inputs=[
            Variable(name="V_a", domain=(280.0, 320.0)),
            Variable(name="mdot_a", domain=(4e-6, 6e-6), norm="linear(1e6)"),
        ],
        outputs=[Variable(name="T", domain=(0.0, 0.2)), u_ion],
    )

    # compression map on the base (alpha=0) grid: 42 points
    base = fast_thruster({"V_a": np.linspace(280, 320, 6), "mdot_a": np.full(6, 5e-6)})
    u_ion.compression.coords = np.asarray(base["u_ion_coords"])[0]
    u_ion.compression.data_matrix = np.asarray(u_ion.normalize(base["u_ion"])).T
    u_ion.compression.compute_map()

    surr = ComponentSurrogate(comp)
    surr.initialize()
    # activate a model-fidelity (alpha) refinement: solver now runs 60 cells (62 pts)
    surr.activate_index((1, 0, 0, 0))
    assert (1, 0, 0, 0) in surr.interpolants
    assert (1, 0) in surr.eval_cache and (0, 0) in surr.eval_cache  # separate caches

    pred = surr.predict({"V_a": np.array([300.0]), "mdot_a": np.array([5e-6])}, training=True)
    rec = np.asarray(surr.reconstruct_field("u_ion", pred["u_ion"]))
    assert rec.shape == (1, 42)  # reconstructed on the compression grid
    assert np.all(np.isfinite(rec))
    t_pred = float(np.asarray(pred["T"])[0])
    assert np.isfinite(t_pred) and -0.01 <= t_pred < 0.2  # tiny test sim: near-zero OK


def test_as_jax_fn_matches_numpy_predict():
    """Device-side jittable surrogate == host NumPy predict (toy system)."""
    import jax

    comp = _toy_component()
    surr = ComponentSurrogate(comp)
    surr.initialize()
    for kappa in [(1, 0), (0, 1), (1, 1)]:
        surr.activate_index(kappa)

    rng = np.random.default_rng(3)
    xt = {"x": rng.uniform(-1, 1, 50), "y": rng.uniform(0, 2, 50)}
    host = surr.predict(xt, training=True)
    fn = jax.jit(surr.as_jax_fn(training=True))
    dev = fn({k: np.asarray(v, np.float32) for k, v in xt.items()})
    for k in ("f", "g"):
        assert np.allclose(np.asarray(dev[k]), np.asarray(host[k], dtype=float), atol=2e-4)


def test_failed_knots_take_zero_surplus_imputation():
    """NaN knots are imputed with the current active combination's prediction
    (zero hierarchical surplus), not the batch median — a median injects a
    (median - prediction) jump wherever a candidate grid clips a failure
    region."""
    def model(inputs):
        x = np.asarray(inputs["x"], dtype=float)
        y = np.asarray(inputs["y"], dtype=float)
        f = 2.0 * x + y
        return {"f": np.where(x > 0.5, np.nan, f)}

    comp = Component(
        name="FailCorner",
        model=model,
        inputs=[Variable(name="x", domain=(-1.0, 1.0)),
                Variable(name="y", domain=(-1.0, 1.0))],
        outputs=[Variable(name="f")],
        data_fidelity=(2, 2),
    )
    surr = ComponentSurrogate(comp)
    surr.initialize()  # base knot x=0: clean
    interp, _ = surr.build_interpolant((1, 0))  # knots include x=1 -> NaN
    # locate the repaired knot's grid row and compare against the active
    # (base) combination's prediction there
    pts = interp.grid_points()
    rep = surr._repaired_keys[()]
    assert rep, "expected at least one repaired knot"
    rows = [i for i, p in enumerate(pts) if surr._point_key(p) in rep]
    vals = interp.values.reshape(len(pts), -1)
    expect = surr._combined_eval(pts[rows], surr.active)
    assert np.allclose(vals[rows], expect, atol=1e-12)


def test_reimpute_active_preserves_combination():
    """The periodic re-imputation sweep must not disturb a consistent active
    set: it freezes imputation values from the FULL combination and never
    mutates the set (round-3 regression: rebuilding an index against 'the
    others' removed a non-maximal index from the downward-closed set, breaking
    the MISC telescoping — predictions ran away by 12 orders of magnitude)."""
    def model(inputs):
        x = np.asarray(inputs["x"], dtype=float)
        y = np.asarray(inputs["y"], dtype=float)
        f = 2.0 * x + y
        return {"f": np.where(x > 0.5, np.nan, f)}

    comp = Component(
        name="FailCorner",
        model=model,
        inputs=[Variable(name="x", domain=(-1.0, 1.0)),
                Variable(name="y", domain=(-1.0, 1.0))],
        outputs=[Variable(name="f")],
        data_fidelity=(2, 2),
    )
    surr = ComponentSurrogate(comp)
    surr.initialize()
    for kappa in [(1, 0), (0, 1), (1, 1), (2, 0)]:
        surr.build_interpolant(kappa)
        surr.activate_index(kappa)
    xq = np.stack([np.linspace(-1, 0.4, 33), np.linspace(-1, 1, 33)], axis=-1)
    before = surr._combined_eval(xq, surr.active)
    active_before = set(surr.active)
    n = surr.reimpute_active()
    assert n > 0, "expected repaired interpolants to be swept"
    assert surr.active == active_before
    after = surr._combined_eval(xq, surr.active)
    assert np.all(np.isfinite(after))
    assert np.allclose(before, after, rtol=1e-8, atol=1e-10)


def test_fidelity_ladder_climbs_with_baseline_failures():
    """A model whose ALL fidelity levels fail on the same ~25% of the domain must
    still climb the alpha ladder (round-2 regression: an absolute failure
    penalty vetoed every alpha advance for a breathing solver whose wide prior
    has a baseline failure rate, freezing training at the coarse model)."""
    import numpy as np
    from hallthrusterpem_tpu.core.system import System
    from hallthrusterpem_tpu.core.component import Component
    from hallthrusterpem_tpu.core.variables import Variable

    def model(inputs, model_fidelity=None, **kw):
        x = np.asarray(inputs["x"])
        a = (model_fidelity or (0,))[0]
        y = np.sin(3 * x) + (0.0 if a >= 1 else 0.4 + 0.2 * x)  # alpha=0 biased
        y = np.where((x * 37.0) % 1.0 < 0.25, np.nan, y)  # alpha-independent failures
        return {"y": y, "model_cost": np.full_like(x, 10.0 if a else 0.1)}

    comp = Component(name="c", model=model, vectorized=True,
                     inputs=[Variable(name="x", domain=(0, 1), nominal=0.5)],
                     outputs=[Variable(name="y")], model_fidelity=(1,), data_fidelity=(3,))
    system = System(name="s", components=[comp])
    xt = {"x": np.linspace(0, 1, 200)}
    system.fit(max_iter=10, num_refine=64, test_set=(xt, {"y": np.sin(3 * xt["x"])}),
               targets=["y"], verbose=False)
    alphas = {k[:1] for k in comp.surrogate.active}
    assert (1,) in alphas, f"alpha ladder never climbed: {sorted(comp.surrogate.active)}"


def test_all_failing_alpha_never_promoted():
    """An alpha level that fails EVERYWHERE has no refinable signal and must
    stay vetoed (the round-1 advisor finding), baseline failures or not."""
    import numpy as np
    from hallthrusterpem_tpu.core.system import System
    from hallthrusterpem_tpu.core.component import Component
    from hallthrusterpem_tpu.core.variables import Variable

    def model(inputs, model_fidelity=None, **kw):
        x = np.asarray(inputs["x"])
        if (model_fidelity or (0,))[0] == 0:
            return {"y": np.sin(3 * x) + 0.1 * x}
        return {"y": np.full_like(x, np.nan)}

    comp = Component(name="c", model=model, vectorized=True,
                     inputs=[Variable(name="x", domain=(0, 1), nominal=0.5)],
                     outputs=[Variable(name="y")], model_fidelity=(1,), data_fidelity=(2,))
    system = System(name="s", components=[comp])
    system.fit(max_iter=8, num_refine=64, verbose=False)
    alphas = {k[:1] for k in comp.surrogate.active}
    assert (1,) not in alphas


def test_training_cache_roundtrip(tmp_path):
    """fit(cache_interval=N) persists model-eval caches; load_training_cache
    restores them so a restarted fit makes no new model calls (round-2: this
    kwarg was previously accepted-but-ignored)."""
    import numpy as np
    from hallthrusterpem_tpu.core.system import System
    from hallthrusterpem_tpu.core.component import Component
    from hallthrusterpem_tpu.core.variables import Variable

    calls = [0]

    def model(inputs, model_fidelity=None, **kw):
        x = np.asarray(inputs["x"])
        calls[0] += len(x)
        return {"y": np.sin(3 * x)}

    def build():
        comp = Component(name="c", model=model, vectorized=True,
                         inputs=[Variable(name="x", domain=(0, 1), nominal=0.5)],
                         outputs=[Variable(name="y")], data_fidelity=(3,))
        return comp, System(name="s", components=[comp])

    comp, system = build()
    system.root_dir = str(tmp_path)
    system.fit(max_iter=4, num_refine=32, cache_interval=2, verbose=False)
    cache = tmp_path / "cache" / "s_training_cache.pkl"
    assert cache.exists()
    fresh_calls = calls[0]

    comp2, system2 = build()
    n = system2.load_training_cache(cache)
    assert n > 0
    calls[0] = 0
    system2.fit(max_iter=4, num_refine=32, verbose=False)
    assert calls[0] < fresh_calls

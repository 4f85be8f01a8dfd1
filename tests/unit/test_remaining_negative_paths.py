"""Negative-path coverage for the remaining public builders and selectors (closing the
"every public class hit by at least one negative test" gap): active-learning builders,
constrained/batch EHVI, HIPPO, inducing-point selectors, deep models, and logging
filters."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.data import Dataset
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box

EMPTY = Dataset.from_arrays(jnp.zeros((0, 1)), jnp.zeros((0, 1)))


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=1.0)


@pytest.fixture
def dataset():
    return mk_dataset([[-0.5], [0.0], [0.5]], [[0.26], [0.01], [0.24]])


# ------------------------------------------------------------------ active learning


def test_expected_feasibility_validation():
    from trieste_tpu.acquisition.function.active_learning import ExpectedFeasibility

    with pytest.raises(ValueError):
        ExpectedFeasibility(0.5, alpha=0.0)
    with pytest.raises(ValueError):
        ExpectedFeasibility(0.5, delta=3)


def test_expected_feasibility_peaks_at_threshold_crossing(model, dataset):
    """Both criteria peak where the mean crosses the threshold (x^2 = t)."""
    from trieste_tpu.acquisition.function.active_learning import ExpectedFeasibility

    for delta in (1, 2):
        fn = ExpectedFeasibility(0.25, delta=delta).prepare_acquisition_function(
            model, dataset
        )
        xs = jnp.linspace(0.0, 1.0, 21)[:, None, None]
        vals = np.asarray(fn(xs))[:, 0]
        peak_x = float(xs[np.argmax(vals), 0, 0])
        assert abs(peak_x - 0.5) < 0.15  # crossing at sqrt(0.25)


@pytest.mark.parametrize("delta", [1, 2])
def test_expected_feasibility_matches_monte_carlo(model, dataset, delta):
    """The closed forms equal E[max(0, (alpha*s)^delta - |T - f|^delta)] under the
    posterior (reference definition, ``active_learning.py:178-199``) — the sign
    convention the ranjan fix is pinned to."""
    from trieste_tpu.acquisition.function.active_learning import ExpectedFeasibility

    alpha, T = 0.8, 0.25
    fn = ExpectedFeasibility(T, alpha=alpha, delta=delta).prepare_acquisition_function(
        model, dataset
    )
    rng = np.random.default_rng(0)
    for xq in (0.2, 0.5, 0.9):
        mean, var = model.predict(jnp.array([[xq]]))
        m, s = float(mean[0, 0]), float(np.sqrt(var[0, 0]))
        f = rng.normal(m, s, size=200_000)
        mc = np.maximum(0.0, (alpha * s) ** delta - np.abs(T - f) ** delta).mean()
        got = float(fn(jnp.array([[[xq]]]))[0, 0])
        np.testing.assert_allclose(got, mc, rtol=0.02)


def test_ivr_requires_exact_gp(model, dataset):
    from trieste_tpu.acquisition.function.active_learning import (
        IntegratedVarianceReduction,
    )

    builder = IntegratedVarianceReduction(jnp.linspace(-1, 1, 8)[:, None])
    with pytest.raises(NotImplementedError):
        builder.prepare_acquisition_function(model, dataset)


def test_ivr_prefers_informative_points(dataset):
    """On a real GP, IVR is higher for a query near the integration mass than far away."""
    from trieste_tpu.acquisition.function.active_learning import (
        IntegratedVarianceReduction,
    )
    from trieste_tpu.models.gp.gpr import GaussianProcessRegression
    from trieste_tpu.models.gp.posterior import GPRParams
    from trieste_tpu.ops.kernels import stationary

    X = jnp.array([[-0.8], [0.8]])
    ds = Dataset.from_arrays(X, jnp.sin(X))
    gpr = GaussianProcessRegression(
        GPRParams(
            kernel=stationary("rbf", 1.0, 0.3),
            noise_variance=jnp.asarray(1e-4),
            mean_constant=jnp.asarray(0.0),
        ),
        ds,
    )
    integration = jnp.linspace(-0.2, 0.2, 16)[:, None]
    fn = IntegratedVarianceReduction(integration).prepare_acquisition_function(gpr, ds)
    near = float(fn(jnp.array([[[0.0]]]))[0, 0])
    far = float(fn(jnp.array([[[0.79]]]))[0, 0])
    assert near > far


def test_bald_requires_batch_of_one(model, dataset):
    from trieste_tpu.acquisition.function.active_learning import (
        BayesianActiveLearningByDisagreement,
    )

    fn = BayesianActiveLearningByDisagreement().prepare_acquisition_function(
        model, dataset
    )
    out = fn(jnp.zeros((4, 1, 1)))
    assert out.shape == (4, 1)


def test_predictive_variance_jitter_breaks_singularity(dataset):
    """A singular joint covariance (duplicated batch point) has det 0; the jitter keeps
    the builder's value strictly positive."""
    from trieste_tpu.acquisition.function.active_learning import PredictiveVariance
    from trieste_tpu.models.gp.gpr import GaussianProcessRegression
    from trieste_tpu.models.gp.posterior import GPRParams
    from trieste_tpu.ops.kernels import stationary

    X = jnp.array([[-0.5], [0.5]])
    ds = Dataset.from_arrays(X, jnp.sin(X))
    gpr = GaussianProcessRegression(
        GPRParams(
            kernel=stationary("rbf", 1.0, 0.5),
            noise_variance=jnp.asarray(1e-6),
            mean_constant=jnp.asarray(0.0),
        ),
        ds,
    )
    fn = PredictiveVariance(jitter=1e-6).prepare_acquisition_function(gpr, ds)
    x = jnp.array([[[0.1], [0.1]]])  # duplicated point -> singular 2x2 covariance
    val = float(fn(x)[0, 0])
    assert val > 0.0


# ------------------------------------------------------------------ constrained / batch EHVI, HIPPO


def _mo_stack():
    from trieste_tpu.models.gp.gpr import GaussianProcessRegression
    from trieste_tpu.models.gp.posterior import GPRParams
    from trieste_tpu.models.interfaces import ModelStack
    from trieste_tpu.ops.kernels import stationary

    X = jnp.array([[-0.5], [0.0], [0.5]])

    def fit(y):
        return GaussianProcessRegression(
            GPRParams(
                kernel=stationary("rbf", 1.0, 0.5),
                noise_variance=jnp.asarray(1e-4),
                mean_constant=jnp.asarray(0.0),
            ),
            Dataset.from_arrays(X, y),
        )

    stack = ModelStack((fit(X), 1), (fit(-X), 1))
    return stack, Dataset.from_arrays(X, jnp.concatenate([X, -X], axis=-1))


def test_echvi_requires_objective_dataset(model):
    from trieste_tpu.acquisition.function.function import ProbabilityOfFeasibility
    from trieste_tpu.acquisition.function.multi_objective import (
        ExpectedConstrainedHypervolumeImprovement,
    )

    echvi = ExpectedConstrainedHypervolumeImprovement(
        OBJECTIVE, ProbabilityOfFeasibility(0.5).using(OBJECTIVE)
    )
    with pytest.raises(ValueError):
        echvi.prepare_acquisition_function({OBJECTIVE: model}, None)


def test_echvi_reduces_to_ehvi_when_all_feasible():
    from trieste_tpu.acquisition.function.function import ProbabilityOfFeasibility
    from trieste_tpu.acquisition.function.multi_objective import (
        ExpectedConstrainedHypervolumeImprovement,
        ExpectedHypervolumeImprovement,
    )

    stack, ds = _mo_stack()
    pof = ProbabilityOfFeasibility(1e6).using(OBJECTIVE)  # always feasible
    echvi = ExpectedConstrainedHypervolumeImprovement(OBJECTIVE, pof)
    fn = echvi.prepare_acquisition_function({OBJECTIVE: stack}, {OBJECTIVE: ds})
    ehvi = ExpectedHypervolumeImprovement().prepare_acquisition_function(stack, ds)
    pof_fn = ProbabilityOfFeasibility(1e6).prepare_acquisition_function(stack, ds)
    x = jnp.array([[[0.2]]])
    np.testing.assert_allclose(
        np.asarray(fn(x)), np.asarray(ehvi(x)) * np.asarray(pof_fn(x)), rtol=1e-6
    )


def test_hippo_requires_exact_gp_members(model, dataset):
    """Penalization needs member posterior caches; a plain fake model is rejected when
    pending points force the penalty computation."""
    from trieste_tpu.acquisition.function.multi_objective import HIPPO

    builder = HIPPO()
    fn = builder.prepare_acquisition_function(model, dataset)
    with pytest.raises(NotImplementedError):
        builder.update_acquisition_function(
            fn, model, dataset, pending_points=jnp.array([[0.2]])
        )


def test_hippo_penalizes_near_pending():
    from trieste_tpu.acquisition.function.multi_objective import HIPPO

    stack, ds = _mo_stack()
    builder = HIPPO()
    fn = builder.prepare_acquisition_function(stack, ds)
    x = jnp.array([[[0.2]]])
    free = float(fn(x)[0, 0])
    penalized_fn = builder.update_acquisition_function(
        fn, stack, ds, pending_points=jnp.array([[0.2]])
    )
    penalized = float(penalized_fn(x)[0, 0])
    assert penalized < free


# ------------------------------------------------------------------ inducing selectors


def _sparse_setup(key):
    from trieste_tpu.models.gp import build_sgpr

    space = Box([0.0], [1.0])
    X = space.sample(key, 30)
    ds = Dataset.from_arrays(X, jnp.sin(5 * X))
    return space, ds, build_sgpr(ds, space, num_inducing_points=8)


@pytest.mark.parametrize("name", ["uniform", "subsample", "kmeans", "dpp", "cvr", "cir"])
def test_inducing_selectors_produce_requested_count(name, key):
    from trieste_tpu.models.gp.inducing_points import (
        ConditionalImprovementReduction,
        ConditionalVarianceReduction,
        DPPInducingPointSelector,
        KMeansInducingPointSelector,
        RandomSubSampleInducingPointSelector,
        UniformInducingPointSelector,
    )

    space, ds, sgpr = _sparse_setup(key)
    selector = {
        "uniform": lambda: UniformInducingPointSelector(space),
        "subsample": lambda: RandomSubSampleInducingPointSelector(),
        "kmeans": lambda: KMeansInducingPointSelector(),
        "dpp": lambda: DPPInducingPointSelector(),
        "cvr": lambda: ConditionalVarianceReduction(),
        "cir": lambda: ConditionalImprovementReduction(),
    }[name]()
    Z = selector.calculate_inducing_points(
        sgpr.params.inducing_points, sgpr, ds
    )
    assert Z.shape == sgpr.params.inducing_points.shape
    assert bool(jnp.all(jnp.isfinite(Z)))


def test_inducing_selector_recalc_flag(key):
    """With recalc_every_model_update=False the second call returns the held points."""
    from trieste_tpu.models.gp.inducing_points import KMeansInducingPointSelector

    space, ds, sgpr = _sparse_setup(key)
    sel = KMeansInducingPointSelector(recalc_every_model_update=False)
    Z1 = sel.calculate_inducing_points(sgpr.params.inducing_points, sgpr, ds)
    more = ds + Dataset.from_arrays(jnp.array([[0.123]]), jnp.array([[0.5]]))
    Z2 = sel.calculate_inducing_points(Z1, sgpr, more)
    np.testing.assert_array_equal(np.asarray(Z1), np.asarray(Z2))


# ------------------------------------------------------------------ deep models


def test_deep_ensemble_builder_validation(key):
    from trieste_tpu.models.ensembles.deep_ensemble import build_deep_ensemble

    ds = mk_dataset([[0.0], [1.0]], [[0.0], [1.0]])
    with pytest.raises(ValueError):
        build_deep_ensemble(ds, ensemble_size=0)
    with pytest.raises(ValueError):
        build_deep_ensemble(ds, hidden_units=())


def test_deep_ensemble_predict_shapes(key):
    from trieste_tpu.models.ensembles.deep_ensemble import build_deep_ensemble

    X = jnp.linspace(0.0, 1.0, 10)[:, None]
    ds = Dataset.from_arrays(X, jnp.sin(3 * X))
    model = build_deep_ensemble(ds, ensemble_size=3, num_train_steps=10)
    model.optimize(ds)
    mean, var = model.predict(jnp.array([[0.3], [0.7]]))
    assert mean.shape == (2, 1) and var.shape == (2, 1)
    assert bool(jnp.all(var > 0))
    samples = model.sample(jax.random.PRNGKey(0), jnp.array([[0.3]]), 5)
    assert samples.shape == (5, 1, 1)


def test_deep_gp_builder_validation(key):
    from trieste_tpu.models.deepgp.deep_gp import build_vanilla_deep_gp

    ds = mk_dataset([[0.0], [1.0]], [[0.0], [1.0]])
    with pytest.raises((ValueError, TypeError)):
        build_vanilla_deep_gp(ds, Box([0.0], [1.0]), num_layers=0)


# ------------------------------------------------------------------ logging filters


def test_summary_filter_hides_underscore_names():
    from trieste_tpu.logging import default_summary_filter

    assert default_summary_filter("loss")
    assert not default_summary_filter("_internal")


def test_set_step_number_validation():
    from trieste_tpu.logging import get_step_number, set_step_number

    set_step_number(7)
    assert get_step_number() == 7
    with pytest.raises(ValueError):
        set_step_number(-1)
    set_step_number(0)

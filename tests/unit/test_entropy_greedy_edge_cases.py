"""Entropy / greedy-batch / CTS / MO-acquisition edge cases (role of the remaining
raise/shape families of reference ``tests/unit/acquisition/function``):
constructor validation, empty-dataset raises, penalization monotonicity, fantasizer
semantics, EHVI contracts, and cost weighting."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function.entropy import (
    GIBBON,
    MUMBO,
    CostWeighting,
    MinValueEntropySearch,
)
from trieste_tpu.acquisition.function.greedy_batch import Fantasizer, LocalPenalization
from trieste_tpu.acquisition.function.multi_objective import (
    ExpectedHypervolumeImprovement,
    BatchMonteCarloExpectedHypervolumeImprovement,
)
from trieste_tpu.acquisition.sampler import ExactThompsonSampler
from trieste_tpu.data import Dataset
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box


@pytest.fixture
def space():
    return Box([-1.0], [1.0])


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=1.0)


@pytest.fixture
def dataset():
    return mk_dataset([[-0.5], [0.0], [0.5]], [[0.26], [0.01], [0.24]])


EMPTY = Dataset.from_arrays(jnp.zeros((0, 1)), jnp.zeros((0, 1)))


# ------------------------------------------------------------------ MES / GIBBON / MUMBO


def test_mes_constructor_validation(space):
    with pytest.raises(ValueError):
        MinValueEntropySearch(space, num_samples=0)
    with pytest.raises(ValueError):
        MinValueEntropySearch(space, grid_size=0)
    with pytest.raises(ValueError, match="sample_min_value"):
        MinValueEntropySearch(space, min_value_sampler=ExactThompsonSampler())


def test_mes_empty_dataset_raises(space, model):
    with pytest.raises(ValueError):
        MinValueEntropySearch(space, grid_size=32).prepare_acquisition_function(
            model, EMPTY
        )


def test_mes_update_resamples_min_values(space, model, dataset):
    builder = MinValueEntropySearch(space, grid_size=32, key=jax.random.PRNGKey(0))
    fn = builder.prepare_acquisition_function(model, dataset)
    fn2 = builder.update_acquisition_function(fn, model, dataset)
    x = jnp.array([[[0.9]]])
    # new min-value samples -> (almost surely) different values
    assert float(fn(x)[0, 0]) != float(fn2(x)[0, 0])


def test_gibbon_constructor_validation(space):
    with pytest.raises(ValueError):
        GIBBON(space, num_samples=0)
    with pytest.raises(ValueError):
        GIBBON(space, grid_size=-1)


def test_gibbon_empty_dataset_raises(space, model):
    with pytest.raises(ValueError):
        GIBBON(space, grid_size=32).prepare_acquisition_function(model, EMPTY)


def test_gibbon_pending_points_change_values(space, model, dataset):
    builder = GIBBON(space, grid_size=32, key=jax.random.PRNGKey(0))
    free = builder.prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.4]]])
    v_free = float(free(x)[0, 0])
    repelled = builder.update_acquisition_function(
        free, model, dataset, pending_points=jnp.array([[0.4]])
    )
    v_rep = float(repelled(x)[0, 0])
    # repulsion at an occupied location strictly reduces the acquisition
    assert v_rep < v_free


def test_mumbo_requires_multifidelity_interface(space, model, dataset):
    """MUMBO needs covariance_with_top_fidelity; a plain model is rejected."""
    builder = MUMBO(space, grid_size=32)
    with pytest.raises((AttributeError, ValueError, TypeError)):
        fn = builder.prepare_acquisition_function(model, dataset)
        fn(jnp.array([[[0.4, 0.0]]]))


def test_cost_weighting_divides_by_fidelity_cost(model, dataset):
    builder = CostWeighting([2.0, 4.0])
    fn = builder.prepare_acquisition_function(model, dataset)
    # input carries the fidelity in the trailing column
    x_lo = jnp.array([[[0.4, 0.0]]])
    x_hi = jnp.array([[[0.4, 1.0]]])
    v_lo, v_hi = float(fn(x_lo)[0, 0]), float(fn(x_hi)[0, 0])
    assert v_lo == pytest.approx(2.0 * v_hi, rel=1e-6)  # 1/cost weighting


# ------------------------------------------------------------------ local penalization


def test_local_penalization_validation(space):
    with pytest.raises(ValueError):
        LocalPenalization(space, num_samples=0)
    with pytest.raises(ValueError):
        LocalPenalization(space, penalizer="banana")


def test_local_penalization_no_pending_preserves_base_ordering(space, model, dataset):
    """With no pending points the (positivity-wrapped) acquisition ranks points exactly
    like the base EI (reference applies penalization on a positive-transformed base)."""
    from trieste_tpu.acquisition.function.function import ExpectedImprovement

    builder = LocalPenalization(space, num_samples=64, key=jax.random.PRNGKey(0))
    fn = builder.prepare_acquisition_function(model, dataset)
    base = ExpectedImprovement().prepare_acquisition_function(model, dataset)
    # strictly positive xs: EI is strictly decreasing there, so ranks are unambiguous
    x = jnp.linspace(0.05, 0.95, 7)[:, None, None]
    got = np.asarray(fn(x))[:, 0]
    want = np.asarray(base(x))[:, 0]
    assert np.all(np.argsort(got) == np.argsort(want))


def test_local_penalization_monotone_in_pending_count(space, model, dataset):
    """More pending points near a location penalize it more."""
    builder = LocalPenalization(space, num_samples=64, key=jax.random.PRNGKey(0))
    fn0 = builder.prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.3]]])
    one = builder.update_acquisition_function(fn0, model, dataset,
                                              pending_points=jnp.array([[0.3]]))
    v1 = float(one(x)[0, 0])
    two = builder.update_acquisition_function(one, model, dataset,
                                              pending_points=jnp.array([[0.3], [0.3]]))
    v2 = float(two(x)[0, 0])
    v0 = float(fn0(x)[0, 0])
    assert v1 < v0 and v2 < v1


# ------------------------------------------------------------------ fantasizer


def test_fantasizer_validation():
    with pytest.raises(ValueError):
        Fantasizer(fantasize_method="bogus")


def _fitted_gpr():
    from trieste_tpu.models.gp.gpr import GaussianProcessRegression
    from trieste_tpu.models.gp.posterior import GPRParams
    from trieste_tpu.ops.kernels import stationary

    # sparse design far from the pending point (0.25), so the prior variance there is
    # large and the fantasy-conditioned collapse is unambiguous
    X = jnp.array([[-0.9], [-0.5], [0.8], [0.95]])
    Y = jnp.sin(2.0 * X)
    ds = Dataset.from_arrays(X, Y)
    params = GPRParams(
        kernel=stationary("rbf", 1.0, 0.4),
        noise_variance=jnp.asarray(1e-4),
        mean_constant=jnp.asarray(0.0),
    )
    return GaussianProcessRegression(params, ds), ds


def test_fantasizer_kb_pins_pending_mean():
    """Kriging-believer fantasy: after conditioning on the pending point with its
    posterior-mean observation, the variance there collapses."""
    model, ds = _fitted_gpr()
    builder = Fantasizer()
    fn = builder.prepare_acquisition_function(model, ds)
    pending = jnp.array([[0.25]])
    fant = builder.update_acquisition_function(fn, model, ds, pending_points=pending)
    # the fantasized model's EI at the pending point is ~0 (no improvement possible
    # where the outcome is already 'known')
    v_at_pending = float(fant(pending[None])[0, 0])
    v_elsewhere = float(fant(jnp.array([[[0.8]]]))[0, 0])
    assert v_at_pending < v_elsewhere + 1e-9
    assert v_at_pending < 1e-3


def test_fantasized_model_variance_collapses_at_pending():
    model, ds = _fitted_gpr()
    pending = jnp.array([[0.25]])
    mean_pending, _ = model.predict(pending)
    fantasy = Dataset.from_arrays(pending, mean_pending)
    from trieste_tpu.acquisition.function.greedy_batch import _FantasizedModel

    fant = _FantasizedModel(model, fantasy)
    _, var = fant.predict(pending)
    _, var_base = model.predict(pending)
    assert float(var[0, 0]) < float(var_base[0, 0]) / 10.0
    # and predictions away from the fantasy are barely affected
    far = jnp.array([[-0.9]])
    _, var_far = fant.predict(far)
    _, var_far_base = model.predict(far)
    np.testing.assert_allclose(float(var_far[0, 0]), float(var_far_base[0, 0]), rtol=0.2)


# ------------------------------------------------------------------ continuous TS


def test_negate_trajectory_function_flips_sign():
    from jax.tree_util import Partial

    from trieste_tpu.acquisition.function.continuous_thompson_sampling import (
        negate_trajectory_function,
    )

    def traj_fn(x):
        return jnp.sum(jnp.asarray(x), axis=-1)

    neg = negate_trajectory_function(Partial(traj_fn))
    x = jnp.array([[1.0, 2.0]])
    np.testing.assert_allclose(np.asarray(neg(x)), -np.asarray(traj_fn(x)))


def test_parallel_cts_requires_trajectory_sampler(model, dataset):
    from trieste_tpu.acquisition.function.continuous_thompson_sampling import (
        ParallelContinuousThompsonSampling,
    )

    builder = ParallelContinuousThompsonSampling(key=jax.random.PRNGKey(0))
    with pytest.raises((AttributeError, ValueError, TypeError)):
        fn = builder.prepare_acquisition_function(model, dataset)
        fn.as_partial(2)  # materializing the batch needs model.trajectory_sampler


# ------------------------------------------------------------------ EHVI


@pytest.fixture
def mo_models():
    from tests.util.models import GaussianProcess
    from trieste_tpu.ops.kernels import stationary

    m1 = GaussianProcess([lambda x: x[..., 0]], [stationary("rbf", 1.0, 0.5)])
    m2 = GaussianProcess([lambda x: -x[..., 0]], [stationary("rbf", 1.0, 0.5)])
    from trieste_tpu.models.interfaces import ModelStack

    return ModelStack((m1, 1), (m2, 1))


@pytest.fixture
def mo_gpr_stack():
    """A stack of two REAL fitted GPRs (needed for joint sampling in MC EHVI)."""
    from trieste_tpu.models.gp.gpr import GaussianProcessRegression
    from trieste_tpu.models.gp.posterior import GPRParams
    from trieste_tpu.models.interfaces import ModelStack
    from trieste_tpu.ops.kernels import stationary

    X = jnp.array([[-0.5], [0.0], [0.5]])

    def fit(y):
        params = GPRParams(
            kernel=stationary("rbf", 1.0, 0.5),
            noise_variance=jnp.asarray(1e-4),
            mean_constant=jnp.asarray(0.0),
        )
        return GaussianProcessRegression(params, Dataset.from_arrays(X, y))

    m1 = fit(X)  # y1 = x
    m2 = fit(-X)  # y2 = -x
    obs = jnp.concatenate([X, -X], axis=-1)
    return ModelStack((m1, 1), (m2, 1)), Dataset.from_arrays(X, obs)


def test_ehvi_empty_dataset_raises(mo_models):
    with pytest.raises(ValueError):
        ExpectedHypervolumeImprovement().prepare_acquisition_function(mo_models, EMPTY)


def test_ehvi_positive_and_zero_far_from_front(mo_models):
    ds = mk_dataset([[-0.5], [0.0], [0.5]], [[-0.5], [0.0], [0.5]])
    # observations from the stack at the data points
    obs, _ = mo_models.predict(ds.trimmed_query_points)
    ds = Dataset.from_arrays(ds.trimmed_query_points, obs)
    fn = ExpectedHypervolumeImprovement().prepare_acquisition_function(mo_models, ds)
    vals = fn(jnp.linspace(-0.9, 0.9, 7)[:, None, None])
    assert vals.shape == (7, 1)
    assert bool(jnp.all(vals >= 0))


def test_batch_mc_ehvi_validation():
    with pytest.raises(ValueError):
        BatchMonteCarloExpectedHypervolumeImprovement(0)


def test_batch_mc_ehvi_close_to_analytic_on_single_point(mo_gpr_stack):
    stack, ds = mo_gpr_stack
    analytic = ExpectedHypervolumeImprovement().prepare_acquisition_function(stack, ds)
    mc = BatchMonteCarloExpectedHypervolumeImprovement(
        2048, key=jax.random.PRNGKey(0)
    ).prepare_acquisition_function(stack, ds)
    x = jnp.array([[[0.2]]])
    np.testing.assert_allclose(
        np.asarray(mc(x)), np.asarray(analytic(x)), rtol=0.2, atol=5e-3
    )

"""Acquisition-function edge-case matrix (role of the raise/shape/update families of
reference ``tests/unit/acquisition/function/test_function.py``, 1501 LoC): empty-dataset
raises, batch-rank shape contracts, constructor validation, analytic corner values,
update semantics, and combination builders."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.combination import Map, Product, Reducer, Sum
from trieste_tpu.acquisition.function.function import (
    AugmentedExpectedImprovement,
    BatchExpectedImprovement,
    BatchMonteCarloExpectedImprovement,
    ExpectedConstrainedImprovement,
    ExpectedImprovement,
    MakePositive,
    MonteCarloAugmentedExpectedImprovement,
    MonteCarloExpectedImprovement,
    MultipleOptimismNegativeLowerConfidenceBound,
    NegativeLowerConfidenceBound,
    NegativePredictiveMean,
    ProbabilityOfFeasibility,
    ProbabilityOfImprovement,
)
from trieste_tpu.data import Dataset
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=1.0)


@pytest.fixture
def dataset():
    return mk_dataset([[-1.0], [0.0], [1.0]], [[1.1], [0.1], [0.9]])


EMPTY = Dataset.from_arrays(jnp.zeros((0, 1)), jnp.zeros((0, 1)))

DATA_REQUIRING_BUILDERS = [
    ExpectedImprovement,
    ProbabilityOfImprovement,
    AugmentedExpectedImprovement,
    lambda: MonteCarloExpectedImprovement(10),
    lambda: MonteCarloAugmentedExpectedImprovement(10),
    lambda: BatchMonteCarloExpectedImprovement(10),
    lambda: BatchExpectedImprovement(16),
]


@pytest.mark.parametrize("factory", DATA_REQUIRING_BUILDERS)
def test_builders_raise_on_missing_dataset(factory, model):
    with pytest.raises(ValueError):
        factory().prepare_acquisition_function(model, None)


@pytest.mark.parametrize("factory", DATA_REQUIRING_BUILDERS)
def test_builders_raise_on_empty_dataset(factory, model):
    with pytest.raises(ValueError):
        factory().prepare_acquisition_function(model, EMPTY)


@pytest.mark.parametrize(
    "factory",
    [
        ExpectedImprovement,
        ProbabilityOfImprovement,
        AugmentedExpectedImprovement,
        lambda: NegativeLowerConfidenceBound(1.0),
        lambda: ProbabilityOfFeasibility(0.5),
    ],
)
def test_scalar_functions_reject_query_batches(factory, model, dataset):
    """Reference shape-assert parity: non-batch functions must raise on B > 1 rather
    than silently score the first batch element."""
    fn = factory().prepare_acquisition_function(model, dataset)
    with pytest.raises(ValueError, match="batch size"):
        fn(jnp.zeros((4, 3, 1)))  # batch of 3


@pytest.mark.parametrize("rank_extra", [0, 1, 2])
def test_ei_output_shape_across_leading_ranks(model, dataset, rank_extra):
    fn = ExpectedImprovement().prepare_acquisition_function(model, dataset)
    shape = (2,) * rank_extra + (5, 1, 1)
    out = fn(jnp.zeros(shape))
    assert out.shape == shape[:-2] + (1,)


def test_lcb_beta_validation():
    with pytest.raises(ValueError):
        NegativeLowerConfidenceBound(beta=-0.1)


def test_negative_predictive_mean_is_beta_zero(model, dataset):
    npm = NegativePredictiveMean().prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.7]]])
    np.testing.assert_allclose(np.asarray(npm(x)), [[-0.49]], atol=1e-6)  # -(0.7^2)


def test_lcb_value_matches_closed_form(model, dataset):
    beta = 1.5
    fn = NegativeLowerConfidenceBound(beta).prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.5]]])
    want = -(0.25 - beta * 1.0)  # mean x^2=0.25, std=1
    np.testing.assert_allclose(np.asarray(fn(x)), [[want]], atol=1e-6)


def test_pof_at_mean_equals_half(model, dataset):
    fn = ProbabilityOfFeasibility(0.25).prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.5]]])  # mean = 0.25 = threshold
    np.testing.assert_allclose(np.asarray(fn(x)), [[0.5]], atol=1e-6)


def test_pof_threshold_property():
    assert ProbabilityOfFeasibility(0.37).threshold == 0.37


def test_aei_equals_ei_times_augmentation(model, dataset):
    aei = AugmentedExpectedImprovement().prepare_acquisition_function(model, dataset)
    ei = ExpectedImprovement().prepare_acquisition_function(model, dataset)
    x = jnp.linspace(-1.0, 1.0, 7)[:, None, None]
    noise = 1.0
    augmentation = 1.0 - np.sqrt(noise) / np.sqrt(noise + 1.0)
    np.testing.assert_allclose(
        np.asarray(aei(x)), np.asarray(ei(x)) * augmentation, atol=1e-8
    )


def test_aei_requires_observation_noise(dataset):
    class NoNoise:
        def predict(self, x):
            x = jnp.asarray(x)
            return jnp.sum(x**2, -1, keepdims=True), jnp.ones(x.shape[:-1] + (1,))

        def predict_partial(self):
            from jax.tree_util import Partial

            return Partial(self.predict)

    with pytest.raises((AttributeError, ValueError, TypeError, NotImplementedError)):
        AugmentedExpectedImprovement().prepare_acquisition_function(NoNoise(), dataset)


def test_ei_update_moves_eta(model, dataset):
    """update_acquisition_function rebinds eta without changing function identity
    requirements (reference in-place update, ``function.py:190-223``)."""
    builder = ExpectedImprovement()
    fn = builder.prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.9]]])
    before = float(fn(x)[0, 0])
    # new dataset excludes x=0, so eta = min posterior mean rises from 0 to 0.25
    worse = mk_dataset([[-1.0], [0.5], [1.0]], [[1.1], [0.3], [0.9]])
    fn2 = builder.update_acquisition_function(fn, model, worse)
    after = float(fn2(x)[0, 0])
    assert after != before


@pytest.mark.parametrize("bad_size", [0, -3])
def test_mc_builders_invalid_sample_size(bad_size):
    for cls in (
        MonteCarloExpectedImprovement,
        MonteCarloAugmentedExpectedImprovement,
        BatchMonteCarloExpectedImprovement,
        BatchExpectedImprovement,
    ):
        with pytest.raises(ValueError):
            cls(bad_size)


def test_mc_ei_converges_to_analytic(model, dataset):
    mc = MonteCarloExpectedImprovement(4096, key=jax.random.PRNGKey(0))
    analytic = ExpectedImprovement()
    fn_mc = mc.prepare_acquisition_function(model, dataset)
    fn_an = analytic.prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.3]], [[0.8]]])
    np.testing.assert_allclose(np.asarray(fn_mc(x)), np.asarray(fn_an(x)), rtol=0.1)


def test_batch_mc_ei_on_singleton_batch_matches_ei(model, dataset):
    qei = BatchMonteCarloExpectedImprovement(4096, key=jax.random.PRNGKey(0))
    fn_q = qei.prepare_acquisition_function(model, dataset)
    fn_an = ExpectedImprovement().prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.4]]])
    np.testing.assert_allclose(np.asarray(fn_q(x)), np.asarray(fn_an(x)), rtol=0.1)


def test_batch_mc_ei_batch_dominance(model, dataset):
    """qEI of a batch is at least the qEI of any of its members (monotonicity in q).
    The reparametrization sampler freezes its base draws at the first batch size
    (reference ``BatchReparametrizationSampler``), so each size gets a fresh function."""
    single_fn = BatchMonteCarloExpectedImprovement(
        2048, key=jax.random.PRNGKey(1)
    ).prepare_acquisition_function(model, dataset)
    pair_fn = BatchMonteCarloExpectedImprovement(
        2048, key=jax.random.PRNGKey(1)
    ).prepare_acquisition_function(model, dataset)
    single = float(single_fn(jnp.array([[[0.5]]]))[0, 0])
    pair = float(pair_fn(jnp.array([[[0.5], [-0.5]]]))[0, 0])
    # expectation-level dominance: separate MC draws per batch shape, so allow MC noise
    assert pair >= single - 0.02


def test_batch_reparam_sampler_rejects_batch_size_change(model, dataset):
    """Reference ``BatchReparametrizationSampler`` semantics: base draws freeze at the
    first batch size, and a different size afterwards is an error."""
    fn = BatchMonteCarloExpectedImprovement(
        64, key=jax.random.PRNGKey(2)
    ).prepare_acquisition_function(model, dataset)
    fn(jnp.array([[[0.5]]]))  # freezes B=1
    with pytest.raises(ValueError, match="batches of size"):
        fn(jnp.array([[[0.5], [0.6]]]))


def test_make_positive_is_positive_and_monotone(model, dataset):
    fn = MakePositive(ExpectedImprovement()).prepare_acquisition_function(model, dataset)
    base = ExpectedImprovement().prepare_acquisition_function(model, dataset)
    x = jnp.linspace(-2.0, 2.0, 9)[:, None, None]
    got = np.asarray(fn(x))[:, 0]
    raw = np.asarray(base(x))[:, 0]
    assert np.all(got > 0)
    assert np.all(np.argsort(got) == np.argsort(raw))  # order preserved


def test_make_positive_repr(model):
    assert "ExpectedImprovement" in repr(MakePositive(ExpectedImprovement()))


def test_monlcb_is_vectorized(model, dataset):
    space = Box([-1.0], [1.0])
    fn = MultipleOptimismNegativeLowerConfidenceBound(space).prepare_acquisition_function(
        model, dataset
    )
    out = fn(jnp.zeros((6, 4, 1)))  # [..., V, D] -> [..., V]
    assert out.shape == (6, 4)


# ------------------------------------------------------------------ ECI


def test_eci_validates_probability():
    with pytest.raises(ValueError):
        ExpectedConstrainedImprovement(OBJECTIVE, ProbabilityOfFeasibility(0.5).using("C"), 1.5)
    with pytest.raises(ValueError):
        ExpectedConstrainedImprovement(OBJECTIVE, ProbabilityOfFeasibility(0.5).using("C"), -0.1)


def test_eci_requires_objective_dataset(model):
    eci = ExpectedConstrainedImprovement(
        OBJECTIVE, ProbabilityOfFeasibility(0.5).using(OBJECTIVE)
    )
    with pytest.raises(ValueError):
        eci.prepare_acquisition_function({OBJECTIVE: model}, None)
    with pytest.raises(ValueError):
        eci.prepare_acquisition_function({OBJECTIVE: model}, {"OTHER": EMPTY})


def test_eci_product_when_feasible_points_exist(model, dataset):
    """With feasible observed points, ECI = EI(eta over feasible) * PoF."""
    pof = ProbabilityOfFeasibility(4.0).using(OBJECTIVE)  # everything feasible
    eci = ExpectedConstrainedImprovement(OBJECTIVE, pof).prepare_acquisition_function(
        {OBJECTIVE: model}, {OBJECTIVE: dataset}
    )
    ei = ExpectedImprovement().prepare_acquisition_function(model, dataset)
    pof_fn = ProbabilityOfFeasibility(4.0).prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.2]], [[0.6]]])
    np.testing.assert_allclose(
        np.asarray(eci(x)), np.asarray(ei(x)) * np.asarray(pof_fn(x)), atol=1e-8
    )


def test_eci_falls_back_to_constraint_fn_when_infeasible(model, dataset):
    """With no feasible observed point, ECI returns the constraint function alone
    (reference ``function.py:736-744``)."""
    pof = ProbabilityOfFeasibility(-100.0).using(OBJECTIVE)  # nothing feasible
    eci = ExpectedConstrainedImprovement(OBJECTIVE, pof).prepare_acquisition_function(
        {OBJECTIVE: model}, {OBJECTIVE: dataset}
    )
    pof_fn = ProbabilityOfFeasibility(-100.0).prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.1]]])
    np.testing.assert_allclose(np.asarray(eci(x)), np.asarray(pof_fn(x)))


# ------------------------------------------------------------------ combinations


def test_reducer_requires_builders():
    with pytest.raises(TypeError):
        Sum()


def test_sum_combines_values(model, dataset):
    ei = ExpectedImprovement().using(OBJECTIVE)
    lcb = NegativeLowerConfidenceBound(1.0).using(OBJECTIVE)
    both = Sum(ei, lcb).prepare_acquisition_function(
        {OBJECTIVE: model}, {OBJECTIVE: dataset}
    )
    fa = ExpectedImprovement().prepare_acquisition_function(model, dataset)
    fb = NegativeLowerConfidenceBound(1.0).prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.3]]])
    np.testing.assert_allclose(
        np.asarray(both(x)), np.asarray(fa(x)) + np.asarray(fb(x)), atol=1e-8
    )


def test_product_combines_values(model, dataset):
    pof_a = ProbabilityOfFeasibility(0.5).using(OBJECTIVE)
    pof_b = ProbabilityOfFeasibility(1.0).using(OBJECTIVE)
    both = Product(pof_a, pof_b).prepare_acquisition_function(
        {OBJECTIVE: model}, {OBJECTIVE: dataset}
    )
    fa = ProbabilityOfFeasibility(0.5).prepare_acquisition_function(model, dataset)
    fb = ProbabilityOfFeasibility(1.0).prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.4]]])
    np.testing.assert_allclose(
        np.asarray(both(x)), np.asarray(fa(x)) * np.asarray(fb(x)), atol=1e-8
    )


def test_map_applies_wrapper(model, dataset):
    mapped = Map(lambda v: -v, NegativePredictiveMean().using(OBJECTIVE))
    fn = mapped.prepare_acquisition_function({OBJECTIVE: model}, {OBJECTIVE: dataset})
    x = jnp.array([[[0.6]]])
    np.testing.assert_allclose(np.asarray(fn(x)), [[0.36]], atol=1e-6)  # +mean


def test_combination_update_propagates(model, dataset):
    builder = Sum(ExpectedImprovement().using(OBJECTIVE))
    fn = builder.prepare_acquisition_function({OBJECTIVE: model}, {OBJECTIVE: dataset})
    better = mk_dataset([[0.05]], [[0.0]])
    fn2 = builder.update_acquisition_function(fn, {OBJECTIVE: model}, {OBJECTIVE: better})
    x = jnp.array([[[0.9]]])
    assert float(fn2(x)[0, 0]) != float(fn(x)[0, 0])


# ------------------------------------------------------------------ using() plumbing


def test_using_routes_tagged_model(model, dataset):
    builder = ExpectedImprovement().using("CUSTOM")
    fn = builder.prepare_acquisition_function(
        {"CUSTOM": model}, {"CUSTOM": dataset}
    )
    x = jnp.array([[[0.2]]])
    want = ExpectedImprovement().prepare_acquisition_function(model, dataset)(x)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(want))


def test_using_repr_mentions_tag():
    assert "CUSTOM" in repr(ExpectedImprovement().using("CUSTOM"))

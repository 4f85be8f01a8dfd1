"""Analytic batch EI and Genz MVN CDF tests (role of reference
``tests/unit/acquisition/function/test_utils.py`` + qEI sections)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function.function import (
    BatchExpectedImprovement,
    BatchMonteCarloExpectedImprovement,
    ExpectedImprovement,
)
from trieste_tpu.acquisition.function.utils import MultivariateNormalCDF


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=1.0)


@pytest.fixture
def dataset():
    return mk_dataset([[-1.0], [0.0], [1.0]], [[1.1], [0.1], [0.9]])


def test_mvn_cdf_matches_scipy():
    mean = np.array([0.3, -0.5, 0.2])
    cov = np.array([[1.0, 0.4, 0.2], [0.4, 1.2, -0.3], [0.2, -0.3, 0.8]])
    x = np.array([0.5, 0.0, 1.0])
    ours = float(MultivariateNormalCDF(512, 3)(x[None], mean[None], cov[None])[0])
    expected = scipy.stats.multivariate_normal(mean=mean, cov=cov).cdf(x)
    np.testing.assert_allclose(ours, expected, atol=0.01)


def test_mvn_cdf_univariate_exact():
    ours = float(
        MultivariateNormalCDF(64, 1)(
            np.array([[0.7]]), np.array([[0.2]]), np.array([[[4.0]]])
        )[0]
    )
    np.testing.assert_allclose(ours, scipy.stats.norm.cdf(0.25), atol=1e-10)


def test_analytic_qei_reduces_to_ei(model, dataset):
    aqei = BatchExpectedImprovement(256).prepare_acquisition_function(model, dataset)
    ei = ExpectedImprovement().prepare_acquisition_function(model, dataset)
    x = jnp.array([[[0.7]]])
    np.testing.assert_allclose(
        float(aqei(x)[0, 0]), float(ei(x)[0, 0]), rtol=1e-2
    )


@pytest.mark.parametrize("batch", [[[0.5], [1.2]], [[0.5], [-0.5], [1.5]]])
def test_analytic_qei_matches_mc(model, dataset, batch):
    aqei = BatchExpectedImprovement(256).prepare_acquisition_function(model, dataset)
    mcqei = BatchMonteCarloExpectedImprovement(
        100_000, key=jax.random.PRNGKey(0)
    ).prepare_acquisition_function(model, dataset)
    xb = jnp.asarray([batch])
    np.testing.assert_allclose(
        float(aqei(xb)[0, 0]), float(mcqei(xb)[0, 0]), rtol=0.05
    )


def test_analytic_qei_monotone_in_batch(model, dataset):
    """Adding a batch point cannot decrease qEI."""
    aqei = BatchExpectedImprovement(256).prepare_acquisition_function(model, dataset)
    single = float(aqei(jnp.array([[[0.5]]]))[0, 0])
    pair = float(aqei(jnp.array([[[0.5], [-1.0]]]))[0, 0])
    assert pair >= single - 1e-6

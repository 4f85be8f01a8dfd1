"""Exact and sparse Gaussian-process models (TPU-native replacement for the reference's
``trieste/models/gpflow`` backend)."""

from .builders import build_gpr, build_sgpr, build_svgp, default_gpr_params
from .gpr import GaussianProcessRegression
from .posterior import GPRCache, GPRParams
from .priors import GPPriors, default_priors, log_prior_density
from .sampler import (
    BatchReparametrizationSampler,
    DecoupledTrajectorySampler,
    IndependentReparametrizationSampler,
    RandomFourierFeatureTrajectorySampler,
)
from .inducing_points import (
    ConditionalImprovementReduction,
    ConditionalVarianceReduction,
    DPPInducingPointSelector,
    InducingPointSelector,
    KMeansInducingPointSelector,
    RandomSubSampleInducingPointSelector,
    UniformInducingPointSelector,
)
from .sparse import (
    SGPRParams,
    SparseGaussianProcessRegression,
    SparseVariational,
    SVGPParams,
    fit_svgp_minibatch,
)
from .training import fit_gpr
from .likelihoods import BernoulliLikelihood, GaussianLikelihood, PoissonLikelihood
from .vgp import VariationalGaussianProcess, VGPParams, build_vgp_classifier
from .mcmc import GaussianProcessRegressionMCMC, build_gpr_mcmc
from .multifidelity import (
    MultifidelityAutoregressive,
    MultifidelityNonlinearAutoregressive,
    build_multifidelity_autoregressive_models,
)

__all__ = [
    "GaussianProcessRegressionMCMC",
    "build_gpr_mcmc",
    "MultifidelityAutoregressive",
    "MultifidelityNonlinearAutoregressive",
    "build_multifidelity_autoregressive_models",
    "VariationalGaussianProcess",
    "VGPParams",
    "build_vgp_classifier",
    "BernoulliLikelihood",
    "GaussianLikelihood",
    "PoissonLikelihood",
    "build_sgpr",
    "build_svgp",
    "SGPRParams",
    "SVGPParams",
    "fit_svgp_minibatch",
    "SparseGaussianProcessRegression",
    "SparseVariational",
    "InducingPointSelector",
    "KMeansInducingPointSelector",
    "UniformInducingPointSelector",
    "RandomSubSampleInducingPointSelector",
    "ConditionalVarianceReduction",
    "ConditionalImprovementReduction",
    "DPPInducingPointSelector",
    "build_gpr",
    "default_gpr_params",
    "GPPriors",
    "default_priors",
    "log_prior_density",
    "GaussianProcessRegression",
    "GPRCache",
    "GPRParams",
    "BatchReparametrizationSampler",
    "DecoupledTrajectorySampler",
    "IndependentReparametrizationSampler",
    "RandomFourierFeatureTrajectorySampler",
    "fit_gpr",
]

"""Acquisition functions (reference ``trieste/acquisition/function``)."""

from .function import (
    AugmentedExpectedImprovement,
    BatchExpectedImprovement,
    BatchMonteCarloExpectedImprovement,
    ExpectedConstrainedImprovement,
    ExpectedImprovement,
    FastConstraintsFeasibility,
    MakePositive,
    MonteCarloAugmentedExpectedImprovement,
    MonteCarloExpectedImprovement,
    MultipleOptimismNegativeLowerConfidenceBound,
    NegativeLowerConfidenceBound,
    NegativePredictiveMean,
    ProbabilityOfFeasibility,
    ProbabilityOfImprovement,
    fast_constraints_feasibility,
)

__all__ = [
    "AugmentedExpectedImprovement",
    "BatchExpectedImprovement",
    "BatchMonteCarloExpectedImprovement",
    "ExpectedConstrainedImprovement",
    "ExpectedImprovement",
    "FastConstraintsFeasibility",
    "MakePositive",
    "MonteCarloAugmentedExpectedImprovement",
    "MonteCarloExpectedImprovement",
    "MultipleOptimismNegativeLowerConfidenceBound",
    "NegativeLowerConfidenceBound",
    "NegativePredictiveMean",
    "ProbabilityOfFeasibility",
    "ProbabilityOfImprovement",
    "fast_constraints_feasibility",
]

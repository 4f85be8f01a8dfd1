"""Acquisition functions (reference ``trieste/acquisition/function``)."""

from .function import (
    AugmentedExpectedImprovement,
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

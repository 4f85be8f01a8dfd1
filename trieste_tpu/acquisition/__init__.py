"""The acquisition layer (reference ``trieste/acquisition``)."""

from .function.multi_objective import (
    BatchMonteCarloExpectedHypervolumeImprovement,
    ExpectedConstrainedHypervolumeImprovement,
    ExpectedHypervolumeImprovement,
    HIPPO,
)
from .function import (
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
from .interface import (
    AcquisitionFunction,
    AcquisitionFunctionBuilder,
    GreedyAcquisitionFunctionBuilder,
    SingleModelAcquisitionBuilder,
    SingleModelGreedyAcquisitionBuilder,
    SingleModelVectorizedAcquisitionBuilder,
    VectorizedAcquisitionFunctionBuilder,
)
from .optimizer import (
    AcquisitionOptimizer,
    automatic_optimizer_selector,
    batchify_joint,
    batchify_vectorize,
    generate_continuous_optimizer,
    generate_random_search_optimizer,
    optimize_discrete,
)
from .rule import (
    AcquisitionRule,
    BatchHypervolumeSharpeRatioIndicator,
    AsynchronousGreedy,
    AsynchronousOptimization,
    AsynchronousRuleState,
    DiscreteThompsonSampling,
    EfficientGlobalOptimization,
    LocalDatasetsAcquisitionRule,
    RandomSampling,
)
from .trust_region import (
    BatchTrustRegion,
    BatchTrustRegionProduct,
    FixedPointTrustRegionDiscrete,
    SingleObjectiveTrustRegionDiscrete,
    UpdatableTrustRegionDiscrete,
    UpdatableTrustRegionProduct,
    BatchTrustRegionBox,
    BatchTrustRegionState,
    SingleObjectiveTrustRegionBox,
    TREGOBox,
    TURBOBox,
    UpdatableTrustRegion,
    UpdatableTrustRegionBox,
)
from .combination import Map, Product, Reducer, Sum
from .function.active_learning import (
    BayesianActiveLearningByDisagreement,
    ExpectedFeasibility,
    IntegratedVarianceReduction,
    PredictiveVariance,
)
from .function.continuous_thompson_sampling import (
    GreedyContinuousThompsonSampling,
    ParallelContinuousThompsonSampling,
)
from .function.entropy import GIBBON, MinValueEntropySearch
from .function.greedy_batch import Fantasizer, LocalPenalization
from .sampler import (
    ExactThompsonSampler,
    GumbelSampler,
    ThompsonSampler,
    ThompsonSamplerFromTrajectory,
)

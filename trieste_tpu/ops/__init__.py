"""TPU-native numerics: QMC sequences, masked GP linear algebra, kernels, and a pure-JAX
vmappable L-BFGS. This layer replaces the reference's delegation to TF/GPflow C++ ops and
scipy (SURVEY.md §2.10 "Native-code inventory")."""

from .hmc import HMCResults, hmc_sample
from .lbfgs import LBFGSResults, minimize_lbfgs, vmapped_minimize_lbfgs
from .linalg import (
    add_jitter,
    masked_cholesky,
    masked_gram,
    solve_lower,
    solve_upper,
    cho_solve,
)
from .qmc import halton_sample, sobol_sample

__all__ = [
    "HMCResults",
    "hmc_sample",
    "LBFGSResults",
    "minimize_lbfgs",
    "vmapped_minimize_lbfgs",
    "add_jitter",
    "masked_cholesky",
    "masked_gram",
    "solve_lower",
    "solve_upper",
    "cho_solve",
    "halton_sample",
    "sobol_sample",
]

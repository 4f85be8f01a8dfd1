"""Doctest parity (reference ``pyproject.toml:37`` runs ``--doctest-modules`` over the
whole package): every docstring example in the core public modules is executed here, so
the documented usage can never drift from the implementation."""
from __future__ import annotations

import doctest
import importlib

import pytest

# core public modules carrying runnable docstring examples
DOCTEST_MODULES = (
    "trieste_tpu.data",
    "trieste_tpu.space",
    "trieste_tpu.observer",
    "trieste_tpu.utils.misc",
    "trieste_tpu.objectives.single_objectives",
    "trieste_tpu.acquisition.rule",
    "trieste_tpu.acquisition.optimizer",
    "trieste_tpu.acquisition.multi_objective.pareto",
    "trieste_tpu.models.gp.builders",
    "trieste_tpu.models.gp.likelihoods",
    "trieste_tpu.logging",
)


@pytest.mark.parametrize("module_name", DOCTEST_MODULES)
def test_module_doctests(module_name):
    module = importlib.import_module(module_name)
    result = doctest.testmod(module, verbose=False, raise_on_error=False)
    assert result.failed == 0, f"{module_name}: {result.failed} doctest failure(s)"
    assert result.attempted > 0, f"{module_name} has no doctest examples"


def test_doctest_total_count():
    """The suite collects a meaningful example corpus (>= 30 runnable examples),
    mirroring the reference's doctest coverage expectation."""
    total = 0
    for module_name in DOCTEST_MODULES:
        module = importlib.import_module(module_name)
        finder = doctest.DocTestFinder()
        total += sum(len(t.examples) for t in finder.find(module))
    assert total >= 30, f"only {total} doctest examples collected"

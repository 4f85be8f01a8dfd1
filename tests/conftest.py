"""Test configuration.

Forces the CPU backend with 8 virtual devices (the JAX analogue of the reference's
"no real cluster" CI approach — SURVEY.md §4) and float64 (the reference's default dtype,
``space.py:37``), so numerics tests compare against scipy/numpy at full precision. The
TPU compute path itself is float32; dtype-leak tests cover that separately.

NOTE: the axon TPU plugin overrides the ``JAX_PLATFORMS`` env var, so the platform must
be forced via ``jax.config`` before any backend is initialized.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store",
        default="no",
        choices=("yes", "no", "only"),
        help="whether to run slow (real-BO convergence) tests",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: mark test as slow (real BO convergence)")


def pytest_collection_modifyitems(config, items):
    runslow = config.getoption("--runslow")
    if runslow == "yes":
        return
    skip_slow = pytest.mark.skip(reason="needs --runslow yes")
    skip_fast = pytest.mark.skip(reason="--runslow only skips fast tests")
    for item in items:
        if "slow" in item.keywords and runslow == "no":
            item.add_marker(skip_slow)
        elif "slow" not in item.keywords and runslow == "only":
            item.add_marker(skip_fast)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound XLA-CPU resource accumulation across a long single-process run.

    ``python -m pytest tests/ -q`` previously died with a fatal signal inside
    ``_pjit_call_impl_python`` ~15 minutes in (with >100 GB RAM free): hundreds of
    tests x 8 virtual devices accumulate compiled executables and their backing
    XLA-CPU state in one process until the runtime falls over. Dropping the
    compilation caches between test modules keeps the peak bounded (each module
    recompiles what it needs — within-module caching, which the no-retrace tests
    rely on, is unaffected). NOTE: an RSS-gated variant (clear only above a memory
    threshold) was tried in round 5 and segfaulted ~38% in at only ~4 GB RSS — the
    fatal accumulation is internal XLA-CPU state, not resident memory, so the
    unconditional per-module clear stays. For wall-clock, run the suite 2-way
    (``pytest -n 2`` or the shard runner): each worker also holds half the state."""
    yield
    jax.clear_caches()


@pytest.fixture
def key():
    return jax.random.PRNGKey(1234)


@pytest.fixture(autouse=True)
def _seed_np_random():
    """Pin numpy's global RNG per test (role of the reference's ``@random_seed``
    decorator, ``tests/util/misc.py:58-123``): components that draw fallback PRNG keys
    from ``np.random`` (region initializers, rule acquire defaults) become
    deterministic, so seeded convergence envelopes are reproducible run to run."""
    import numpy as _np

    _np.random.seed(0)
    yield

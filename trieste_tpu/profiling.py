"""Tracing and compile-count instrumentation.

TPU-native counterpart of the reference's §5.1 observability story: the reference
controls TF retracing by design (``AcquisitionFunctionClass`` + ``tf.Variable`` state,
``acquisition/interface.py:41-49``) and asserts 3–4 traces per optimize call in its
integration tests (``tests/integration/test_bayesian_optimization.py:805-812``). Here
the analogous invariant is **no recompilation across BO steps**: everything jitted is
keyed on pytree structure (``jax.tree_util.Partial`` acquisition functions, padded
datasets), so step 2..N of a loop must hit the XLA executable cache compiled at step 1.
This module provides the tools to observe and assert that, plus a thin wrapper over
``jax.profiler`` for on-device traces (viewable in TensorBoard / Perfetto).
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Mapping

import jax


@contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Record a ``jax.profiler`` device trace to ``logdir`` for the enclosed block
    (open in TensorBoard's profile plugin or Perfetto). The TPU replacement for the
    reference's wall-clock-only ``Timer`` telemetry."""
    with jax.profiler.trace(logdir, create_perfetto_link=create_perfetto_link):
        yield


def compile_cache_sizes() -> Mapping[str, int]:
    """Executable-cache sizes of the framework's hot jitted entry points, keyed by
    name. A size that grows across BO steps is a recompile leak (the analogue of the
    reference's retrace-count regression check)."""
    from .acquisition import optimizer as _opt
    from .models.gp import gpr as _gpr
    from .models.gp import posterior as _post

    out = {}
    for name, fn in {
        "optimize_continuous_core": _opt._optimize_continuous_core,
        "gpr_fit": _gpr._jit_fit,
        "gpr_cache": _gpr._jit_cache,
    }.items():
        try:
            out[name] = fn._cache_size()
        except Exception:  # noqa: BLE001 - cache introspection is best-effort
            out[name] = -1
    return dict(out)


@contextmanager
def assert_no_recompiles(*jitted_fns) -> Iterator[None]:
    """Assert that the given jitted callables (default: the framework's hot entry
    points) do not compile any new executables inside the block.

    Use around steps 2..N of a BO loop — step 1 legitimately compiles one executable
    per capacity bucket::

        with assert_no_recompiles():
            optimizer.ask(); optimizer.tell(data)
    """
    if jitted_fns:
        before = {repr(f): f._cache_size() for f in jitted_fns}
        yield
        after = {repr(f): f._cache_size() for f in jitted_fns}
    else:
        before = dict(compile_cache_sizes())
        yield
        after = dict(compile_cache_sizes())
    grown = {k: (before[k], after[k]) for k in before if after.get(k, 0) > before[k]}
    if grown:
        raise AssertionError(f"unexpected recompilations: {grown}")

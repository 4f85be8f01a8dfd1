"""Observability: module-global summary writer + step number.

TPU-native rebuild of the reference ``trieste/logging.py:31-227``. The writer is
duck-typed against the ``SummaryWriter`` API (``add_scalar``/``add_histogram``/
``add_text``) so both ``torch.utils.tensorboard.SummaryWriter`` and the bundled
:class:`JsonlSummaryWriter` (a dependency-free fallback writing one JSON line per event)
work. Summary callables are deferred via closures and all logging errors are swallowed,
matching the reference's fault-tolerant wrappers (``logging.py:158-227``).
"""
from __future__ import annotations

import contextlib
import fnmatch
import json
import os
import time
from typing import Any, Callable, Iterator, Optional, Union

import numpy as np

SummaryFilter = Callable[[str], bool]


def default_summary_filter(name: str) -> bool:
    """Hide summaries whose name (or any path component) starts with ``_``
    (reference ``logging.py:57-63``)."""
    return not any(part.startswith("_") for part in name.split("/"))


_WRITER: Optional[Any] = None
_STEP: int = 0
_FILTER: SummaryFilter = default_summary_filter


class JsonlSummaryWriter:
    """Minimal summary writer: one JSON object per line, no external deps."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._path = os.path.join(logdir, "events.jsonl")
        self._f = open(self._path, "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(
            json.dumps({"t": time.time(), "tag": tag, "value": float(value), "step": step})
            + "\n"
        )
        self._f.flush()

    def add_histogram(self, tag: str, values: Any, step: int) -> None:
        v = np.asarray(values).reshape(-1)
        self._f.write(
            json.dumps(
                {
                    "t": time.time(),
                    "tag": tag,
                    "histogram": {
                        "mean": float(v.mean()) if v.size else 0.0,
                        "std": float(v.std()) if v.size else 0.0,
                        "min": float(v.min()) if v.size else 0.0,
                        "max": float(v.max()) if v.size else 0.0,
                        "count": int(v.size),
                    },
                    "step": step,
                }
            )
            + "\n"
        )
        self._f.flush()

    def add_text(self, tag: str, text: str, step: int) -> None:
        self._f.write(
            json.dumps({"t": time.time(), "tag": tag, "text": str(text), "step": step}) + "\n"
        )
        self._f.flush()

    def add_figure(self, tag: str, figure: Any, step: int, **kwargs: Any) -> None:
        """Save the figure as a PNG next to the event file and record its path."""
        safe = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in tag)
        png = os.path.join(os.path.dirname(self._path), f"{safe}.{step:04d}.png")
        figure.savefig(png, dpi=100)
        self._f.write(
            json.dumps({"t": time.time(), "tag": tag, "figure": png, "step": step}) + "\n"
        )
        self._f.flush()

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def make_summary_writer(logdir: str, prefer_tensorboard: bool = True) -> Any:
    """Create a summary writer for ``logdir``: a real TensorBoard event-file writer
    (``torch.utils.tensorboard.SummaryWriter``) when available and preferred — meeting
    the reference's TensorBoard-visualization promise — else the dependency-free
    :class:`JsonlSummaryWriter`."""
    if prefer_tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(logdir)
        except Exception:  # noqa: BLE001 — torch or tensorboard missing/broken
            pass
    return JsonlSummaryWriter(logdir)


def set_tensorboard_writer(writer: Optional[Any]) -> None:
    """Set the global summary writer (reference ``logging.py:31-41``). Any deferred
    summaries queued against the outgoing writer are flushed to it first."""
    global _WRITER
    if _WRITER is not None and _WRITER is not writer:
        flush_deferred_summaries(force=True)
    _WRITER = writer


def get_tensorboard_writer() -> Optional[Any]:
    """(reference ``logging.py:44-49``)"""
    return _WRITER


@contextlib.contextmanager
def tensorboard_writer(writer: Optional[Any]) -> Iterator[None]:
    """Temporarily set the global writer (reference ``logging.py:52-60``)."""
    old = get_tensorboard_writer()
    set_tensorboard_writer(writer)
    try:
        yield
    finally:
        set_tensorboard_writer(old)


def set_step_number(step: int) -> None:
    """(reference ``logging.py:66-76``)"""
    global _STEP
    if step < 0:
        raise ValueError(f"step number must be non-negative, got {step}")
    _STEP = step


def get_step_number() -> int:
    return _STEP


@contextlib.contextmanager
def step_number(step: int) -> Iterator[None]:
    old = get_step_number()
    set_step_number(step)
    try:
        yield
    finally:
        set_step_number(old)


def set_summary_filter(summary_filter: SummaryFilter) -> None:
    """(reference ``logging.py:120-133``)"""
    global _FILTER
    _FILTER = summary_filter


def get_summary_filter() -> SummaryFilter:
    return _FILTER


def include_summary(name: str) -> bool:
    return _FILTER(name)


def _evaluate(value: Union[float, Callable[[], Any]]) -> Any:
    return value() if callable(value) else value


# -- deferred summaries ---------------------------------------------------------------
#
# On-device hot paths (acquisition optimization, rule.acquire) must not force a
# device→host fetch mid-step just to feed TensorBoard: over a remote dispatch link one
# scalar round-trip can cost more than the compute it reports on. ``deferred_scalar``/
# ``deferred_histogram`` enqueue the closure WITHOUT evaluating it; the BO loop / Ask-
# Tell driver calls :func:`flush_deferred_summaries` once per step, at a point where the
# host is already synchronizing with the device (after the observer fetch). Extends the
# reference's closure-deferred wrappers (``logging.py:158-227``), which defer only past
# the filter check, not past the device fetch.

_DEFERRED: list = []
_FLUSH_INTERVAL: int = 1
_FLUSHES_SKIPPED: int = 0


def set_deferred_flush_interval(interval: int) -> None:
    """Flush deferred summaries only every ``interval``-th per-step flush call
    (default 1 = every step). Queued entries carry their own step numbers, so events
    arrive in TensorBoard unchanged, just later. Over a high-latency dispatch link
    (remote TPU) each flush costs one device round trip; ``interval=K`` amortizes it
    K-fold. Detaching the writer always force-flushes."""
    global _FLUSH_INTERVAL
    if interval < 1:
        raise ValueError(f"interval must be >= 1, got {interval}")
    _FLUSH_INTERVAL = interval


def deferred_scalar(
    name: str, value: Union[float, Callable[[], float]], **kwargs: Any
) -> None:
    """Queue a scalar summary; its closure is evaluated (and any device value fetched)
    only at the next :func:`flush_deferred_summaries`. No-op (closure never evaluated)
    when no writer is set or the filter excludes ``name``.

    >>> import tempfile
    >>> from trieste_tpu.logging import (
    ...     JsonlSummaryWriter, deferred_scalar, flush_deferred_summaries,
    ...     tensorboard_writer)
    >>> calls = []
    >>> with tensorboard_writer(JsonlSummaryWriter(tempfile.mkdtemp())):
    ...     deferred_scalar("loop/improvement", lambda: calls.append(1) or 0.25)
    ...     len(calls)            # nothing evaluated at the call site
    ...     flush_deferred_summaries()
    ...     len(calls)            # evaluated exactly once, at the flush
    0
    1
    """
    if _WRITER is None or not include_summary(name):
        return
    _DEFERRED.append(("scalar", name, value, _STEP, kwargs))


def deferred_histogram(
    name: str, values: Union[Any, Callable[[], Any]], **kwargs: Any
) -> None:
    """Histogram variant of :func:`deferred_scalar`."""
    if _WRITER is None or not include_summary(name):
        return
    _DEFERRED.append(("histogram", name, values, _STEP, kwargs))


def deferred_scalar_vector(names: list, values: Any, **kwargs: Any) -> None:
    """Queue one scalar per entry of ``names`` from the corresponding element of the
    1-D device array ``values`` — WITHOUT any per-element device ops at the call site
    (indexing a device array is itself a dispatched op; over a remote dispatch link
    those round trips are the cost this protocol removes). The array rides the packed
    flush fetch; elements are split out on host."""
    if _WRITER is None:
        return
    kept = [(i, n) for i, n in enumerate(names) if include_summary(n)]
    if not kept:
        return
    _DEFERRED.append(("scalar_vector", kept, values, _STEP, kwargs))


def flush_deferred_summaries(force: bool = False) -> None:
    """Evaluate and write all queued deferred summaries (errors swallowed per entry,
    like the eager wrappers). Writes use the step number captured at enqueue time.

    Queued values that are device arrays are fetched in ONE packed transfer (a single
    concatenated f32 vector): over a high-latency dispatch link (the remote-TPU case)
    per-value fetches each cost a full round trip, which is exactly the per-step
    logging overhead this protocol exists to remove. With
    :func:`set_deferred_flush_interval` the flush itself is further amortized over
    several steps (``force=True`` bypasses the throttle — used on writer detach)."""
    global _DEFERRED, _FLUSHES_SKIPPED
    if not force and _FLUSH_INTERVAL > 1:
        _FLUSHES_SKIPPED += 1
        if _FLUSHES_SKIPPED < _FLUSH_INTERVAL:
            return
    _FLUSHES_SKIPPED = 0
    pending, _DEFERRED = _DEFERRED, []
    if _WRITER is None or not pending:
        return
    resolved = []
    for kind, name, value, step, kwargs in pending:
        try:
            resolved.append((kind, name, _evaluate(value), step, kwargs))
        except Exception as e:  # noqa: BLE001
            print(f"failed to log {kind} {name}: {e}")
    try:
        import jax
        import jax.numpy as jnp

        device_idx = [
            i for i, (_, _, v, _, _) in enumerate(resolved) if isinstance(v, jax.Array)
        ]
        if device_idx:
            flat = jnp.concatenate(
                [
                    jnp.ravel(resolved[i][2]).astype(jnp.float32)
                    for i in device_idx
                ]
            )
            host = np.asarray(flat)  # the single round trip
            offset = 0
            for i in device_idx:
                kind, name, v, step, kwargs = resolved[i]
                size = int(np.prod(v.shape)) if v.shape else 1
                resolved[i] = (
                    kind, name,
                    host[offset : offset + size].reshape(v.shape), step, kwargs,
                )
                offset += size
    except Exception as e:  # noqa: BLE001
        print(f"failed to batch-fetch deferred summaries: {e}")
    for kind, name, v, step, kwargs in resolved:
        try:
            if kind == "scalar":
                _WRITER.add_scalar(name, float(np.asarray(v)), step, **kwargs)
            elif kind == "scalar_vector":
                flat = np.asarray(v).reshape(-1)
                for i, n in name:  # name holds [(index, name), ...]
                    _WRITER.add_scalar(n, float(flat[i]), step, **kwargs)
            else:
                _WRITER.add_histogram(name, np.asarray(v), step, **kwargs)
        except Exception as e:  # noqa: BLE001
            print(f"failed to log {kind} {name}: {e}")


def scalar(name: str, value: Union[float, Callable[[], float]], **kwargs: Any) -> None:
    """Log a scalar if a writer is set and the filter passes; closures are only evaluated
    when actually logged; errors are swallowed (reference ``logging.py:158-186``)."""
    if _WRITER is None or not include_summary(name):
        return
    try:
        v = float(np.asarray(_evaluate(value)))
        _WRITER.add_scalar(name, v, _STEP, **kwargs)
    except Exception as e:  # noqa: BLE001
        print(f"failed to log scalar {name}: {e}")


def histogram(name: str, values: Union[Any, Callable[[], Any]], **kwargs: Any) -> None:
    if _WRITER is None or not include_summary(name):
        return
    try:
        _WRITER.add_histogram(name, np.asarray(_evaluate(values)), _STEP, **kwargs)
    except Exception as e:  # noqa: BLE001
        print(f"failed to log histogram {name}: {e}")


def text(name: str, value: Union[str, Callable[[], str]], **kwargs: Any) -> None:
    if _WRITER is None or not include_summary(name):
        return
    try:
        _WRITER.add_text(name, str(_evaluate(value)), _STEP, **kwargs)
    except Exception as e:  # noqa: BLE001
        print(f"failed to log text {name}: {e}")


def pyplot(name: str, fig_or_fn: Any, **kwargs: Any) -> None:
    """Log a matplotlib figure if the writer supports it (reference ``logging.py:206-227``)."""
    if _WRITER is None or not include_summary(name):
        return
    try:
        fig = _evaluate(fig_or_fn)
        if hasattr(_WRITER, "add_figure"):
            _WRITER.add_figure(name, fig, _STEP, **kwargs)
        try:  # release host memory whether or not the writer consumed it
            import matplotlib.pyplot as plt

            plt.close(fig)
        except Exception:  # noqa: BLE001
            pass
    except Exception as e:  # noqa: BLE001
        print(f"failed to log figure {name}: {e}")


class SummaryFilterPatterns:
    """Glob-pattern include/exclude filter helper."""

    def __init__(self, include: str = "*", exclude: str = "_*"):
        self._include = include
        self._exclude = exclude

    def __call__(self, name: str) -> bool:
        return fnmatch.fnmatch(name, self._include) and not fnmatch.fnmatch(
            name, self._exclude
        )

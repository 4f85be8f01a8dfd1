"""Search spaces with on-device sampling.

TPU-native rebuild of the reference ``trieste/space.py`` (1541 LoC). Differences from the
reference by design:

* Sampling takes an **explicit PRNG key** (``space.sample(key, n)``) instead of global TF
  seeds, so it is jittable and reproducible under ``vmap``/``pjit``.
* Quasi-random sequences (Halton) are generated on device in pure JAX
  (:mod:`trieste_tpu.ops.qmc`); Sobol uses scipy's direction numbers host-side (init-time
  only, never in a hot jitted path).
* ``check_shapes`` decorators (e.g. reference ``space.py:1287``) become trace-time Python
  shape checks — they cost nothing at runtime under jit.

Reference citations: ``SearchSpace`` ABC ``space.py:208-384``; constraints
``space.py:48-204``; discrete spaces ``space.py:387-726``; ``Box`` ``space.py:729-1118``;
collection spaces ``space.py:1121-1541``; encoders ``space.py:506-550``.

Examples:

>>> import jax, jax.numpy as jnp
>>> from trieste_tpu.space import Box, DiscreteSearchSpace, TaggedProductSearchSpace
>>> box = Box([0.0, 0.0], [1.0, 2.0])
>>> box.dimension
2
>>> box.sample(jax.random.PRNGKey(0), 5).shape
(5, 2)
>>> bool(box.contains(jnp.array([0.5, 1.5])))
True
>>> bool(box.contains(jnp.array([0.5, 2.5])))
False
>>> points = jnp.array([[0.0], [0.5], [1.0]])
>>> discrete = DiscreteSearchSpace(points)
>>> discrete.points.shape
(3, 1)
>>> product = box * discrete  # product space concatenates dimensions
>>> product.dimension
3
>>> squared = box ** 2
>>> squared.dimension
4
>>> tagged = TaggedProductSearchSpace([box, discrete], tags=["cont", "disc"])
>>> tagged.subspace_tags
('cont', 'disc')
>>> tagged.get_subspace("disc").points.shape
(3, 1)
"""
from __future__ import annotations

import operator
from abc import ABC, abstractmethod
from functools import reduce
from typing import Any, Callable, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .types import TensorType
from .utils.misc import default_float

EncoderFunction = Callable[[TensorType], jax.Array]


def DEFAULT_DTYPE() -> Any:
    """The default float dtype for space tensors — f64 under ``jax_enable_x64``, else
    f32 (role of reference ``DEFAULT_DTYPE``, ``space.py:37``; a callable because JAX's
    x64 mode is a runtime switch, unlike TF's fixed default)."""
    return default_float()


class HasOneHotEncoder:
    """Mixin marker for spaces exposing a one-hot ``one_hot_encoder`` (reference
    ``space.py:506-513``). Membership test: ``isinstance(space, HasOneHotEncoder)`` or
    simply a non-None ``space.one_hot_encoder()``."""

    def one_hot_encoder(self) -> Optional[EncoderFunction]:  # pragma: no cover
        return None

DEFAULT_DTYPE_EPS = 1e-7


class SampleTimeoutError(Exception):
    """Raised when rejection sampling of feasible points fails to find enough points."""


# ---------------------------------------------------------------------------------
# Constraints (reference space.py:48-204)
# ---------------------------------------------------------------------------------


class Constraint(ABC):
    """Base class for constraints on a search space."""

    @abstractmethod
    def residual(self, points: TensorType) -> jax.Array:
        """Residuals ``>= 0`` iff feasible, shape ``[..., num_residuals]``."""


class LinearConstraint(Constraint):
    """Linear constraint ``lb <= A @ x <= ub`` (reference ``space.py:142-201``)."""

    def __init__(self, A: TensorType, lb: TensorType, ub: TensorType):
        self.A = jnp.asarray(A, default_float())
        self.lb = jnp.broadcast_to(jnp.asarray(lb, default_float()), (self.A.shape[0],))
        self.ub = jnp.broadcast_to(jnp.asarray(ub, default_float()), (self.A.shape[0],))

    def residual(self, points: TensorType) -> jax.Array:
        points = jnp.asarray(points)
        ax = points @ self.A.T
        return jnp.concatenate([ax - self.lb, self.ub - ax], axis=-1)

    def shift(self, offset: int, width: int, total_dim: int) -> "LinearConstraint":
        """The same constraint acting on dims ``[offset, offset + width)`` of a
        ``total_dim``-dimensional product space (used by ``Box.__mul__`` so products
        preserve both operands' constraints, reference ``space.py:729-1118``)."""
        A = jnp.zeros((self.A.shape[0], total_dim), self.A.dtype)
        A = A.at[:, offset : offset + width].set(self.A)
        return LinearConstraint(A, self.lb, self.ub)

    def __repr__(self) -> str:
        return f"LinearConstraint(A={self.A!r}, lb={self.lb!r}, ub={self.ub!r})"

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, LinearConstraint)
            and bool(jnp.array_equal(self.A, other.A))
            and bool(jnp.array_equal(self.lb, other.lb))
            and bool(jnp.array_equal(self.ub, other.ub))
        )


class NonlinearConstraint(Constraint):
    """Nonlinear constraint ``lb <= f(x) <= ub`` for a JAX-traceable ``f``
    (reference ``space.py:48-139``; gradients come from ``jax.grad`` rather than a cache)."""

    def __init__(self, f: Callable[[TensorType], TensorType], lb: TensorType, ub: TensorType):
        self.f = f
        self.lb = jnp.atleast_1d(jnp.asarray(lb, default_float()))
        self.ub = jnp.atleast_1d(jnp.asarray(ub, default_float()))

    def residual(self, points: TensorType) -> jax.Array:
        val = jnp.asarray(self.f(points))
        if val.ndim == jnp.asarray(points).ndim - 1:
            val = val[..., None]
        return jnp.concatenate([val - self.lb, self.ub - val], axis=-1)

    def shift(self, offset: int, width: int, total_dim: int) -> "NonlinearConstraint":
        """The same constraint reading dims ``[offset, offset + width)`` of a
        ``total_dim``-dimensional product space."""
        inner, lo, hi = self.f, offset, offset + width

        def shifted(points: TensorType) -> TensorType:
            return inner(jnp.asarray(points)[..., lo:hi])

        return NonlinearConstraint(shifted, self.lb, self.ub)

    def __repr__(self) -> str:
        return f"NonlinearConstraint(f={self.f!r}, lb={self.lb!r}, ub={self.ub!r})"


# ---------------------------------------------------------------------------------
# SearchSpace ABC (reference space.py:208-384)
# ---------------------------------------------------------------------------------


class SearchSpace(ABC):
    """A space of valid query points (reference ``space.py:208-384``)."""

    @abstractmethod
    def sample(self, key: jax.Array, num_samples: int) -> jax.Array:
        """Sample ``num_samples`` points uniformly at random, shape ``[n, D]``."""

    @property
    @abstractmethod
    def dimension(self) -> int:
        """Number of input dimensions."""

    @property
    @abstractmethod
    def lower(self) -> jax.Array:
        """Lower bounds, shape ``[D]``."""

    @property
    @abstractmethod
    def upper(self) -> jax.Array:
        """Upper bounds, shape ``[D]``."""

    @abstractmethod
    def _contains(self, value: TensorType) -> jax.Array:
        ...

    def contains(self, value: TensorType) -> jax.Array:
        """Membership test; supports leading batch dims (reference ``space.py:245-270``)."""
        value = jnp.asarray(value)
        if value.shape[-1] != self.dimension:
            raise ValueError(
                f"value has dimension {value.shape[-1]}, space has {self.dimension}"
            )
        return self._contains(value)

    def __contains__(self, value: TensorType) -> bool:
        return bool(self.contains(jnp.asarray(value)))

    @property
    def constraints(self) -> Sequence[Constraint]:
        """The constraints on this space (default: none) — reference ``space.py:340``."""
        return []

    @property
    def has_constraints(self) -> bool:
        return len(self.constraints) > 0

    def constraints_residuals(self, points: TensorType) -> jax.Array:
        """Stacked residuals of all constraints, ``[..., sum_residuals]``
        (reference ``space.py:350-366``)."""
        if not self.constraints:
            raise NotImplementedError("space has no constraints")
        return jnp.concatenate([c.residual(points) for c in self.constraints], axis=-1)

    def is_feasible(self, points: TensorType) -> jax.Array:
        """Feasibility w.r.t. all constraints (reference ``space.py:368-380``)."""
        return jnp.all(self.constraints_residuals(points) >= -DEFAULT_DTYPE_EPS, axis=-1)

    def product(self, *others: "SearchSpace") -> "SearchSpace":
        """Cartesian product (reference ``space.py:300-320``)."""
        return reduce(operator.mul, others, self)

    @abstractmethod
    def __mul__(self, other: "SearchSpace") -> "SearchSpace":
        ...

    def __pow__(self, other: int) -> "SearchSpace":
        if other < 1:
            raise ValueError(f"power must be >= 1, got {other}")
        return self.product(*[self] * (other - 1))

    def discretize(self, key: jax.Array, num_samples: int) -> "DiscreteSearchSpace":
        """A discrete space of ``num_samples`` uniform samples (reference ``space.py:290``)."""
        return DiscreteSearchSpace(self.sample(key, num_samples))


# ---------------------------------------------------------------------------------
# Discrete spaces (reference space.py:387-726)
# ---------------------------------------------------------------------------------


class GeneralDiscreteSearchSpace(SearchSpace):
    """A finite space given by an explicit point set (reference ``space.py:387-434``)."""

    def __init__(self, points: TensorType):
        points = jnp.asarray(points)
        if points.ndim != 2:
            raise ValueError(f"points must have rank 2, got shape {points.shape}")
        self._points = points

    @property
    def points(self) -> jax.Array:
        """All points, ``[N, D]``."""
        return self._points

    @property
    def dimension(self) -> int:
        return self._points.shape[-1]

    @property
    def lower(self) -> jax.Array:
        return jnp.min(self._points, axis=0)

    @property
    def upper(self) -> jax.Array:
        return jnp.max(self._points, axis=0)

    def _contains(self, value: TensorType) -> jax.Array:
        eq = jnp.all(value[..., None, :] == self._points, axis=-1)
        return jnp.any(eq, axis=-1)

    def sample(self, key: jax.Array, num_samples: int) -> jax.Array:
        idx = jax.random.randint(key, (num_samples,), 0, self._points.shape[0])
        return self._points[idx]

    def one_hot_encoder(self) -> Optional[EncoderFunction]:
        return None

    def __mul__(self, other: SearchSpace) -> SearchSpace:
        if isinstance(other, GeneralDiscreteSearchSpace):
            n, m = self._points.shape[0], other._points.shape[0]
            left = jnp.repeat(self._points, m, axis=0)
            right = jnp.tile(other._points, (n, 1))
            return DiscreteSearchSpace(jnp.concatenate([left, right], axis=-1))
        return TaggedProductSearchSpace([self, other])

    def __eq__(self, other: object) -> bool:
        return isinstance(other, type(self)) and bool(
            jnp.array_equal(self._points, other._points)
        )

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self._points!r})"


class DiscreteSearchSpace(GeneralDiscreteSearchSpace):
    """A discrete space of numeric points (reference ``space.py:437-503``)."""


class CategoricalSearchSpace(GeneralDiscreteSearchSpace, HasOneHotEncoder):
    """A categorical space: each dimension takes one of a finite set of named categories,
    represented numerically by its index (reference ``space.py:553-726``)."""

    def __init__(
        self,
        categories: Union[int, Sequence[str], Sequence[int], Sequence[Sequence[str]]],
        dtype: Any = None,
    ):
        if isinstance(categories, int):
            categories = [categories]
        if len(categories) == 0:
            raise ValueError("CategoricalSearchSpace needs at least one dimension")
        tags: list[tuple[str, ...]] = []
        first = categories[0]
        if isinstance(first, (int, np.integer)) or isinstance(first, str):
            if isinstance(first, str):
                # one dimension, list of tags
                tags = [tuple(str(c) for c in categories)]  # type: ignore[arg-type]
            else:
                # sizes per dimension
                for size in categories:  # type: ignore[assignment]
                    if int(size) <= 0:
                        raise ValueError("category sizes must be positive")
                    tags.append(tuple(str(i) for i in range(int(size))))
        else:
            for cats in categories:  # type: ignore[assignment]
                if len(cats) == 0:
                    raise ValueError("each dimension needs at least one category")
                tags.append(tuple(str(c) for c in cats))
        self._tags = tags
        dtype = dtype or default_float()
        grids = [jnp.arange(len(t), dtype=dtype) for t in tags]
        mesh = jnp.meshgrid(*grids, indexing="ij")
        points = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)
        super().__init__(points)

    @property
    def tags(self) -> Sequence[Tuple[str, ...]]:
        """Category names per dimension."""
        return self._tags

    def to_tags(self, points: TensorType) -> list[list[str]]:
        """Map numeric index points to category names (reference ``space.py:700-726``)."""
        pts = np.asarray(points)
        if not np.all(pts == np.round(pts)):
            raise ValueError(f"to_tags requires integral indices, got {pts}")
        out = []
        for row in pts.reshape(-1, pts.shape[-1]):
            out.append([self._tags[d][int(v)] for d, v in enumerate(row)])
        return out

    def one_hot_encoder(self) -> EncoderFunction:
        """One-hot encoder; binary dimensions pass through as a single 0/1 column
        (reference ``space.py:506-550,661-698``)."""
        tags = self._tags

        def encoder(x: TensorType) -> jax.Array:
            x = jnp.asarray(x)
            cols = []
            for d, t in enumerate(tags):
                idx = x[..., d].astype(jnp.int32)
                if len(t) <= 2:
                    cols.append(x[..., d : d + 1])
                else:
                    cols.append(jax.nn.one_hot(idx, len(t), dtype=x.dtype))
            return jnp.concatenate(cols, axis=-1)

        return encoder

    def __mul__(self, other: SearchSpace) -> SearchSpace:
        if isinstance(other, CategoricalSearchSpace):
            return CategoricalSearchSpace(list(self._tags) + list(other._tags))
        return TaggedProductSearchSpace([self, other])

    def __eq__(self, other: object) -> bool:
        # category NAMES are part of the space's identity, not just the index points
        return (
            isinstance(other, CategoricalSearchSpace)
            and self._tags == other._tags
            and super().__eq__(other)
        )


# ---------------------------------------------------------------------------------
# Box (reference space.py:729-1118)
# ---------------------------------------------------------------------------------


class Box(SearchSpace):
    """A continuous box ``[lower, upper]`` (reference ``space.py:729-1118``)."""

    def __init__(
        self,
        lower: TensorType,
        upper: TensorType,
        constraints: Optional[Sequence[Constraint]] = None,
    ):
        # bounds are kept host-side (numpy): Box construction at import/config time must
        # not touch the device (the axon TPU tunnel makes eager ops expensive), and numpy
        # constants embed into jitted programs for free
        lower = np.asarray(lower, default_float())
        upper = np.asarray(upper, default_float())
        if lower.ndim != 1 or upper.ndim != 1:
            raise ValueError("bounds must be rank 1")
        if lower.shape != upper.shape:
            raise ValueError(f"bound shapes differ: {lower.shape} vs {upper.shape}")
        # zero-width dimensions (lower == upper) and even zero-dimensional boxes are
        # valid, as in the reference (``space.py:795-800``): collapsed trust regions
        # and fixed subspaces produce them naturally
        if not bool(np.all(lower <= upper)):
            raise ValueError("lower must not exceed upper")
        self._lower = lower
        self._upper = upper
        self._constraints: Sequence[Constraint] = list(constraints or [])

    @property
    def lower(self) -> jax.Array:
        return jnp.asarray(self._lower)

    @property
    def upper(self) -> jax.Array:
        return jnp.asarray(self._upper)

    @property
    def dimension(self) -> int:
        return self._lower.shape[0]

    @property
    def constraints(self) -> Sequence[Constraint]:
        return self._constraints

    def _contains(self, value: TensorType) -> jax.Array:
        return jnp.all((value >= self._lower) & (value <= self._upper), axis=-1)

    def sample(self, key: jax.Array, num_samples: int) -> jax.Array:
        """Uniform sampling (reference ``space.py:843-860``)."""
        u = jax.random.uniform(
            key, (num_samples, self.dimension),
            dtype=jax.dtypes.canonicalize_dtype(self._lower.dtype),
        )
        return self._lower + u * (self._upper - self._lower)

    def sample_halton(self, key: jax.Array, num_samples: int) -> jax.Array:
        """Randomized Halton sampling, fully on device (reference ``space.py:862-886``)."""
        from .ops.qmc import halton_sample

        u = halton_sample(
            key, num_samples, self.dimension,
            dtype=jax.dtypes.canonicalize_dtype(self._lower.dtype),
        )
        return self._lower + u * (self._upper - self._lower)

    def sample_sobol(self, num_samples: int, skip: Optional[int] = None) -> jax.Array:
        """Sobol sampling (reference ``space.py:888-915``). Generated host-side from
        scipy direction numbers (init-time only), then placed on device."""
        from .ops.qmc import sobol_sample

        u = sobol_sample(
            num_samples, self.dimension, skip=skip,
            dtype=jax.dtypes.canonicalize_dtype(self._lower.dtype),
        )
        return self._lower + u * (self._upper - self._lower)

    # -- feasible sampling via rejection (reference space.py:917-1050) -------------

    def _sample_feasible_loop(
        self, num_samples: int, sampler: Callable[[int], jax.Array], max_tries: int = 100
    ) -> jax.Array:
        feasible: list[np.ndarray] = []
        total = 0
        for _ in range(max_tries):
            cand = sampler(num_samples)
            ok = np.asarray(self.is_feasible(cand))
            pts = np.asarray(cand)[ok]
            if len(pts):
                feasible.append(pts)
                total += len(pts)
            if total >= num_samples:
                return jnp.asarray(np.concatenate(feasible)[:num_samples])
        raise SampleTimeoutError(
            f"failed to sample {num_samples} feasible points in {max_tries} tries"
        )

    def sample_feasible(
        self, key: jax.Array, num_samples: int, max_tries: int = 100
    ) -> jax.Array:
        if not self.has_constraints:
            return self.sample(key, num_samples)
        keys = iter(jax.random.split(key, max_tries))
        return self._sample_feasible_loop(
            num_samples, lambda n: self.sample(next(keys), n), max_tries
        )

    def sample_halton_feasible(
        self, key: jax.Array, num_samples: int, max_tries: int = 100
    ) -> jax.Array:
        if not self.has_constraints:
            return self.sample_halton(key, num_samples)
        keys = iter(jax.random.split(key, max_tries))
        return self._sample_feasible_loop(
            num_samples, lambda n: self.sample_halton(next(keys), n), max_tries
        )

    def sample_sobol_feasible(
        self, num_samples: int, skip: Optional[int] = None, max_tries: int = 100
    ) -> jax.Array:
        if not self.has_constraints:
            return self.sample_sobol(num_samples, skip)
        state = {"skip": skip if skip is not None else 0}

        def sampler(n: int) -> jax.Array:
            s = state["skip"]
            state["skip"] = s + n
            return self.sample_sobol(n, skip=s)

        return self._sample_feasible_loop(num_samples, sampler, max_tries)

    def __mul__(self, other: SearchSpace) -> SearchSpace:
        if isinstance(other, Box):
            d1, d2 = self.dimension, other.dimension
            total = d1 + d2
            # both operands' constraints survive the product, re-indexed onto the
            # product dims (reference products preserve constraint state,
            # ``space.py:729-1118``)
            constraints = [c.shift(0, d1, total) for c in self._constraints] + [
                c.shift(d1, d2, total) for c in other._constraints
            ]
            return Box(
                np.concatenate([self._lower, other._lower]),
                np.concatenate([self._upper, other._upper]),
                constraints=constraints or None,
            )
        return TaggedProductSearchSpace([self, other])

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Box)
            and bool(np.array_equal(self._lower, other._lower))
            and bool(np.array_equal(self._upper, other._upper))
            and list(self._constraints) == list(other._constraints)
        )

    def __repr__(self) -> str:
        return f"Box({self._lower!r}, {self._upper!r})"


# ---------------------------------------------------------------------------------
# Collection spaces (reference space.py:1121-1541)
# ---------------------------------------------------------------------------------


def _default_tags(n: int) -> list[str]:
    return [str(i) for i in range(n)]


class CollectionSearchSpace(SearchSpace):
    """A collection of tagged subspaces (reference ``space.py:1121-1241``)."""

    def __init__(self, spaces: Sequence[SearchSpace], tags: Optional[Sequence[str]] = None):
        if tags is None:
            tags = _default_tags(len(spaces))
        if len(tags) != len(spaces):
            raise ValueError(f"got {len(tags)} tags for {len(spaces)} spaces")
        if len(set(tags)) != len(tags):
            raise ValueError(f"tags must be unique, got {tags}")
        self._spaces: dict[str, SearchSpace] = dict(zip(tags, spaces))
        self._tags = tuple(tags)

    @property
    def subspace_tags(self) -> Tuple[str, ...]:
        return self._tags

    def get_subspace(self, tag: str) -> SearchSpace:
        if tag not in self._spaces:
            raise ValueError(f"unknown subspace tag {tag!r}; have {self._tags}")
        return self._spaces[tag]


class TaggedProductSearchSpace(CollectionSearchSpace, HasOneHotEncoder):
    """Product of heterogeneous subspaces laid out along the feature axis
    (reference ``space.py:1244-1407``)."""

    def __init__(self, spaces: Sequence[SearchSpace], tags: Optional[Sequence[str]] = None):
        super().__init__(spaces, tags)
        dims = [s.dimension for s in self._spaces.values()]
        self._subspace_sizes = dims
        self._subspace_starts = list(np.cumsum([0] + dims[:-1]))
        self._dimension = int(sum(dims))

    @property
    def dimension(self) -> int:
        return self._dimension

    @property
    def lower(self) -> jax.Array:
        return jnp.concatenate([s.lower for s in self._spaces.values()])

    @property
    def upper(self) -> jax.Array:
        return jnp.concatenate([s.upper for s in self._spaces.values()])

    def subspace_dimension_range(self, tag: str) -> Tuple[int, int]:
        i = self._tags.index(tag)
        start = self._subspace_starts[i]
        return start, start + self._subspace_sizes[i]

    def get_subspace_component(self, tag: str, values: TensorType) -> jax.Array:
        """Slice out one subspace's columns (reference ``space.py:1330-1348``)."""
        lo, hi = self.subspace_dimension_range(tag)
        return jnp.asarray(values)[..., lo:hi]

    def _contains(self, value: TensorType) -> jax.Array:
        parts = [
            self._spaces[t]._contains(self.get_subspace_component(t, value))
            for t in self._tags
        ]
        return jnp.all(jnp.stack(parts, axis=-1), axis=-1)

    def sample(self, key: jax.Array, num_samples: int) -> jax.Array:
        keys = jax.random.split(key, len(self._tags))
        parts = [
            self._spaces[t].sample(k, num_samples) for t, k in zip(self._tags, keys)
        ]
        dtype = jnp.result_type(*[p.dtype for p in parts])
        return jnp.concatenate([p.astype(dtype) for p in parts], axis=-1)

    def fix_subspace(self, tag: str, values: TensorType) -> "TaggedProductSearchSpace":
        """Replace a subspace by a single fixed point (reference ``space.py:1350-1374``)."""
        values = jnp.atleast_2d(jnp.asarray(values))
        new_spaces = [
            DiscreteSearchSpace(values) if t == tag else self._spaces[t]
            for t in self._tags
        ]
        return TaggedProductSearchSpace(new_spaces, self._tags)

    def one_hot_encoder(self) -> Optional[EncoderFunction]:
        encoders = []
        for t in self._tags:
            sub = self._spaces[t]
            enc = getattr(sub, "one_hot_encoder", lambda: None)()
            encoders.append(enc)
        if all(e is None for e in encoders):
            return None

        ranges = [self.subspace_dimension_range(t) for t in self._tags]

        def encoder(x: TensorType) -> jax.Array:
            x = jnp.asarray(x)
            cols = []
            for (lo, hi), enc in zip(ranges, encoders):
                part = x[..., lo:hi]
                cols.append(enc(part) if enc is not None else part)
            return jnp.concatenate(cols, axis=-1)

        return encoder

    def __mul__(self, other: SearchSpace) -> SearchSpace:
        return TaggedProductSearchSpace([self, other])

    def __repr__(self) -> str:
        return f"TaggedProductSearchSpace({dict(self._spaces)!r})"


class TaggedMultiSearchSpace(CollectionSearchSpace):
    """A collection of V same-dimension subspaces forming a vectorized acquisition space:
    ``sample`` returns ``[num_samples, V, D]`` (reference ``space.py:1410-1541``).
    Used for batch trust-region fleets — V is a natural vmap/shard axis on TPU."""

    def __init__(self, spaces: Sequence[SearchSpace], tags: Optional[Sequence[str]] = None):
        if len(spaces) == 0:
            raise ValueError("need at least one subspace")
        dims = {s.dimension for s in spaces}
        if len(dims) != 1:
            raise ValueError(f"all subspaces must share a dimension, got {dims}")
        super().__init__(spaces, tags)

    @property
    def dimension(self) -> int:
        return next(iter(self._spaces.values())).dimension

    @property
    def num_subspaces(self) -> int:
        return len(self._tags)

    @property
    def lower(self) -> jax.Array:
        """``[V, D]`` stacked lower bounds."""
        return jnp.stack([s.lower for s in self._spaces.values()])

    @property
    def upper(self) -> jax.Array:
        return jnp.stack([s.upper for s in self._spaces.values()])

    def sample(self, key: jax.Array, num_samples: int) -> jax.Array:
        keys = jax.random.split(key, len(self._tags))
        return jnp.stack(
            [self._spaces[t].sample(k, num_samples) for t, k in zip(self._tags, keys)],
            axis=1,
        )

    def _contains(self, value: TensorType) -> jax.Array:
        # value [..., V, D] -> [..., V]
        parts = [
            self._spaces[t]._contains(jnp.asarray(value)[..., i, :])
            for i, t in enumerate(self._tags)
        ]
        return jnp.stack(parts, axis=-1)

    def contains(self, value: TensorType) -> jax.Array:
        value = jnp.asarray(value)
        if value.shape[-1] != self.dimension or value.shape[-2] != self.num_subspaces:
            raise ValueError(
                f"expected [..., {self.num_subspaces}, {self.dimension}], got {value.shape}"
            )
        return self._contains(value)

    def __mul__(self, other: SearchSpace) -> SearchSpace:
        raise NotImplementedError("products of multi-spaces are not supported")


# ---------------------------------------------------------------------------------
# Encoders (reference space.py:506-550)
# ---------------------------------------------------------------------------------


def one_hot_encoder(space: SearchSpace) -> EncoderFunction:
    """Build a one-hot encoder for a space (identity where not categorical) —
    reference ``space.py:514-538``."""
    enc = getattr(space, "one_hot_encoder", lambda: None)()
    if enc is None:
        return lambda x: jnp.asarray(x)
    return enc


def cast_encoder(encoder: EncoderFunction, dtype: Any) -> EncoderFunction:
    """Compose an encoder with a dtype cast (reference ``space.py:541-550``)."""
    return lambda x: encoder(x).astype(dtype)


def one_hot_encoded_space(space: SearchSpace) -> SearchSpace:
    """The search space corresponding to the one-hot encoding of ``space``: categorical
    (sub)spaces become discrete spaces over their encoded points, everything else passes
    through (reference ``space.py:539-550``)."""
    enc = getattr(space, "one_hot_encoder", lambda: None)()
    if isinstance(space, GeneralDiscreteSearchSpace) and enc is not None:
        return DiscreteSearchSpace(enc(space.points))
    if isinstance(space, TaggedProductSearchSpace):
        subspaces = [one_hot_encoded_space(space.get_subspace(t)) for t in space.subspace_tags]
        return TaggedProductSearchSpace(spaces=subspaces, tags=list(space.subspace_tags))
    if enc is not None:
        raise NotImplementedError(f"unsupported one-hot-encoded space {type(space)}")
    return space

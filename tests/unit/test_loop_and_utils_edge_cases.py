"""BO-loop, acquisition-utils, and model-wrapper edge cases (role of reference
``tests/unit/test_bayesian_optimizer.py`` raise/persistence families,
``tests/unit/acquisition/test_utils.py``, and ``tests/unit/models/test_interfaces.py``):
loop persistence and failure capture, chunked evaluation equivalence, local
dataset/model plumbing, dedup masks, batch observers, model stacks and encoders."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from tests.util.misc import FixedAcquisitionRule, mk_dataset, quadratic
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.utils import (
    copy_to_local_models,
    get_local_dataset,
    get_unique_points_mask,
    select_nth_output,
    split_acquisition_function,
    split_acquisition_function_calls,
    with_local_datasets,
)
from trieste_tpu.bayesian_optimizer import OptimizationResult, Record, stop_at_minimum
from trieste_tpu.data import Dataset
from trieste_tpu.models.interfaces import ModelStack
from trieste_tpu.objectives import mk_observer
from trieste_tpu.objectives.utils import mk_batch_observer
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box
from trieste_tpu.utils.misc import LocalizedTag


@pytest.fixture
def search_space():
    return Box([-1.0], [1.0])


@pytest.fixture
def observer():
    return mk_observer(quadratic)


def _quick_setup(observer, search_space, n=4):
    data = observer(search_space.sample(jax.random.PRNGKey(0), n))
    return {OBJECTIVE: data}, {OBJECTIVE: QuadraticMeanAndRBFKernel()}


# ------------------------------------------------------------------ split evaluation


def test_split_acquisition_function_matches_unsplit():
    fn = lambda x: jnp.sum(x**2, axis=(-1, -2), keepdims=False)[..., None]
    wrapped = split_acquisition_function(fn, 7)  # deliberately non-divisor chunk
    x = jnp.arange(50.0).reshape(25, 1, 2)
    np.testing.assert_allclose(np.asarray(wrapped(x)), np.asarray(fn(x)), rtol=1e-12)


def test_split_acquisition_function_small_input_passthrough():
    calls = []

    def fn(x):
        calls.append(x.shape)
        return jnp.zeros(x.shape[:1] + (1,))

    wrapped = split_acquisition_function(fn, 100)
    wrapped(jnp.zeros((10, 1, 1)))
    assert calls[0][0] == 10  # no chunking below the threshold


def test_split_acquisition_function_invalid_size():
    with pytest.raises(ValueError):
        split_acquisition_function(lambda x: x, 0)


def test_split_acquisition_function_calls_optimizer_equivalence(search_space):
    from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer

    opt = generate_continuous_optimizer(num_initial_samples=64, num_optimization_runs=4)
    split_opt = split_acquisition_function_calls(opt, 16)

    def acq(x):
        return -jnp.sum((jnp.asarray(x)[..., 0, :] - 0.3) ** 2, axis=-1, keepdims=True)

    a = opt(search_space, acq, key=jax.random.PRNGKey(0))
    b = split_opt(search_space, acq, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_select_nth_output():
    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(select_nth_output(x)), [0.0, 4.0, 8.0])
    np.testing.assert_array_equal(
        np.asarray(select_nth_output(x, 2)), [2.0, 6.0, 10.0]
    )


# ------------------------------------------------------------------ local data plumbing


def test_get_local_dataset_membership(search_space):
    ds = mk_dataset([[-0.9], [0.0], [0.9]], [[1.0], [2.0], [3.0]])
    local = get_local_dataset(Box([-0.5], [0.5]), ds)
    assert len(local) == 1
    np.testing.assert_array_equal(np.asarray(local.trimmed_query_points), [[0.0]])


def test_get_local_dataset_dimension_mismatch_raises():
    ds = mk_dataset([[0.0, 0.0]], [[1.0]])
    with pytest.raises(ValueError):
        get_local_dataset(Box([-1.0], [1.0]), ds)


def test_copy_to_local_models_are_independent():
    class Mutable:
        def __init__(self):
            self.value = 0

    copies = copy_to_local_models(Mutable(), 3)
    assert set(copies.keys()) == {LocalizedTag(OBJECTIVE, i) for i in range(3)}
    list(copies.values())[0].value = 99
    assert list(copies.values())[1].value == 0


def test_with_local_datasets_adds_tags():
    ds = mk_dataset([[0.0]], [[1.0]])
    out = with_local_datasets({OBJECTIVE: ds}, 2)
    assert set(out.keys()) == {
        OBJECTIVE,
        LocalizedTag(OBJECTIVE, 0),
        LocalizedTag(OBJECTIVE, 1),
    }
    assert len(out[LocalizedTag(OBJECTIVE, 1)]) == 1


def test_with_local_datasets_with_indices():
    ds = mk_dataset([[0.0], [1.0], [2.0]], [[0.0], [1.0], [2.0]])
    out = with_local_datasets(
        {OBJECTIVE: ds}, 2, local_dataset_indices=[jnp.array([0]), jnp.array([1, 2])]
    )
    assert len(out[LocalizedTag(OBJECTIVE, 0)]) == 1
    assert len(out[LocalizedTag(OBJECTIVE, 1)]) == 2


def test_with_local_datasets_preserves_existing_local():
    local_tag = LocalizedTag(OBJECTIVE, 0)
    global_ds = mk_dataset([[0.0], [1.0]], [[0.0], [1.0]])
    local_ds = mk_dataset([[5.0]], [[25.0]])
    out = with_local_datasets({OBJECTIVE: global_ds, local_tag: local_ds}, 2)
    assert len(out[local_tag]) == 1  # untouched


@pytest.mark.parametrize(
    "points, tol, want",
    [
        ([[0.0], [0.0], [1.0]], 1e-6, [True, False, True]),
        ([[0.0], [0.05], [1.0]], 0.1, [True, False, True]),
        ([[0.0], [0.05], [1.0]], 0.01, [True, True, True]),
    ],
)
def test_get_unique_points_mask(points, tol, want):
    mask = get_unique_points_mask(jnp.array(points), tolerance=tol)
    np.testing.assert_array_equal(np.asarray(mask), want)


def test_get_unique_points_mask_is_jittable():
    fn = jax.jit(get_unique_points_mask)
    mask = fn(jnp.array([[0.0], [0.0], [2.0]]))
    np.testing.assert_array_equal(np.asarray(mask), [True, False, True])


# ------------------------------------------------------------------ batch observer


def test_mk_batch_observer_rank2_passthrough(observer):
    wrapped = mk_batch_observer(observer)
    out = wrapped(jnp.array([[0.5]]))
    assert set(out.keys()) == {OBJECTIVE}
    assert len(out[OBJECTIVE]) == 1


def test_mk_batch_observer_rank3_local_tags(observer):
    wrapped = mk_batch_observer(observer)
    qps = jnp.array([[[0.1], [0.2]], [[0.3], [0.4]]])  # [B=2, V=2, D=1]
    out = wrapped(qps)
    assert OBJECTIVE in out
    assert len(out[OBJECTIVE]) == 4  # combined
    for v in range(2):
        local = out[LocalizedTag(OBJECTIVE, v)]
        assert len(local) == 2
    np.testing.assert_allclose(
        np.asarray(out[LocalizedTag(OBJECTIVE, 1)].trimmed_query_points[:, 0]),
        [0.2, 0.4],
    )


def test_mk_batch_observer_invalid_rank_raises(observer):
    with pytest.raises(ValueError):
        mk_batch_observer(observer)(jnp.zeros((2, 2, 2, 1)))


# ------------------------------------------------------------------ loop persistence


def test_optimize_rejects_negative_steps(observer, search_space):
    datasets, models = _quick_setup(observer, search_space)
    bo = tt.BayesianOptimizer(observer, search_space)
    with pytest.raises(ValueError):
        bo.optimize(-1, datasets, models, FixedAcquisitionRule([[0.1]]),
                    key=jax.random.PRNGKey(0))


def test_optimize_zero_steps_returns_initial_data(observer, search_space):
    datasets, models = _quick_setup(observer, search_space)
    bo = tt.BayesianOptimizer(observer, search_space)
    result = bo.optimize(0, datasets, models, FixedAcquisitionRule([[0.1]]),
                         key=jax.random.PRNGKey(0), track_state=False)
    assert result.is_ok
    assert len(result.try_get_final_dataset()) == 4


def test_optimize_does_not_mutate_input_datasets(observer, search_space):
    """The loop deepcopies user datasets (reference ``bayesian_optimizer.py:661``)."""
    datasets, models = _quick_setup(observer, search_space)
    before = len(datasets[OBJECTIVE])
    bo = tt.BayesianOptimizer(observer, search_space)
    bo.optimize(2, datasets, models, FixedAcquisitionRule([[0.1]]),
                key=jax.random.PRNGKey(0), track_state=False)
    assert len(datasets[OBJECTIVE]) == before


def test_track_state_false_empty_history(observer, search_space):
    datasets, models = _quick_setup(observer, search_space)
    bo = tt.BayesianOptimizer(observer, search_space)
    result = bo.optimize(2, datasets, models, FixedAcquisitionRule([[0.1]]),
                         key=jax.random.PRNGKey(0), track_state=False)
    assert result.history == []


def test_track_path_writes_step_files(observer, search_space, tmp_path):
    datasets, models = _quick_setup(observer, search_space)
    bo = tt.BayesianOptimizer(observer, search_space)
    result = bo.optimize(2, datasets, models, FixedAcquisitionRule([[0.1]]),
                         key=jax.random.PRNGKey(0), track_path=tmp_path)
    assert result.is_ok
    files = sorted(p.name for p in tmp_path.iterdir())
    assert any("step" in f for f in files)
    # history entries are lazily-loaded FrozenRecords pointing at those files
    loaded = result.history[0].load() if hasattr(result.history[0], "load") else result.history[0]
    assert OBJECTIVE in loaded.datasets


def test_optimization_result_astuple(observer, search_space):
    datasets, models = _quick_setup(observer, search_space)
    bo = tt.BayesianOptimizer(observer, search_space)
    result = bo.optimize(1, datasets, models, FixedAcquisitionRule([[0.1]]),
                         key=jax.random.PRNGKey(0), track_state=False)
    final, history = result.astuple()
    assert final.is_ok
    assert history == []


def test_err_result_accessors_raise(observer, search_space):
    def exploding(_):
        raise RuntimeError("observer died")

    datasets, models = _quick_setup(observer, search_space)
    bo = tt.BayesianOptimizer(exploding, search_space)
    result = bo.optimize(2, datasets, models, FixedAcquisitionRule([[0.1]]),
                         key=jax.random.PRNGKey(0), track_state=False)
    assert result.is_err
    with pytest.raises(RuntimeError, match="observer died"):
        result.try_get_final_datasets()


def test_stop_at_minimum_triggers():
    cb = stop_at_minimum(minimum=jnp.array([0.0]), minimum_rtol=0.1, minimum_atol=0.05)
    near = {OBJECTIVE: mk_dataset([[0.1]], [[0.01]])}
    far = {OBJECTIVE: mk_dataset([[0.9]], [[0.81]])}
    assert cb(near, {}, None)
    assert not cb(far, {}, None)


def test_stop_at_minimum_by_minimizer():
    cb = stop_at_minimum(minimizers=jnp.array([[0.5]]), minimizers_atol=0.01)
    near = {OBJECTIVE: mk_dataset([[0.505]], [[1.0]])}
    assert cb(near, {}, None)


def test_record_save_and_frozen_load(tmp_path):
    record = Record(
        datasets={OBJECTIVE: mk_dataset([[0.0]], [[1.0]])},
        models={OBJECTIVE: QuadraticMeanAndRBFKernel()},
        acquisition_state=None,
    )
    frozen = record.save(tmp_path / "rec.pickle")
    loaded = frozen.load()
    assert len(loaded.datasets[OBJECTIVE]) == 1
    np.testing.assert_array_equal(
        np.asarray(frozen.dataset.trimmed_query_points), [[0.0]]
    )


def test_continue_optimization_empty_result_raises(observer, search_space):
    bo = tt.BayesianOptimizer(observer, search_space)
    from trieste_tpu.utils.misc import Err

    empty = OptimizationResult(Err(RuntimeError("nothing")), [])
    with pytest.raises(ValueError):
        bo.continue_optimization(2, empty)


# ------------------------------------------------------------------ stacks & encoders


def _linear_model(slope):
    from tests.util.models import GaussianProcess
    from trieste_tpu.ops.kernels import stationary

    return GaussianProcess([lambda x: slope * x[..., :1].sum(-1)], [stationary("rbf", 1.0, 1.0)])


def test_model_stack_concatenates_outputs():
    stack = ModelStack((_linear_model(1.0), 1), (_linear_model(2.0), 1))
    x = jnp.array([[1.0], [2.0]])
    mean, var = stack.predict(x)
    assert mean.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(mean), [[1.0, 2.0], [2.0, 4.0]], atol=1e-6)
    assert bool(jnp.all(var > 0))


def test_model_stack_event_sizes_recorded():
    stack = ModelStack((_linear_model(1.0), 1), (_linear_model(2.0), 2))
    assert list(stack.event_sizes) == [1, 2]
    assert len(stack.models) == 2


def test_encoded_model_routes_through_encoder():
    from trieste_tpu.models.encoders import EncodedProbabilisticModel

    base = QuadraticMeanAndRBFKernel()
    # encoder doubles the input: mean of encoded model at x is ||2x||^2
    model = EncodedProbabilisticModel(base, lambda x: 2.0 * jnp.asarray(x))
    mean, _ = model.predict(jnp.array([[0.5]]))
    np.testing.assert_allclose(np.asarray(mean), [[1.0]], atol=1e-6)


def test_encode_dataset_applies_encoder():
    from trieste_tpu.models.encoders import encode_dataset

    ds = mk_dataset([[1.0], [2.0]], [[0.0], [0.0]])
    encoded = encode_dataset(ds, lambda x: x + 10.0)
    np.testing.assert_array_equal(
        np.asarray(encoded.trimmed_query_points), [[11.0], [12.0]]
    )
    assert len(encoded) == 2

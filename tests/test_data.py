"""Input-pipeline helpers: ordering, sharding, epoch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mlx_audio_primitives_tpu.parallel.mesh import make_mesh
from mlx_audio_primitives_tpu.utils.data import batch_iterator, prefetch_to_device


def test_prefetch_preserves_order_and_values():
    batches = [{"x": np.full((2, 3), i, np.float32), "i": np.asarray(i)}
               for i in range(7)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
        assert int(b["i"]) == i


def test_prefetch_short_iterator_and_validation():
    assert list(prefetch_to_device(iter([]), size=4)) == []
    one = list(prefetch_to_device(iter([np.ones(2)]), size=4))
    assert len(one) == 1
    with pytest.raises(ValueError, match="size"):
        list(prefetch_to_device(iter([]), size=0))


def test_prefetch_applies_sharding():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(n_data=8, n_time=1)
    sh = NamedSharding(mesh, P("data"))
    batches = [np.arange(16, dtype=np.float32).reshape(16, 1) for _ in range(3)]
    for b in prefetch_to_device(iter(batches), size=2, sharding=sh):
        assert b.sharding.is_equivalent_to(sh, b.ndim)


def test_batch_iterator_covers_every_example_once():
    data = {"x": np.arange(10), "y": np.arange(10) * 2}
    seen = []
    for b in batch_iterator(data, 3, shuffle=True, seed=1):
        np.testing.assert_array_equal(b["y"], b["x"] * 2)  # slices aligned
        seen.extend(b["x"].tolist())
    assert len(seen) == 9 and len(set(seen)) == 9  # drop_remainder
    full = []
    for b in batch_iterator(data, 3, shuffle=True, seed=1, drop_remainder=False):
        full.extend(b["x"].tolist())
    assert sorted(full) == list(range(10))


def test_batch_iterator_determinism_and_epochs():
    data = np.arange(8)
    a = [b.tolist() for b in batch_iterator(data, 4, seed=7)]
    b = [b.tolist() for b in batch_iterator(data, 4, seed=7)]
    assert a == b
    two = [bt.tolist() for bt in batch_iterator(data, 4, seed=7, epochs=2)]
    assert len(two) == 4
    assert two[:2] != two[2:]  # epoch 2 reshuffles


def test_batch_iterator_transform_and_validation():
    data = np.arange(6, dtype=np.float32)
    out = list(batch_iterator(data, 2, shuffle=False, transform=lambda b: b + 1))
    np.testing.assert_array_equal(out[0], [1, 2])
    with pytest.raises(ValueError, match="batch_size"):
        list(batch_iterator(data, 0))
    with pytest.raises(ValueError, match="example axis"):
        list(batch_iterator({"a": np.zeros(3), "b": np.zeros(4)}, 2))


def test_prefetch_composes_with_batch_iterator():
    data = {"x": np.random.default_rng(0).standard_normal((12, 5)).astype(np.float32)}
    n = 0
    for b in prefetch_to_device(batch_iterator(data, 4, shuffle=False)):
        assert b["x"].shape == (4, 5)
        n += 1
    assert n == 3

"""parallel/mesh helpers, distributed single-process behavior, and the
device-prefetch pipeline."""

import numpy as np

import jax

from tests import conftest as C  # noqa: F401
from vit_grid_model_tpu.core import distributed
from vit_grid_model_tpu.core.config import MeshConfig
from vit_grid_model_tpu.data.pipeline import device_prefetch
from vit_grid_model_tpu.parallel import mesh as meshlib


def test_pad_to_multiple():
    batch = {"a": np.arange(10).reshape(5, 2), "b": np.ones((5,))}
    padded, real = meshlib.pad_to_multiple(batch, 4)
    assert real == 5
    assert padded["a"].shape == (8, 2)
    # padding repeats the last row
    np.testing.assert_array_equal(padded["a"][5], padded["a"][4])
    same, real = meshlib.pad_to_multiple(batch, 5)
    assert same["a"].shape == (5, 2) and real == 5


def test_mesh_shapes_and_shard():
    mesh = meshlib.make_mesh(MeshConfig(data=4, model=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    batch = {"x": np.ones((8, 3), np.float32)}
    sharded = meshlib.shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_distributed_single_process():
    distributed.initialize()          # no coordinator: silent no-op
    assert distributed.is_primary()
    assert distributed.local_batch_slice(8) == slice(0, 8)


def test_device_prefetch_order_and_laziness():
    puts = []

    def put(b):
        puts.append(b)
        return b * 10

    out = list(device_prefetch(iter([1, 2, 3]), put))
    assert out == [10, 20, 30]
    assert puts == [1, 2, 3]
    assert list(device_prefetch(iter([]), put)) == []

"""Parallel-layer unit tests: mesh construction, dist info, shardings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from qat_vit_tpu.parallel import (
    DistInfo,
    barrier,
    batch_sharding,
    get_dist_info,
    is_main_process,
    make_mesh,
    replicated_sharding,
    shard_batch,
)


class TestMesh:
    def test_default_all_data(self):
        m = make_mesh()
        assert m.shape == {"data": 8, "model": 1}

    def test_tp_split(self):
        m = make_mesh(model=2)
        assert m.shape == {"data": 4, "model": 2}

    def test_explicit(self):
        m = make_mesh(data=2, model=4)
        assert m.shape == {"data": 2, "model": 4}

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            make_mesh(model=3)
        with pytest.raises(ValueError):
            make_mesh(data=3, model=2)

    def test_subset_devices(self):
        m = make_mesh(devices=jax.devices()[:4])
        assert m.shape == {"data": 4, "model": 1}


class TestDistInfo:
    def test_single_host_values(self):
        info = get_dist_info()
        assert isinstance(info, DistInfo)
        assert info.world_size == 1 and info.rank == 0
        assert info.is_main_process
        assert info.local_device_count == 8
        assert is_main_process()

    def test_barrier_noop_single_host(self):
        barrier("test")  # must not raise or block


class TestShardings:
    def test_shard_batch_places_on_data_axis(self):
        mesh = make_mesh()
        batch = {
            "image": np.zeros((16, 4, 4, 3), np.uint8),
            "label": np.arange(16, dtype=np.int32),
        }
        out = shard_batch(batch, mesh)
        sh = out["image"].sharding
        assert sh.spec == P("data")
        # each device holds 2 rows
        assert out["image"].addressable_shards[0].data.shape[0] == 2

    def test_replicated_sharding(self):
        mesh = make_mesh()
        x = jax.device_put(jnp.ones((4, 4)), replicated_sharding(mesh))
        assert x.sharding.spec == P()
        assert len(x.addressable_shards) == 8

    def test_batch_sharding_spec(self):
        mesh = make_mesh(data=4, model=2)
        assert batch_sharding(mesh).spec == P("data")


def test_pick_free_port():
    from qat_vit_tpu.parallel import pick_free_port

    p = pick_free_port()
    assert 1024 <= p <= 65535

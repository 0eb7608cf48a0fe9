"""Multi-host input pipeline (parallel/input_pipeline.py): FOV sharding
across hosts, staging-ring prefetch, global-batch assembly on the
8-virtual-device mesh, and the device-upload overlap path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from imageanalysis3_tpu.io.dax import write_dax, split_channels
from imageanalysis3_tpu.parallel import (shard_fovs, FovPrefetcher,
                                         assemble_global_batch,
                                         prefetch_to_device, make_mesh)

CHANNELS = ["750", "647", "561"]
N_Z, BUFFER = 4, 2


def test_shard_fovs_partition_properties():
    fovs = [f"fov_{i:02d}" for i in range(11)]
    shards = [shard_fovs(fovs, pi, 4) for pi in range(4)]
    # disjoint cover, order preserved, contiguous, balanced to +-1
    assert sum(shards, []) == fovs
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1 and sizes == [3, 3, 3, 2]
    # single-host degenerate case = whole list
    assert shard_fovs(fovs, 0, 1) == fovs
    # more hosts than FOVs -> trailing hosts get empty shards
    assert shard_fovs(fovs[:2], 3, 4) == []
    with pytest.raises(ValueError):
        shard_fovs(fovs, 4, 4)


def _write_fovs(tmp_path, n_fov, rng, hw=(16, 16)):
    n_frames = N_Z * len(CHANNELS) + 2 * BUFFER
    paths, movies = [], []
    for k in range(n_fov):
        movie = rng.integers(0, 65535,
                             size=(n_frames,) + hw).astype(np.uint16)
        p = str(tmp_path / f"Conv_zscan_{k:02d}.dax")
        write_dax(p, movie)
        paths.append(p)
        movies.append(movie)
    return paths, movies


def test_prefetcher_yields_shard_in_order(tmp_path, rng):
    paths, movies = _write_fovs(tmp_path, 5, rng)
    pf = FovPrefetcher(paths, CHANNELS, n_z=N_Z, buffer_frames=BUFFER,
                       depth=2)
    got = []
    for item in pf:
        want = np.stack(split_channels(movies[len(got)], CHANNELS,
                                       CHANNELS, n_z=N_Z,
                                       buffer_frames=BUFFER))
        np.testing.assert_array_equal(item.array, want)
        assert item.name == paths[len(got)]
        # copy before advancing: the array is a loaned staging buffer
        got.append(item.array.copy())
    assert len(got) == 5
    # buffer ring actually reused: 5 FOVs through 2 buffer sets means
    # later arrays reuse earlier storage, so earlier *uncopied* views
    # would have been overwritten — verify the copies all differ (they
    # were taken at the right time) by checking against ground truth
    for k, arr in enumerate(got):
        want = np.stack(split_channels(movies[k], CHANNELS, CHANNELS,
                                       n_z=N_Z, buffer_frames=BUFFER))
        np.testing.assert_array_equal(arr, want)
    with pytest.raises(RuntimeError, match="single-use"):
        iter(pf).__next__()


def test_prefetcher_error_relay(tmp_path, rng):
    paths, _ = _write_fovs(tmp_path, 2, rng)
    pf = FovPrefetcher(paths + [str(tmp_path / "missing.dax")],
                       CHANNELS, n_z=N_Z, buffer_frames=BUFFER)
    it = iter(pf)
    next(it).release()
    next(it).release()
    with pytest.raises(RuntimeError, match="prefetcher read failed"):
        next(it)


def test_assemble_global_batch_shards_rows():
    mesh = make_mesh(8)
    batch = np.arange(8 * 3 * 4, dtype=np.float32).reshape(8, 3, 4)
    arr = assemble_global_batch(batch, mesh)
    assert arr.shape == (8, 3, 4)
    assert arr.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(arr), batch)
    # each device holds exactly its row
    for shard in arr.addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(shard.data), batch[shard.index])
    # and a sharded reduction over it works end to end
    total = jax.jit(lambda x: jnp.sum(x, axis=(1, 2)),
                    out_shardings=jax.sharding.NamedSharding(
                        mesh, P("data")))(arr)
    np.testing.assert_allclose(np.asarray(total), batch.sum(axis=(1, 2)))


def test_prefetch_to_device_end_to_end(tmp_path, rng):
    """shard -> prefetch -> upload -> device compute matches the direct
    host computation FOV for FOV."""
    paths, movies = _write_fovs(tmp_path, 4, rng)
    my = shard_fovs(paths, 0, 1)
    pf = FovPrefetcher(my, CHANNELS, n_z=N_Z, buffer_frames=BUFFER)
    f = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32), axis=(1, 2, 3)))
    results = {}
    for name, dev in prefetch_to_device(iter(pf)):
        results[name] = f(dev)          # async dispatch, no host sync
    assert list(results) == my
    for k, name in enumerate(my):
        chans = split_channels(movies[k], CHANNELS, CHANNELS, n_z=N_Z,
                               buffer_frames=BUFFER)
        want = np.array([c.astype(np.float64).sum() for c in chans])
        # device sums accumulate in f32
        np.testing.assert_allclose(np.asarray(results[name]), want,
                                   rtol=1e-6 * len(chans[0].ravel()))

"""Native C++ batch loader: correctness of sync gather and async prefetch."""

import os

import numpy as np
import pytest

from adorym_tpu.io import fastloader


pytestmark = pytest.mark.skipif(not fastloader.available(),
                                reason='native loader unavailable')


@pytest.fixture(scope='module')
def raw_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('fastloader')
    rng = np.random.default_rng(0)
    data = rng.random((3, 20, 8, 8)).astype(np.float32)
    raw = str(root / 'data.raw')
    data.tofile(raw)
    return raw, data


def test_sync_gather_matches_numpy(raw_dataset):
    raw, data = raw_dataset
    ld = fastloader.FastLoader(raw, data.shape)
    idx = [3, 17, 0, 9]
    out = ld.gather(1, idx)
    np.testing.assert_array_equal(out, data[1][idx])
    ld.close()


def test_async_prefetch(raw_dataset):
    raw, data = raw_dataset
    ld = fastloader.FastLoader(raw, data.shape, n_slots=2)
    idx_a = [0, 5, 10]
    idx_b = [1, 2, 3, 4]
    ld.prefetch(0, 0, idx_a)
    ld.prefetch(1, 2, idx_b)
    np.testing.assert_array_equal(ld.get(0, len(idx_a)), data[0][idx_a])
    np.testing.assert_array_equal(ld.get(1, len(idx_b)), data[2][idx_b])
    # Reuse slots
    ld.prefetch(0, 1, idx_b)
    np.testing.assert_array_equal(ld.get(0, len(idx_b)), data[1][idx_b])
    ld.close()


def test_h5_conversion(raw_dataset, tmp_path):
    raw, data = raw_dataset
    from adorym_tpu.io.data import write_data_file
    h5 = str(tmp_path / 'd.h5')
    write_data_file(h5, data)
    raw2 = str(tmp_path / 'd.raw')
    shape = fastloader.convert_h5_to_raw(h5, raw2)
    assert tuple(shape) == data.shape
    ld = fastloader.FastLoader(raw2, shape)
    np.testing.assert_allclose(ld.gather(0, [0]), np.abs(data[0][[0]]))
    ld.close()


def test_open_missing_file_fails():
    with pytest.raises(RuntimeError):
        fastloader.FastLoader('/nonexistent/file.raw', (1, 1, 4, 4))

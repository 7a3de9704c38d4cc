import numpy as np
import pytest

from rcvpose_tpu import native
from tests.test_data import write_dpt


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_native_read_dpt(tmp_path, rng):
    depth = rng.integers(0, 5000, size=(33, 47)).astype(np.uint16)
    p = tmp_path / "d.dpt"
    write_dpt(str(p), depth)
    out = native.read_dpt(str(p))
    np.testing.assert_array_equal(out, depth)


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_native_batch_read(tmp_path, rng):
    paths = []
    deps = []
    for i in range(7):
        d = rng.integers(0, 5000, size=(16 + i, 24)).astype(np.uint16)
        p = tmp_path / f"d{i}.dpt"
        write_dpt(str(p), d)
        paths.append(str(p))
        deps.append(d)
    outs = native.batch_read_dpt(paths, n_threads=3)
    for o, d in zip(outs, deps):
        np.testing.assert_array_equal(o, d)


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_native_matches_python_reader(tmp_path, rng):
    from rcvpose_tpu.data import readers
    depth = rng.integers(0, 65535, size=(48, 64)).astype(np.uint16)
    p = tmp_path / "x.dpt"
    write_dpt(str(p), depth)
    np.testing.assert_array_equal(native.read_dpt(str(p)),
                                  readers.read_depth(str(p)))


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_native_error_on_garbage(tmp_path):
    p = tmp_path / "bad.dpt"
    p.write_bytes(b"nope")
    with pytest.raises(IOError):
        native.read_dpt(str(p))

import os

import numpy as np
import pytest

from rcvpose_tpu.data.dataset import YcbDataset
from rcvpose_tpu.data.loader import BatchLoader


@pytest.fixture
def ycb_tree(tmp_path, rng):
    import h5py

    root = tmp_path
    os.makedirs(root / "toy" / "Split")
    ids = ["0001_000001", "0001_000002"]
    with open(root / "toy" / "Split" / "val.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    with h5py.File(root / "toy.hdf5", "w") as f:
        for i in ids:
            radial = np.zeros((32, 48), np.float32)
            radial[8:20, 10:30] = rng.uniform(0.5, 12.0, size=(12, 20))
            f.create_dataset(f"3Dradius_pt1_dm/{i}", data=radial,
                             compression="gzip")
            img = (rng.uniform(size=(32, 48, 3)) * 255).astype(np.uint8)
            f.create_dataset(f"JPEGImages/{i}", data=img)
    return str(root)


def test_ycb_dataset_and_loader(ycb_tree):
    ds = YcbDataset(ycb_tree, "toy", kpt_num=1, split="val")
    assert len(ds) == 2
    raw = ds.raw(0)
    assert raw["image"].shape == (32, 48, 3)
    assert raw["radial_dm"].shape == (32, 48)

    k = np.eye(3)
    loader = BatchLoader(ds, k, batch_size=2, shuffle=False, ycb_clip=True)
    (batch,) = list(loader)
    radial = np.asarray(batch["radial"])
    sem = np.asarray(batch["sem"])
    assert radial.shape == (2, 32, 48)
    assert (radial < 10.0).all()  # >= 10 dm zeroed (reference YCB filter)
    np.testing.assert_array_equal(sem, np.where(radial > 0, 1.0, -1.0))

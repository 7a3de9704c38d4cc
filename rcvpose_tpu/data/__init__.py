from rcvpose_tpu.data.readers import (  # noqa: F401
    read_depth,
    read_image,
    read_mask,
    read_ply_points,
)
from rcvpose_tpu.data.dataset import LinemodDataset  # noqa: F401
from rcvpose_tpu.data.loader import BatchLoader, make_loaders  # noqa: F401

from rcvpose_tpu.ops.voting import (  # noqa: F401
    VOTE_BAND,
    AccumulatorResult,
    accumulate_3d,
    vote_counts_reference,
    vote_grid_oracle,
)

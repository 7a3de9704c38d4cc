from rcvpose_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    replicated,
    shard_batch,
    sharded_frame_pose,
    sharded_frame_scores,
    sharded_vote_counts,
    warm_collectives,
)

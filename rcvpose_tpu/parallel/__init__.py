from rcvpose_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    host_allgather,
    host_allgather_concat,
    local_data_mesh,
    replicated,
    shard_batch,
    sharded_frame_pose,
    sharded_frame_scores,
    sharded_vote_counts,
    warm_collectives,
)

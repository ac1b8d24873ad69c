from psnerf_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    shard_stage2_batch,
    shard_stage1_batch,
    constrain_stage1_batch,
    constrain_stage2_batch,
    replicate,
)

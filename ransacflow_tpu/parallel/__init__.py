from ransacflow_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    sharded_ransac,
    sharded_align_pairs,
)

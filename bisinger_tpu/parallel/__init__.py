from bisinger_tpu.parallel.mesh import (
    batch_sharding,
    global_batch_from_process_local,
    make_mesh,
    param_sharding,
    replicate_sharding,
    shard_batch,
    tensor_parallel_shardings,
)
from bisinger_tpu.parallel.pipeline import (
    cond_projections_stacked,
    make_pipe_mesh,
    pipelined_denoiser,
    split_stages,
)
from bisinger_tpu.parallel.sequence import (
    constrain_time,
    make_seq_mesh,
    shard_longform_batch,
    time_spec,
)

__all__ = [
    "make_pipe_mesh",
    "pipelined_denoiser",
    "split_stages",
    "cond_projections_stacked",
    "make_mesh",
    "shard_batch",
    "batch_sharding",
    "replicate_sharding",
    "param_sharding",
    "global_batch_from_process_local",
    "tensor_parallel_shardings",
    "make_seq_mesh",
    "constrain_time",
    "shard_longform_batch",
    "time_spec",
]

from ctagan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from ctagan_tpu.parallel.tensor import (
    make_tp_mesh,
    make_dp_tp_mesh,
    tp_param_specs,
    shard_params_tp,
    infer_tensor_sharded,
)
from ctagan_tpu.parallel.fsdp import (
    make_fsdp_mesh,
    fsdp_param_specs,
    shard_p2p_state_fsdp,
    fsdp_train_step_fn,
)
from ctagan_tpu.parallel.spatial import (
    make_sp_mesh,
    make_dp_sp_mesh,
    sp_batch_sharding,
    shard_batch_sp,
    shard_p2p_state_sp,
    sp_train_step_fn,
)

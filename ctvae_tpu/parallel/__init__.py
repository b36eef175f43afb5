from .mesh import (DATA_AXIS, MODEL_AXIS, REPLICA_AXIS, DEFAULT_TP_RULES,
                   batch_sharding, fsdp_shardings, make_hybrid_mesh,
                   make_mesh, param_shardings, pin_state_shardings,
                   put_replicated, replicated, shard_batch, shard_dim,
                   shard_params, shard_params_fsdp)

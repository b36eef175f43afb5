from .mesh import (DATA_AXIS, MODEL_AXIS, DEFAULT_TP_RULES, batch_sharding,
                   make_mesh, param_shardings, put_replicated, replicated,
                   shard_batch, shard_params)

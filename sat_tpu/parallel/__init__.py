from sat_tpu.parallel.mesh import (make_mesh, batch_sharding,
                                   block_batch_sharding,
                                   param_sharding, replicated,
                                   validate_host_divisibility)
from sat_tpu.parallel.train_step import (
    TrainState,
    make_train_step,
    make_eval_step,
    make_bank_train_step,
    make_bank_train_block,
    make_bank_eval_block,
    make_bank_eval_step,
    init_train_state,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "block_batch_sharding",
    "param_sharding",
    "replicated",
    "validate_host_divisibility",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "make_bank_train_step",
    "make_bank_train_block",
    "make_bank_eval_block",
    "make_bank_eval_step",
    "init_train_state",
]

from .losses import IGNORE_INDEX, chunked_cross_entropy, shift_labels  # noqa: F401
from .optimizer import OptimizerConfig, make_optimizer, make_schedule, trainable_mask  # noqa: F401
from .step import TrainState, init_sharded_state, loss_fn, make_train_loop, make_train_step, shard_batch  # noqa: F401

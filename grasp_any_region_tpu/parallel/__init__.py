from .sharding import (  # noqa: F401
    batch_pspecs,
    constrain_seq,
    param_pspecs,
    param_shardings,
    shard_params,
)

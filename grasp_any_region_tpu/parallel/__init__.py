from .pipeline import (  # noqa: F401
    make_pipeline_mesh,
    pipeline_bubble_fraction,
    pipeline_prefill,
)
from .sharding import (  # noqa: F401
    batch_pspecs,
    constrain_seq,
    param_pspecs,
    param_shardings,
    shard_params,
)

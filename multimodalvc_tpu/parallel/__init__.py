from .mesh import (  # noqa: F401
    AXIS_ORDER,
    BATCH_AXES,
    batch_sharding,
    batch_spec,
    local_batch_multiple,
    make_mesh,
    replicated,
    resolve_axis_sizes,
    single_device_mesh,
)
from .sharding import (  # noqa: F401
    TRANSFORMER_TP_RULES,
    constrain,
    infer_param_specs,
    shard_params,
    specs_to_shardings,
)

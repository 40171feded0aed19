from .registry import (  # noqa: F401
    available,
    build,
    get_class,
    get_config_class,
    register,
    register_criterion,
    register_model,
    register_task,
)
from .structured import (  # noqa: F401
    MISSING,
    apply_overrides,
    from_dict,
    load_yaml,
    merge,
    to_dict,
)
from .configs import (  # noqa: F401
    CheckpointConfig,
    CommonConfig,
    DatasetConfig,
    GenerationConfig,
    MeshConfig,
    OptimizationConfig,
    TrainRootConfig,
)

from .config import (  # noqa: F401
    GARConfig,
    TextConfig,
    VisionConfig,
    gar_1b,
    gar_8b,
    gar_tiny,
    load_config,
    save_config,
    apply_overrides,
    from_hf_config,
)
from .mesh import MeshSpec, make_mesh  # noqa: F401

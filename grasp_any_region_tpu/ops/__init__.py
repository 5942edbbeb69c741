from .attention import decode_attention_reference, mha, mha_reference  # noqa: F401
from .norms import layer_norm, rms_norm  # noqa: F401
from .pooling import pool_tokens_2x  # noqa: F401
from .roi_align import roi_align  # noqa: F401
from .rope import (  # noqa: F401
    apply_rope,
    apply_rope_2d,
    axial_rope_angles,
    init_mixed_rope_freqs,
    llama_inv_freq,
    mixed_rope_angles,
    rope_cos_sin,
)
from .tiles import merge_tiles, merge_tiles_masked, split_tiles  # noqa: F401

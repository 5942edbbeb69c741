from .gar import (  # noqa: F401
    GARBatch,
    build_prefill_embeds,
    decode_mask_values,
    encode_images,
    gar_decode_step,
    gar_prefill,
    init_gar_params,
    mask_patch_embed,
    scatter_image_features,
    seed_cache_from_prefill,
)
from .generate import GenerationResult, generate  # noqa: F401
from .llama import (  # noqa: F401
    KVCache,
    embed_tokens,
    init_llama_params,
    llama_decode_step,
    llama_prefill,
    lm_logits,
)
from .projector import init_projector_params, projector_forward  # noqa: F401
from .replay import replay_features, roi_align_tiled, scatter_replay  # noqa: F401
from .vision import init_vision_params, patchify, vision_forward  # noqa: F401

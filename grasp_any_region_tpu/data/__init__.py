from .builders import RegionSample, build_region_batch, build_sample, collate_samples  # noqa: F401
from .chat import ChatMessage, apply_chat_template, find_crop_runs, mask_labels  # noqa: F401
from .image_processor import GARImageProcessor, ImageProcessorConfig, select_tile_grid  # noqa: F401
from .prompts import (  # noqa: F401
    bbox_from_mask,
    multi_region_question,
    rasterize_prompts,
    single_region_question,
)
from .synthetic import synthetic_batch  # noqa: F401
from .tokenizer import GARTokenizer  # noqa: F401

from .model import SAMConfig, init_sam_params, predict_mask, sam_vit_b, sam_vit_h, sam_vit_l  # noqa: F401
from .pipeline import SamPredictor, draw_mask_overlay, mask_contours  # noqa: F401

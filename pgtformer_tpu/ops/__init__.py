from pgtformer_tpu.ops.window import (
    window_partition,
    window_reverse,
    relative_position_index,
    shifted_window_mask,
    effective_window_shift,
)
from pgtformer_tpu.ops.image import (
    imagenet_normalize,
    adaptive_instance_normalization,
    resize_nearest,
    resize_bilinear_align_corners,
    upsample_nearest_2x,
)

from crog_tpu.ops.affine import (  # noqa: F401
    get_affine_transform,
    letterbox_transform,
    warp_affine_np,
)
from crog_tpu.ops.rects import box_points, polygon_mask, rects_to_points  # noqa: F401
from crog_tpu.ops.resize import resize_bilinear, resize_bicubic, upsample2x_bilinear  # noqa: F401
from crog_tpu.ops.peaks import peak_local_max_np, detect_grasp_peaks  # noqa: F401

from ctagan_tpu.ops.windowing import (
    window_normalize,
    fullrange_normalize,
    dual_window,
    to_windowdata,
    body_mask,
    mask_background_to_air,
)
from ctagan_tpu.ops.warp import (
    grid_sample_border,
    warp2d,
    warp2d_adaptive,
    warp2d_dense,
    warp2d_local,
)
from ctagan_tpu.ops.resize import interpolate_nearest, interpolate_bilinear
from ctagan_tpu.ops.augment import random_affine, affine_warp
from ctagan_tpu.ops.quantize import (
    generator_int8_forward,
    quantize_generator,
    quantize_weight_per_channel,
)
from ctagan_tpu.ops.fused_up import fused_up_concat_conv
from ctagan_tpu.ops.registration3d import (
    compose,
    demons_register,
    exp_field,
    smooth3d,
    warp3d,
)
from ctagan_tpu.ops import losses, metrics

"""Compute ops: filters, matching costs, disparity selection, post-process."""

from .filters import (  # noqa: F401
    box_filter,
    box_filter_sum,
    guided_filter_color,
    guided_filter_gray,
    guided_filter_volume,
    median3x3,
)
from .cost import (  # noqa: F401
    adgrad_bgr_volumes,
    bgr_to_gray,
    census_cost_volumes,
    census_stereo,
    local_contrast,
    shifted_stack,
    ternary_census_planes,
    windowed_volumes,
)
from .select import wta_argmin, wta_disparity  # noqa: F401
from .postprocess import (  # noqa: F401
    lr_consistency,
    lr_occlusion_mask,
    nearest_valid_fill,
    weighted_median,
)

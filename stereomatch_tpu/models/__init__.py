"""Stereo pipeline families (the framework's "models").

Each pipeline is a pure jittable function from a rectified stereo pair to
disparity maps, mirroring one of the reference's five stereo engines:

  costvolume  — AD+gradient volume + guided filter + WTA + Huber denoise
                (ref: costVolumeStereoPlusVariationalDenoise,
                src/PatchMatchStereoGPU.cu:8776-9410)
  census      — ternary census + WTA (ref: src/StereoMatching.cpp:27-114)
  sgbm        — 8-path semi-global matching (ref: OpenCV StereoSGBM wrapper,
                src/StereoMatching.cpp:148-193)
  mst         — Stereo3DMST segment-tree aggregation (ref: src/Stereo3DMST.cpp)
  patchmatch  — slanted-plane PatchMatch (ref: src/pm.cpp,
                src/PatchMatchStereoGPU.cu:2602-3023)
  coupled     — alternating PatchMatch/WTA <-> variational smoothing (the
                reference's Family-E scheme, dead there, live here:
                src/PatchMatchStereoGPU.cu:3273-3581, :3903-4073,
                :4748-4803, :7331-7727)
"""

from .costvolume import cost_volume_stereo, CostVolumeOutput  # noqa: F401
from .mst import (  # noqa: F401
    MSTOutput,
    build_view_forest,
    mst_stereo,
    mst_stereo_c2f,
    mst_stereo_fused,
    mst_stereo_seeded,
)
from .sgbm_mst import (  # noqa: F401
    mst_stereo_temporal_fused,
    sgbm_mst_stereo,
    sgbm_mst_stereo_fused,
    sgbm_mst_video,
    sgbm_seed_disparities,
)
from .patchmatch import patchmatch_pipeline, PatchMatchOutput  # noqa: F401
from .coupled import (  # noqa: F401
    CoupledOutput,
    coupled_patchmatch_stereo,
    coupled_wta_stereo,
)

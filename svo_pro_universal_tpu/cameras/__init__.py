from svo_pro_universal_tpu.cameras.projections import (  # noqa: F401
    Camera,
    DistortionModel,
    ProjectionModel,
    backproject,
    project,
    project_jacobian,
)
from svo_pro_universal_tpu.cameras.rig import CameraRig, load_rig_yaml  # noqa: F401

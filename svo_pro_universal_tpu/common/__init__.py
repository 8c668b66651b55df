from svo_pro_universal_tpu.common.types import FeatureType  # noqa: F401
from svo_pro_universal_tpu.common.frame import FrameState  # noqa: F401

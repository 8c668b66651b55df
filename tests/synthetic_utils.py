"""Test-side alias for the package's synthetic scene toolkit
(svo_pro_universal_tpu.testing.synthetic — the svo_test_utils analogue)."""

from svo_pro_universal_tpu.testing.synthetic import *  # noqa: F401,F403
from svo_pro_universal_tpu.testing.synthetic import (  # noqa: F401
    CAM, PLANE_Z, H, W)

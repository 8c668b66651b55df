"""Multi-camera rig + YAML (de)serialization.

Replaces the reference's NCamera/CameraBundle
(reference: src/vikit/vikit_cameras/include/vikit/cameras/ncamera.h:21,42 and
src/vikit/vikit_cameras/src/camera_yaml_serialization.cpp). Reads the same
rig-calibration YAML schema (cameras[].camera.{type,intrinsics,distortion},
cameras[].T_B_C, imu_params, imu_initialization).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
import yaml

from svo_pro_universal_tpu.cameras.projections import (
    Camera, DistortionModel, ProjectionModel)
from svo_pro_universal_tpu.utils.transform import SE3, matrix_to_quat

_DIST_NAMES = {
    "none": DistortionModel.NONE,
    "radial-tangential": DistortionModel.RADTAN,
    "radtan": DistortionModel.RADTAN,
    "equidistant": DistortionModel.EQUIDISTANT,
    "fisheye": DistortionModel.EQUIDISTANT,
    "atan": DistortionModel.ATAN,
    "fov": DistortionModel.ATAN,
}

_PROJ_NAMES = {
    "pinhole": ProjectionModel.PINHOLE,
    "fisheye": ProjectionModel.FISHEYE_EQUIDISTANT,
    "omni": ProjectionModel.OMNI,
}


@dataclass
class ImuParams:
    """IMU noise / rate parameters (reference: imu_calibration.h:14)."""
    delay_imu_cam: float = 0.0
    max_imu_delta_t: float = 0.01
    acc_max: float = 176.0
    omega_max: float = 17.0
    sigma_omega_c: float = 12e-4
    sigma_acc_c: float = 8e-3
    sigma_omega_bias_c: float = 0.03
    sigma_acc_bias_c: float = 0.1
    sigma_integration: float = 0.0
    g: float = 9.81
    imu_rate: float = 200.0


@dataclass
class ImuInitialization:
    """Initial state priors (reference: imu_calibration.h:85)."""
    velocity: tuple = (0.0, 0.0, 0.0)
    omega_bias: tuple = (0.0, 0.0, 0.0)
    acc_bias: tuple = (0.0, 0.0, 0.0)
    velocity_sigma: float = 2.0
    omega_bias_sigma: float = 0.01
    acc_bias_sigma: float = 0.1


@dataclass
class CameraRig:
    """Calibrated rig: cameras + body(IMU)-to-camera extrinsics."""
    cameras: list[Camera]
    T_body_cam: list[SE3]           # T_B_C per camera
    label: str = "rig"
    imu_params: Optional[ImuParams] = None
    imu_init: Optional[ImuInitialization] = None
    extras: dict = field(default_factory=dict)

    def __len__(self):
        return len(self.cameras)

    def T_cam_body(self, i: int) -> SE3:
        return self.T_body_cam[i].inverse()

    @property
    def stereo_baseline(self) -> float:
        """Metric distance between cam0 and cam1 (stereo rigs)."""
        if len(self.cameras) < 2:
            return 0.0
        d = self.T_body_cam[0].t - self.T_body_cam[1].t
        return float(np.linalg.norm(np.asarray(d)))


def _parse_camera(node: dict[str, Any], dtype) -> Camera:
    cam = node["camera"]
    proj = _PROJ_NAMES[str(cam["type"]).lower()]
    intr = np.asarray(cam["intrinsics"]["data"], dtype=np.float64)
    dist_node = cam.get("distortion")
    if dist_node is None:
        dist, dp = DistortionModel.NONE, [0.0]
    else:
        dist = _DIST_NAMES[str(dist_node["type"]).lower().strip()]
        dp = list(np.asarray(dist_node["parameters"]["data"], dtype=np.float64))
    return Camera(
        proj, dist,
        jnp.asarray(intr, dtype=dtype),
        jnp.asarray(dp, dtype=dtype),
        int(cam["image_width"]), int(cam["image_height"]),
        label=str(cam.get("label", "cam")),
    )


def load_rig_yaml(path: str, dtype=jnp.float32) -> CameraRig:
    """Load a rig calibration YAML in the reference's schema
    (reference: examples/param/calib/euroc_mono.yaml)."""
    with open(path) as f:
        doc = yaml.safe_load(f)
    return parse_rig(doc, dtype=dtype)


def parse_rig(doc: dict[str, Any], dtype=jnp.float32) -> CameraRig:
    cameras, extrinsics = [], []
    for node in doc["cameras"]:
        cameras.append(_parse_camera(node, dtype))
        T = np.asarray(node["T_B_C"]["data"], dtype=np.float64).reshape(4, 4)
        q = matrix_to_quat(jnp.asarray(T[:3, :3], dtype=dtype))
        extrinsics.append(SE3(q, jnp.asarray(T[:3, 3], dtype=dtype)))

    imu_params = None
    if "imu_params" in doc:
        known = {k for k in ImuParams.__dataclass_fields__}
        imu_params = ImuParams(**{k: v for k, v in doc["imu_params"].items()
                                  if k in known})
    imu_init = None
    if "imu_initialization" in doc:
        d = doc["imu_initialization"]
        imu_init = ImuInitialization(
            velocity=tuple(d.get("velocity", (0, 0, 0))),
            omega_bias=tuple(d.get("omega_bias", (0, 0, 0))),
            acc_bias=tuple(d.get("acc_bias", (0, 0, 0))),
            velocity_sigma=float(d.get("velocity_sigma", 2.0)),
            omega_bias_sigma=float(d.get("omega_bias_sigma", 0.01)),
            acc_bias_sigma=float(d.get("acc_bias_sigma", 0.1)),
        )
    return CameraRig(cameras, extrinsics, label=str(doc.get("label", "rig")),
                     imu_params=imu_params, imu_init=imu_init)

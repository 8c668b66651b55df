"""EuRoC MAV (ASL folder format) dataset loader.

Python equivalent of the reference's header-only EuRoC reader
(reference: examples/dataset/euroc.hpp:20-130 — cam CSV with nanosecond
stamps + image filenames, IMU CSV with gyro/acc rows, ground-truth state
CSV). Layout: <root>/mav0/{cam0,cam1}/data.csv + data/*.png,
imu0/data.csv, state_groundtruth_estimate0/data.csv.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np


@dataclass
class ImageSample:
    timestamp: float          # seconds
    path: str

    def load(self) -> np.ndarray:
        # native C++ decoder when available (native/png_decode.cc)
        if self.path.endswith(".png"):
            from svo_pro_universal_tpu import native_loader as nl
            if nl.native_available():
                out = nl.decode_png_gray8(open(self.path, "rb").read())
                if out is not None:
                    return out.astype(np.float32)
        from PIL import Image
        img = Image.open(self.path)
        arr = np.asarray(img)
        if arr.ndim == 3:
            arr = arr.mean(axis=-1)
        return arr.astype(np.float32)


@dataclass
class ImuSample:
    timestamp: float
    gyro: np.ndarray          # [3] rad/s
    acc: np.ndarray           # [3] m/s²


@dataclass
class GroundTruthSample:
    timestamp: float
    p: np.ndarray             # [3] position world
    q: np.ndarray             # [4] wxyz body→world


class EurocDataset:
    def __init__(self, root: str):
        self.root = root
        mav = os.path.join(root, "mav0")
        self.mav = mav if os.path.isdir(mav) else root

    def _read_csv(self, rel: str) -> list[list[str]]:
        path = os.path.join(self.mav, rel)
        with open(path) as f:
            rows = [r for r in csv.reader(f)
                    if r and not r[0].startswith("#")]
        return rows

    def images(self, cam: int = 0) -> list[ImageSample]:
        rows = self._read_csv(f"cam{cam}/data.csv")
        out = []
        for r in rows:
            ts = float(int(r[0])) * 1e-9
            out.append(ImageSample(ts, os.path.join(
                self.mav, f"cam{cam}", "data", r[1].strip())))
        return out

    def imu(self) -> list[ImuSample]:
        rows = self._read_csv("imu0/data.csv")
        return [ImuSample(float(int(r[0])) * 1e-9,
                          np.asarray([float(r[1]), float(r[2]), float(r[3])],
                                     np.float32),
                          np.asarray([float(r[4]), float(r[5]), float(r[6])],
                                     np.float32)) for r in rows]

    def ground_truth(self) -> list[GroundTruthSample]:
        rows = self._read_csv("state_groundtruth_estimate0/data.csv")
        out = []
        for r in rows:
            out.append(GroundTruthSample(
                float(int(r[0])) * 1e-9,
                np.asarray([float(x) for x in r[1:4]], np.float64),
                np.asarray([float(x) for x in r[4:8]], np.float64)))
        return out

    def synced_stream(self, use_cam1: bool = False,
                      t0: Optional[float] = None,
                      ) -> Iterator[tuple]:
        """Yields ('imu', ImuSample) and ('image', ImageSample[, ImageSample])
        events in timestamp order, the feed pattern of the reference's
        example mains (examples/euroc_mono_imu.cpp:41-65)."""
        imgs0 = self.images(0)
        imgs1 = self.images(1) if use_cam1 else []
        img1_by_ts = {round(s.timestamp, 6): s for s in imgs1}
        imu = self.imu()
        i = j = 0
        while j < len(imgs0):
            t_img = imgs0[j].timestamp
            while i < len(imu) and imu[i].timestamp <= t_img:
                if t0 is None or imu[i].timestamp >= t0:
                    yield ("imu", imu[i])
                i += 1
            if t0 is None or t_img >= t0:
                if use_cam1:
                    pair = img1_by_ts.get(round(t_img, 6))
                    if pair is not None:
                        yield ("image", imgs0[j], pair)
                else:
                    yield ("image", imgs0[j])
            j += 1

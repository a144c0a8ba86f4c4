"""Camera pose datasets (reference: src/training/views_dataset.py:88-260).

Pure-Python pose generators (no DataLoader machinery — poses are a handful of
floats consumed once at setup; the device never sees this code). Each dataset
yields dicts {dir, theta, phi, radius, base_theta} with theta/phi in radians,
matching the reference's collate output.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np

from contexture_nerf_tpu.ops.image import get_view_direction


def circle_pose(radius=1.25, theta=60.0, phi=0.0, angle_overhead=30.0,
                angle_front=60.0) -> Dict:
    """(reference circle_poses, views_dataset.py:75-85)"""
    theta_r = np.deg2rad(theta)
    phi_r = np.deg2rad(phi)
    dirs = get_view_direction(np.array([theta_r]), np.array([phi_r]),
                              np.deg2rad(angle_overhead),
                              np.deg2rad(angle_front))
    return {"dir": int(dirs[0]), "theta": float(theta_r),
            "phi": float(phi_r), "radius": float(radius)}


class Zero123PlusDataset:
    """Fixed 7 poses: front + the 6 Zero123++ target views
    (reference views_dataset.py:88-149). Azimuths are relative to front;
    elevations are the paper's absolute {30,30,30,-20,-20,-20} converted to
    polar theta = 90 - e."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.phis = [0] + [30, 150, 270, 90, 210, 330]
        thetas_abs = [30] + [30, 30, 30, -20, -20, -20]
        self.thetas = [90 - t for t in thetas_abs]
        self.size = len(self.phis)

    def __len__(self) -> int:
        return self.size

    def poses(self) -> List[Dict]:
        out = []
        for theta, phi in zip(self.thetas, self.phis):
            d = circle_pose(radius=self.cfg.radius, theta=theta, phi=phi,
                            angle_overhead=self.cfg.overhead_range,
                            angle_front=self.cfg.front_range)
            d["base_theta"] = math.radians(self.cfg.base_theta)
            out.append(d)
        return out

    def __iter__(self):
        return iter(self.poses())


class MultiviewDataset:
    """n_views ring at base_theta with alternate ordering + views_after
    (reference views_dataset.py:151-218)."""

    def __init__(self, cfg):
        self.cfg = cfg
        size = cfg.n_views
        self.phis = [(i / size) * 360 for i in range(size)]
        self.thetas = [cfg.base_theta for _ in range(size)]

        def alternate(l):
            return ([l[0]]
                    + [x for pair in zip(l[1:size // 2], l[-1:size // 2:-1])
                       for x in pair]
                    + [l[size // 2]])

        if cfg.alternate_views:
            self.phis = alternate(self.phis)
            self.thetas = alternate(self.thetas)
        for phi, theta in cfg.views_before:
            self.phis = [phi] + self.phis
            self.thetas = [theta] + self.thetas
        for phi, theta in cfg.views_after:
            self.phis = self.phis + [phi]
            self.thetas = self.thetas + [theta]
        self.size = len(self.phis)

    def __len__(self) -> int:
        return self.size

    def poses(self) -> List[Dict]:
        out = []
        for theta, phi in zip(self.thetas, self.phis):
            d = circle_pose(radius=self.cfg.radius, theta=theta, phi=phi,
                            angle_overhead=self.cfg.overhead_range,
                            angle_front=self.cfg.front_range)
            d["base_theta"] = math.radians(self.cfg.base_theta)
            out.append(d)
        return out

    def __iter__(self):
        return iter(self.poses())


class ViewsDataset:
    """Uniform turntable for eval (reference views_dataset.py:221-260);
    radius is cfg.radius * 1.2, theta = base_theta."""

    def __init__(self, cfg, size: int = 100):
        self.cfg = cfg
        self.size = size

    def __len__(self) -> int:
        return self.size

    def poses(self) -> List[Dict]:
        out = []
        for i in range(self.size):
            phi = (i / self.size) * 360
            d = circle_pose(radius=self.cfg.radius * 1.2,
                            theta=self.cfg.base_theta, phi=phi,
                            angle_overhead=self.cfg.overhead_range,
                            angle_front=self.cfg.front_range)
            d["base_theta"] = math.radians(self.cfg.base_theta)
            out.append(d)
        return out

    def __iter__(self):
        return iter(self.poses())

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


def rand_poses(size: int, rng: np.random.Generator,
               radius_range=(1.0, 1.5), phi_range=(0.0, 360.0),
               angle_overhead=30.0, angle_front=60.0,
               biased_angles=True) -> Dict:
    """Random pose with the reference's top-biased theta sampling
    (views_dataset.py:13-45). Returns one pose dict (size kept for parity)."""
    angle_overhead_r = np.deg2rad(angle_overhead)
    angle_front_r = np.deg2rad(angle_front)
    radius = rng.uniform(radius_range[0], radius_range[1], size)
    phi_r = np.deg2rad(rng.uniform(phi_range[0], phi_range[1], size))
    if biased_angles:
        top_flag = rng.random() > 0.3  # 70%: camera above the equator
        x = (1 - rng.random(size)) if top_flag else (-rng.random(size))
        thetas = np.arccos(x)
    else:
        thetas = np.deg2rad(rng.uniform(0.0, 180.0, size))
    dirs = get_view_direction(thetas, phi_r, angle_overhead_r, angle_front_r)
    return {"dir": int(dirs[0]), "theta": float(thetas[0]),
            "phi": float(phi_r[0]), "radius": float(radius[0])}


def rand_modal_poses(size: int, rng: np.random.Generator,
                     radius_range=(1.4, 1.6), theta_range=(45.0, 90.0),
                     phi_range=(0.0, 360.0), angle_overhead=30.0,
                     theta_range_overhead=(0.0, 20.0),
                     angle_front=60.0) -> Dict:
    """Random pose snapped near the four cardinal azimuths with a 15%
    overhead mode (reference views_dataset.py:48-72)."""
    angle_overhead_r = np.deg2rad(angle_overhead)
    angle_front_r = np.deg2rad(angle_front)
    radius = rng.uniform(radius_range[0], radius_range[1], size)
    if rng.random() > 0.85:
        phis = np.deg2rad(rng.uniform(phi_range[0], phi_range[1], size))
        thetas = np.deg2rad(rng.uniform(theta_range_overhead[0],
                                        theta_range_overhead[1], size))
    else:
        mods = np.deg2rad([0, 90, 180, 270])
        perturb = np.deg2rad(15) * rng.random(size)
        phis = perturb + mods[rng.integers(0, 4, size)]
        thetas = np.deg2rad(rng.uniform(theta_range[0], theta_range[1], size))
    dirs = get_view_direction(thetas, phis, angle_overhead_r, angle_front_r)
    return {"dir": int(dirs[0]), "theta": float(thetas[0]),
            "phi": float(phis[0]), "radius": float(radius[0])}


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
    radius is cfg.radius * 1.2, theta = base_theta. random_views=True samples
    rand_poses instead (reference :233-234)."""

    def __init__(self, cfg, size: int = 100, random_views: bool = False,
                 seed: int = 0):
        self.cfg = cfg
        self.size = size
        self.random_views = random_views
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.size

    def poses(self) -> List[Dict]:
        out = []
        for i in range(self.size):
            if self.random_views:
                d = rand_poses(1, self._rng)
            else:
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

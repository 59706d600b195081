"""System: the public API facade.

TPU-native replacement for the reference's ORB_SLAM3::System
(/root/reference/src/System.cc, include/System.h): one object that owns the
tracker, vocabulary, keyframe database and loop closer, exposes
track_monocular / track_stereo / track_rgbd (+ inertial variants with IMU
batches), mode toggles, reset, trajectory saving in TUM/EuRoC/KITTI formats,
and atlas save/load with a vocabulary checksum. The reference's three
threads + detached GBA (System.cc:200-240) are jitted programs dispatched
from one host loop here — jax dispatch is already asynchronous.
"""
from __future__ import annotations

import enum
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import cameras, imu as imu_mod, lie
from .io import config as config_mod, serialization, trajectory
from .pipeline import tracking


class Sensor(enum.Enum):
    MONOCULAR = "monocular"
    STEREO = "stereo"
    RGBD = "rgbd"
    IMU_MONOCULAR = "imu-monocular"
    IMU_STEREO = "imu-stereo"
    IMU_RGBD = "imu-rgbd"

    @property
    def inertial(self):
        return self.name.startswith("IMU")

    @property
    def stereo(self):
        return "STEREO" in self.name

    @property
    def rgbd(self):
        return "RGBD" in self.name


class System:
    """Facade mirroring reference System::System(voc, settings, sensor)
    (System.cc:49): construct from a Settings object (or YAML path), feed
    frames, read back trajectories and maps."""

    def __init__(self, settings, sensor: Sensor,
                 vocabulary=None, vocabulary_path: Optional[str] = None,
                 tracker_overrides: Optional[dict] = None):
        if isinstance(settings, str):
            settings = config_mod.load_settings(settings)
        self.settings = settings
        self.sensor = sensor
        if vocabulary is None and vocabulary_path:
            vocabulary = serialization.load_vocabulary(vocabulary_path)
        self.voc = vocabulary

        cam = settings.cam1.to_camera()
        width = settings.cam1.width or 752
        height = settings.cam1.height or 480
        focal = settings.cam1.fx
        baseline = settings.baseline if (sensor.stereo or sensor.rgbd) \
            else 0.0

        # stereo rectification (reference Settings::precomputeRectification-
        # Maps + the cv::remap preamble of System::TrackStereo): raw
        # unrectified stereo (distorted pinhole or KB8 fisheye) is remapped
        # once per frame into an ideal rectified pinhole pair
        self.rectify = None
        if (sensor.stereo and settings.cam2 is not None
                and settings.T_c1_c2 is not None
                and settings.cam1.model != "Rectified"):
            from .ops import rectify as rectify_mod
            cam2 = settings.cam2.to_camera()
            self.rectify = rectify_mod.build_rectify_maps(
                cam, cam2, settings.T_c1_c2, width, height)
            cam = self.rectify.cam_new
            focal = float(cam.params[0])
            baseline = float(self.rectify.baseline)

        calib = None
        if sensor.inertial:
            if settings.imu is None:
                raise ValueError("inertial sensor needs IMU settings")
            i = settings.imu
            R_bc = np.eye(3)
            t_bc = np.zeros(3)
            if i.T_b_c1 is not None:
                R_bc = i.T_b_c1[:3, :3]
                t_bc = i.T_b_c1[:3, 3]
            if self.rectify is not None:
                # rectification rotates the camera-1 frame by R_rect1:
                # camera_rect -> body = (camera1 -> body) o (rect -> cam1)
                R_bc = R_bc @ np.asarray(self.rectify.R_rect1).T
            calib = imu_mod.make_calib(R_bc, t_bc, i.noise_gyro, i.noise_acc,
                                       i.walk_gyro, i.walk_acc, i.frequency)
        kw = dict(
            width=width,
            height=height,
            focal=focal,
            n_feat=settings.n_features,
            scale=settings.scale_factor,
            n_levels=settings.n_levels,
            baseline=baseline,
            th_depth=settings.th_depth,
            th_far_points=settings.th_far_points,
        )
        if tracker_overrides:
            kw.update(tracker_overrides)
        cfg = tracking.TrackerConfig(**kw)
        self.tracker = tracking.Tracker(cam, cfg, voc=self.voc,
                                        imu_calib=calib)
        if not settings.loop_closing and \
                self.tracker.loop_closer is not None:
            # loopClosing YAML flag (reference System.cc:116-120)
            self.tracker.loop_closer = None
        self.localization_only = False

        if settings.load_atlas:
            self.load_atlas(settings.load_atlas)

    # ---- frame feeds (reference System::Track*, System.cc:242-461) -------

    def track_monocular(self, img, ts: float, imu_batch=None):
        if self.sensor.inertial and imu_batch is not None:
            ts_i, acc, gyro = imu_batch
            return self.tracker.track_mono_inertial(img, ts, acc, gyro, ts_i)
        return self.tracker.track_mono(img, ts)

    def track_stereo(self, img_l, img_r, ts: float, imu_batch=None):
        if self.rectify is not None:
            from .ops import rectify as rectify_mod
            img_l = rectify_mod.remap_bilinear(
                jnp.asarray(img_l, jnp.float32), self.rectify.map1)
            img_r = rectify_mod.remap_bilinear(
                jnp.asarray(img_r, jnp.float32), self.rectify.map2)
        if self.sensor.inertial and imu_batch is not None:
            ts_i, acc, gyro = imu_batch
            return self.tracker.track_stereo_inertial(img_l, img_r, ts, acc,
                                                      gyro, ts_i)
        return self.tracker.track_stereo(img_l, img_r, ts)

    def track_rgbd(self, img, depth, ts: float, imu_batch=None):
        if self.sensor.inertial and imu_batch is not None:
            ts_i, acc, gyro = imu_batch
            return self.tracker.track_rgbd_inertial(img, depth, ts, acc,
                                                    gyro, ts_i)
        return self.tracker.track_rgbd(img, depth, ts)

    # ---- modes / control (System.cc:462-531) -----------------------------

    def activate_localization_mode(self):
        """Reference ActivateLocalizationMode: stop mapping, track only."""
        self.localization_only = True
        self.tracker._mapping_enabled = False

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker._mapping_enabled = True

    def reset(self):
        """Reference System::Reset — fresh map, keep vocabulary."""
        cfg = self.tracker.cfg
        self.tracker = tracking.Tracker(self.tracker.cam, cfg, voc=self.voc,
                                        imu_calib=self.tracker.calib)

    @property
    def state(self):
        return self.tracker.state

    # ---- output ----------------------------------------------------------

    def _frame_poses(self):
        self.tracker.flush()
        out = []
        for ts, gen, ref, R_cr, t_cr in self.tracker.trajectory:
            resolved = self.tracker.resolve_ref_pose(gen, ref)
            if resolved is None:
                continue
            Rr, tr = resolved
            R_cw, t_cw = lie.se3_mul(R_cr, t_cr, Rr, tr)
            out.append((ts, R_cw, t_cw))
        return out

    def _keyframe_poses(self):
        m = self.tracker.m
        n = int(m.n_kf)
        valid = np.asarray(m.kf_valid)[:n]
        ts = np.asarray(m.kf_ts)[:n]
        out = []
        for k in range(n):
            if valid[k]:
                out.append((float(ts[k]), m.kf_R[k], m.kf_t[k]))
        return out

    def save_trajectory_tum(self, path):
        trajectory.write_tum(path, self._frame_poses())

    def save_trajectory_euroc(self, path):
        trajectory.write_euroc(path, self._frame_poses())

    def save_trajectory_kitti(self, path):
        trajectory.write_kitti(path, self._frame_poses())

    def save_keyframe_trajectory_tum(self, path):
        trajectory.write_tum(path, self._keyframe_poses())

    def save_sub_trajectory(self, path, t_start: float, t_end: float,
                            fmt: str = "tum"):
        """Trajectory restricted to [t_start, t_end] (reference
        Tracking::SaveSubTrajectory debug dumps, Tracking.h:102-105)."""
        poses = [p for p in self._frame_poses()
                 if t_start <= p[0] <= t_end]
        writer = {"tum": trajectory.write_tum,
                  "euroc": trajectory.write_euroc,
                  "kitti": trajectory.write_kitti}[fmt]
        writer(path, poses)

    def save_atlas(self, path):
        """Whole-Atlas checkpoint: active map + stashed maps + inertial
        chain + trajectory (reference System::SaveAtlas, System.cc:1384)."""
        serialization.save_atlas(path, self.tracker,
                                 meta={"sensor": self.sensor.value},
                                 voc=self.voc)

    def load_atlas(self, path):
        try:
            serialization.load_atlas(path, self.tracker, voc=self.voc)
            return
        except ValueError:
            # legacy single-map checkpoint
            self.tracker.m = serialization.load_map(path, voc=self.voc)
            self.tracker.n_kf_host = int(self.tracker.m.n_kf)
        m = self.tracker.m
        n = self.tracker.n_kf_host
        # rebuild the place-recognition database (BoW is derived state)
        if self.voc is not None and self.tracker.db is not None:
            from .vocab import database as kfdb, tree as voctree
            valid = np.asarray(m.kf_valid)
            for k in range(min(n, len(valid))):
                if not valid[k]:
                    continue
                bow = voctree.bow_vector(self.voc, voctree.transform(
                    self.voc, m.kf_feat_desc[k], m.kf_feat_valid[k]))
                self.tracker.db = kfdb.add_keyframe(self.tracker.db, k, bow)
        if n > 0:
            self.tracker.state = "RECENTLY_LOST"  # relocalize into the map

    def map_point_cloud(self):
        """(N, 3) world points of the current map (headless observability —
        replaces the Pangolin MapDrawer)."""
        m = self.tracker.m
        return np.asarray(m.lm_pos)[np.asarray(m.lm_valid)]

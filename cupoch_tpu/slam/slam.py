"""RGB-D SLAM pipeline with partitioned backend.

New scope (BASELINE.json config #5): frontend = dense RGB-D odometry
tracking + keyframe selection; backend = pose graph over keyframes,
optimized with edges sharded across a device mesh
(pose_graph.global_optimization); map = TSDF volume re-integrated from
optimized keyframe poses; state checkpoints via slam.checkpoint so a
multi-host run can resume.

The reference stops at per-pair odometry/ICP (SURVEY.md §2.13); this
composes those reference-parity frontends into the distributed backend
the north star mandates.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..camera import PinholeCameraIntrinsic
from ..geometry import RGBDImage
from ..odometry import (
    OdometryOption,
    RGBDOdometryJacobianFromHybridTerm,
    compute_rgbd_odometry,
)
from ..utility import console
from . import checkpoint as ckpt
from .pose_graph import (
    GlobalOptimizationOption,
    PoseGraph,
    PoseGraphEdge,
    PoseGraphNode,
    global_optimization,
)


class SlamOption:
    def __init__(self,
                 keyframe_interval: int = 5,
                 keyframe_angle_deg: float = 10.0,
                 keyframe_translation: float = 0.15,
                 loop_closure_interval: int = 0,
                 loop_closure_radius: float = 0.5,
                 loop_closure_min_gap: int = 3,
                 odometry_option: Optional[OdometryOption] = None,
                 optimize_every_n_keyframes: int = 8):
        self.keyframe_interval = int(keyframe_interval)
        self.keyframe_angle_deg = float(keyframe_angle_deg)
        self.keyframe_translation = float(keyframe_translation)
        # every Nth keyframe attempts a loop closure (0 = off)
        self.loop_closure_interval = int(loop_closure_interval)
        # candidate keyframes must sit within this translation radius
        self.loop_closure_radius = float(loop_closure_radius)
        # ... and be at least this many keyframes older (skip the
        # sequential neighbors the odometry chain already covers)
        self.loop_closure_min_gap = int(loop_closure_min_gap)
        self.odometry_option = odometry_option or OdometryOption()
        self.optimize_every_n_keyframes = int(optimize_every_n_keyframes)


class RGBDSlam:
    """Sequential RGB-D SLAM: track -> keyframe -> optimize."""

    def __init__(self, intrinsic: PinholeCameraIntrinsic,
                 option: Optional[SlamOption] = None, mesh=None):
        self.intrinsic = intrinsic
        self.option = option or SlamOption()
        self.mesh = mesh  # device mesh for the sharded backend
        self.pose_graph = PoseGraph()
        self.trajectory: List[np.ndarray] = []   # every frame pose
        self.cur_pose = np.eye(4, dtype=np.float32)
        self.prev_frame: Optional[RGBDImage] = None
        self.last_keyframe_pose = np.eye(4, dtype=np.float32)
        self.last_keyframe_frame: Optional[RGBDImage] = None
        # (kf_id, pose-at-insertion, frame) for loop-closure candidates
        self._keyframes: List[tuple] = []
        self.frame_id = 0
        self._since_opt = 0

    # -- frontend ------------------------------------------------------
    def process_frame(self, rgbd: RGBDImage) -> bool:
        """Track against the previous frame; maybe spawn a keyframe."""
        if self.prev_frame is None:
            if self.frame_id == 0:  # very first frame (not a resume)
                self.pose_graph.nodes.append(PoseGraphNode(self.cur_pose))
                self.trajectory.append(self.cur_pose.copy())
            self.prev_frame = rgbd
            self.last_keyframe_frame = rgbd
            if self.frame_id == 0:
                self._keyframes.append((0, self.cur_pose.copy(), rgbd))
            self.frame_id += 1
            return True
        ok, motion, info = compute_rgbd_odometry(
            rgbd, self.prev_frame, self.intrinsic,
            jacobian=RGBDOdometryJacobianFromHybridTerm(),
            option=self.option.odometry_option)
        if not ok:
            console.log_warning("[RGBDSlam] odometry failed at frame %d",
                                self.frame_id)
            motion = np.eye(4, dtype=np.float32)
            info = np.eye(6, dtype=np.float32)
        # motion maps source (current) into target (previous) frame
        self.cur_pose = (self.cur_pose @ motion).astype(np.float32)
        self.trajectory.append(self.cur_pose.copy())
        self.prev_frame = rgbd
        if self._is_keyframe():
            self._insert_keyframe(rgbd, info)
        self.frame_id += 1
        return ok

    def _is_keyframe(self) -> bool:
        if self.frame_id % self.option.keyframe_interval == 0:
            return True
        rel = np.linalg.inv(self.last_keyframe_pose) @ self.cur_pose
        t = np.linalg.norm(rel[:3, 3])
        ang = np.degrees(np.arccos(
            np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1)))
        return (t > self.option.keyframe_translation
                or ang > self.option.keyframe_angle_deg)

    def _insert_keyframe(self, rgbd: RGBDImage, info: np.ndarray):
        prev_kf_pose = self.last_keyframe_pose
        kf_id = len(self.pose_graph.nodes)
        self.pose_graph.nodes.append(PoseGraphNode(self.cur_pose))
        rel = (np.linalg.inv(prev_kf_pose) @ self.cur_pose).astype(
            np.float32)
        self.pose_graph.edges.append(PoseGraphEdge(
            kf_id - 1, kf_id, rel, info, uncertain=False))
        self._keyframes.append((kf_id, self.cur_pose.copy(), rgbd))
        if (self.option.loop_closure_interval
                and kf_id % self.option.loop_closure_interval == 0):
            self._try_loop_closure(kf_id, rgbd)
        self.last_keyframe_pose = self.cur_pose.copy()
        self.last_keyframe_frame = rgbd
        self._since_opt += 1
        if self._since_opt >= self.option.optimize_every_n_keyframes:
            self.optimize()

    def _try_loop_closure(self, kf_id: int, rgbd: RGBDImage) -> bool:
        """Place recognition by pose proximity: pick the nearest OLD
        keyframe (≥ min_gap back) within `loop_closure_radius` of the
        current estimate, register the frames with RGB-D odometry
        seeded by the current relative estimate, and insert an
        `uncertain` edge between the TRUE endpoints so the pose graph
        can correct accumulated drift (new scope, BASELINE config #5;
        the reference has no SLAM backend)."""
        gap = self.option.loop_closure_min_gap
        cand = None
        best_d = self.option.loop_closure_radius
        for cid, cpose, cframe in self._keyframes:
            if cid >= kf_id - gap or cframe is None:
                continue
            d = float(np.linalg.norm(cpose[:3, 3] - self.cur_pose[:3, 3]))
            if d <= best_d:
                best_d = d
                cand = (cid, cpose, cframe)
        if cand is None:
            return False
        cid, cpose, cframe = cand
        # current -> candidate motion, seeded with the drifted estimate
        init = np.linalg.inv(cpose) @ self.cur_pose
        ok, motion, lc_info = compute_rgbd_odometry(
            rgbd, cframe, self.intrinsic, odo_init=init,
            option=self.option.odometry_option)
        if not ok:
            return False
        self.pose_graph.edges.append(PoseGraphEdge(
            cid, kf_id, np.asarray(motion, np.float32), lc_info,
            uncertain=True))
        console.log_debug("[RGBDSlam] loop closure %d -> %d (d=%.3f)",
                          cid, kf_id, best_d)
        return True

    # -- backend -------------------------------------------------------
    def optimize(self):
        """Runs (mesh-sharded) pose graph optimization and re-anchors
        the live pose to the corrected last keyframe."""
        if len(self.pose_graph.edges) == 0:
            return
        before = self.pose_graph.nodes[-1].pose.copy()
        global_optimization(self.pose_graph,
                            GlobalOptimizationOption(max_iteration=10),
                            mesh=self.mesh)
        after = self.pose_graph.nodes[-1].pose
        correction = (after @ np.linalg.inv(before)).astype(np.float32)
        self.cur_pose = (correction @ self.cur_pose).astype(np.float32)
        self.last_keyframe_pose = (
            correction @ self.last_keyframe_pose).astype(np.float32)
        # refresh candidate poses so loop-closure proximity checks use
        # the corrected trajectory
        self._keyframes = [
            (cid, self.pose_graph.nodes[cid].pose.copy(), f)
            for (cid, _, f) in self._keyframes]
        self._since_opt = 0

    # -- persistence ---------------------------------------------------
    def save(self, path: str) -> bool:
        state = {
            "trajectory": np.stack(self.trajectory)
            if self.trajectory else np.zeros((0, 4, 4), np.float32),
            "keyframe_poses": np.stack(
                [n.pose for n in self.pose_graph.nodes])
            if self.pose_graph.nodes else np.zeros((0, 4, 4), np.float32),
            "edge_src": np.asarray(
                [e.source_node_id for e in self.pose_graph.edges],
                np.int32),
            "edge_tgt": np.asarray(
                [e.target_node_id for e in self.pose_graph.edges],
                np.int32),
            "edge_transform": np.stack(
                [e.transformation for e in self.pose_graph.edges])
            if self.pose_graph.edges else np.zeros((0, 4, 4), np.float32),
            "edge_information": np.stack(
                [e.information for e in self.pose_graph.edges])
            if self.pose_graph.edges else np.zeros((0, 6, 6), np.float32),
            "edge_uncertain": np.asarray(
                [e.uncertain for e in self.pose_graph.edges], bool),
            "cur_pose": self.cur_pose,
            "last_keyframe_pose": self.last_keyframe_pose,
        }
        meta = {"frame_id": self.frame_id, "since_opt": self._since_opt}
        return ckpt.save_checkpoint(path, state, meta)

    def restore(self, path: str) -> bool:
        state, meta = ckpt.load_checkpoint(path)
        self.trajectory = list(state["trajectory"])
        self.pose_graph = PoseGraph()
        for pose in state["keyframe_poses"]:
            self.pose_graph.nodes.append(PoseGraphNode(pose))
        for s, t, z, inf, unc in zip(
                state["edge_src"], state["edge_tgt"],
                state["edge_transform"], state["edge_information"],
                state["edge_uncertain"]):
            self.pose_graph.edges.append(
                PoseGraphEdge(int(s), int(t), z, inf, bool(unc)))
        self.cur_pose = state["cur_pose"]
        self.last_keyframe_pose = state["last_keyframe_pose"]
        if meta:
            self.frame_id = int(meta.get("frame_id", 0))
            self._since_opt = int(meta.get("since_opt", 0))
        # the previous RGBD frame is not persisted; tracking restarts
        # from the next frame (prev_frame=None re-anchors, no new node)
        self.prev_frame = None
        self.last_keyframe_frame = None
        return True

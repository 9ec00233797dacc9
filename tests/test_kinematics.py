"""URDF forward-kinematics tests (reference:
kinematics/kinematic_chain.cpp + examples/testdata/tello.urdf)."""
import os

import numpy as np
import pytest

from cupoch_tpu.kinematics import JointType, KinematicChain

TELLO = "/root/reference/examples/testdata/tello.urdf"

URDF = """<robot name="two_link">
  <link name="base"/>
  <link name="arm">
    <collision>
      <geometry><box size="0.1 0.1 0.5"/></geometry>
    </collision>
  </link>
  <link name="tip">
    <visual>
      <geometry><sphere radius="0.05"/></geometry>
    </visual>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="base"/>
    <child link="arm"/>
    <origin xyz="0 0 1"/>
    <axis xyz="0 0 1"/>
  </joint>
  <joint name="wrist" type="prismatic">
    <parent link="arm"/>
    <child link="tip"/>
    <origin xyz="1 0 0"/>
    <axis xyz="1 0 0"/>
  </joint>
</robot>
"""


@pytest.fixture
def urdf_path(tmp_path):
    p = tmp_path / "two_link.urdf"
    p.write_text(URDF)
    return str(p)


def test_build_from_urdf(urdf_path):
    kc = KinematicChain(urdf_path)
    assert kc.root.link.name == "base"
    assert len(kc.root.children) == 1
    arm = kc.root.children[0]
    assert arm.joint.name == "shoulder"
    assert arm.joint.type == JointType.Revolute
    assert len(arm.link.collisions) == 1
    tip = arm.children[0]
    assert tip.joint.type == JointType.Prismatic
    assert len(tip.link.visuals) == 1


def test_fk_zero_pose(urdf_path):
    kc = KinematicChain(urdf_path)
    pos = kc.forward_kinematics()
    np.testing.assert_allclose(pos["base"], np.eye(4))
    np.testing.assert_allclose(pos["arm"][:3, 3], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(pos["tip"][:3, 3], [1, 0, 1], atol=1e-6)


def test_fk_joint_values(urdf_path):
    kc = KinematicChain(urdf_path)
    pos = kc.forward_kinematics({"shoulder": np.pi / 2, "wrist": 0.5})
    # arm rotated 90deg about z; tip offset (1 + 0.5) along rotated x -> +y
    np.testing.assert_allclose(pos["tip"][:3, 3], [0, 1.5, 1], atol=1e-5)


def test_fk_with_base_transform(urdf_path):
    kc = KinematicChain(urdf_path)
    base = np.eye(4, dtype=np.float32)
    base[:3, 3] = [10, 0, 0]
    pos = kc.forward_kinematics({}, base)
    np.testing.assert_allclose(pos["tip"][:3, 3], [11, 0, 1], atol=1e-5)


def test_visual_geometry_map(urdf_path):
    kc = KinematicChain(urdf_path)
    pos = kc.forward_kinematics()
    gm = kc.get_transformed_visual_geometry_map(pos)
    assert "tip" in gm
    center = gm["tip"][0].get_center()
    np.testing.assert_allclose(center, [1, 0, 1], atol=0.01)


@pytest.mark.skipif(not os.path.exists(TELLO), reason="no reference testdata")
def test_tello_urdf():
    kc = KinematicChain(TELLO)
    pos = kc.forward_kinematics()
    assert len(pos) >= 2
    for T in pos.values():
        assert np.isfinite(T).all()

"""Extract the Franka-Ridgeback model spec from a URDF into compact JSON.

Reads a URDF (default: the reference's robot model, itself generated from
ethz-asl mppi_manipulation xacro sources — see reference
scripts/linux/build_robot_model.bash) and reduces it to the data the
TPU kinematics/dynamics layer needs:

- the 12 actuated joints in reference DoF order (dof.hpp:36-70): base x/y
  prismatic, pivot revolute, panda 1-7 revolute, two prismatic fingers;
- per moving link: composite rigid-body inertia (mass, COM, inertia about
  COM) with all fixed-attached descendant links merged in;
- named frames (the reference's Frame enum, frankaridgeback/dynamics.cpp:7-40)
  and link frames (Link enum, dynamics.cpp:42-56) as {parent moving link,
  fixed transform} pairs.

The output is data (physical constants of the robot), not code; the runtime
loader is assistedmanipulation_tpu/models/model_data.py.

Usage: python scripts/extract_model.py [urdf_path] [output_json]
"""

from __future__ import annotations

import json
import math
import sys
import xml.etree.ElementTree as ET

import numpy as np

MOVING_JOINTS = [
    "x_base_joint",
    "y_base_joint",
    "pivot_joint",
    "panda_joint1",
    "panda_joint2",
    "panda_joint3",
    "panda_joint4",
    "panda_joint5",
    "panda_joint6",
    "panda_joint7",
    "panda_finger_joint1",
    "panda_finger_joint2",
]

FRAME_NAMES = [
    "world_joint", "x_base_joint", "y_base_joint", "pivot_joint",
    "panda_joint1", "omni_base_flange", "base_link_joint", "mid_mount_joint",
    "right_side_cover_link_joint", "left_side_cover_link_joint",
    "front_cover_link_joint", "rear_cover_link_joint",
    "front_lights_link_joint", "rear_lights_link_joint", "top_link_joint",
    "axle_joint", "imu_joint", "ridgeback_sensor_mount_joint",
    "reference_link_joint", "arm_mount_joint", "panda_joint_franka_mount_link",
    "panda_joint2", "panda_joint3", "panda_joint4", "panda_joint5",
    "panda_joint6", "panda_joint7", "panda_finger_joint1",
    "panda_finger_joint2", "panda_joint8", "panda_hand_joint",
    "panda_grasp_joint",
]

LINK_NAMES = [
    "omni_base_root_link", "x_slider", "y_slider", "pivot",
    "panda_link1", "panda_link2", "panda_link3", "panda_link4",
    "panda_link5", "panda_link6", "panda_link7",
    "panda_leftfinger", "panda_rightfinger",
]


def rpy_to_matrix(rpy):
    r, p, y = rpy
    cr, sr = math.cos(r), math.sin(r)
    cp, sp = math.cos(p), math.sin(p)
    cy, sy = math.cos(y), math.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def parse_origin(element):
    origin = element.find("origin")
    xyz = np.zeros(3)
    rpy = np.zeros(3)
    if origin is not None:
        if origin.get("xyz"):
            xyz = np.array([float(v) for v in origin.get("xyz").split()])
        if origin.get("rpy"):
            rpy = np.array([float(v) for v in origin.get("rpy").split()])
    return rpy_to_matrix(rpy), xyz


def compose(t1, t2):
    """(R1,p1) * (R2,p2)"""
    R1, p1 = t1
    R2, p2 = t2
    return R1 @ R2, R1 @ p2 + p1


def main(urdf_path, output_path):
    tree = ET.parse(urdf_path)
    robot = tree.getroot()

    joints = {}
    for joint in robot.findall("joint"):
        name = joint.get("name")
        parent = joint.find("parent").get("link")
        child = joint.find("child").get("link")
        axis_el = joint.find("axis")
        axis = (
            np.array([float(v) for v in axis_el.get("xyz").split()])
            if axis_el is not None
            else np.array([0.0, 0.0, 0.0])
        )
        limit_el = joint.find("limit")
        limit = None
        if limit_el is not None:
            limit = {
                "lower": float(limit_el.get("lower", "nan")),
                "upper": float(limit_el.get("upper", "nan")),
                "effort": float(limit_el.get("effort", "nan")),
                "velocity": float(limit_el.get("velocity", "nan")),
            }
        # <dynamics damping friction>: RaiSim applies these as viscous joint
        # damping and Coulomb dry joint friction in its solver (the base
        # x/y/pivot joints carry friction=10 in robot.urdf:41-75).
        dynamics_el = joint.find("dynamics")
        damping = float(dynamics_el.get("damping", "0")) if dynamics_el is not None else 0.0
        friction = float(dynamics_el.get("friction", "0")) if dynamics_el is not None else 0.0
        joints[name] = {
            "type": joint.get("type"),
            "parent": parent,
            "child": child,
            "axis": axis,
            "transform": parse_origin(joint),
            "limit": limit,
            "damping": damping,
            "friction": friction,
        }

    inertials = {}
    for link in robot.findall("link"):
        name = link.get("name")
        inertial = link.find("inertial")
        if inertial is None:
            continue
        mass = float(inertial.find("mass").get("value"))
        if mass == 0.0:
            continue
        R, p = parse_origin(inertial)
        inertia_el = inertial.find("inertia")
        I = np.array(
            [
                [float(inertia_el.get("ixx")), float(inertia_el.get("ixy")), float(inertia_el.get("ixz"))],
                [float(inertia_el.get("ixy")), float(inertia_el.get("iyy")), float(inertia_el.get("iyz"))],
                [float(inertia_el.get("ixz")), float(inertia_el.get("iyz")), float(inertia_el.get("izz"))],
            ]
        )
        inertials[name] = {"mass": mass, "com": p, "inertia": R @ I @ R.T}

    # Map each link to (supporting moving link, fixed transform from the
    # moving link's frame to this link's frame). The moving link's own frame
    # coincides with its parent joint frame after joint motion.
    child_to_joint = {j["child"]: (name, j) for name, j in joints.items()}
    moving_children = {joints[name]["child"]: i for i, name in enumerate(MOVING_JOINTS)}

    def support(link_name):
        """Return (moving_link_index or -1 for world, (R, p) fixed transform)."""
        transform = (np.eye(3), np.zeros(3))
        current = link_name
        while True:
            if current in moving_children:
                return moving_children[current], transform
            if current not in child_to_joint:
                return -1, transform  # reached the world root
            joint_name, joint = child_to_joint[current]
            if joint_name in MOVING_JOINTS:
                raise AssertionError("moving joint should have been caught")
            transform = compose(joint["transform"], transform)
            current = joint["parent"]

    # Composite inertia per moving link (fixed descendants merged).
    composite = [
        {"mass": 0.0, "moment": np.zeros(3), "inertia_origin": np.zeros((3, 3))}
        for _ in MOVING_JOINTS
    ]
    for link_name, inertial in inertials.items():
        idx, (R, p) = support(link_name)
        if idx < 0:
            continue  # world-fixed mass is irrelevant to the dynamics
        mass = inertial["mass"]
        com = R @ inertial["com"] + p
        # inertia about the composite frame origin (parallel axis).
        I_com = R @ inertial["inertia"] @ R.T
        c = com
        shift = mass * (np.dot(c, c) * np.eye(3) - np.outer(c, c))
        composite[idx]["mass"] += mass
        composite[idx]["moment"] += mass * com
        composite[idx]["inertia_origin"] += I_com + shift

    links_out = []
    for i, joint_name in enumerate(MOVING_JOINTS):
        body = composite[i]
        mass = body["mass"]
        com = body["moment"] / mass if mass > 0 else np.zeros(3)
        c = com
        I_com = body["inertia_origin"] - mass * (
            np.dot(c, c) * np.eye(3) - np.outer(c, c)
        )
        links_out.append(
            {
                "name": joints[joint_name]["child"],
                "mass": mass,
                "com": com.tolist(),
                "inertia": I_com.tolist(),
            }
        )

    joints_out = []
    for i, joint_name in enumerate(MOVING_JOINTS):
        joint = joints[joint_name]
        parent_idx, parent_transform = support(joint["parent"])
        R, p = compose(parent_transform, joint["transform"])
        joints_out.append(
            {
                "name": joint_name,
                "type": joint["type"],
                "parent": parent_idx,
                "axis": joint["axis"].tolist(),
                "rotation": R.tolist(),
                "translation": p.tolist(),
                "limit": joint["limit"],
                "damping": joint["damping"],
                "friction": joint["friction"],
            }
        )

    frames_out = {}
    for frame_name in FRAME_NAMES:
        if frame_name == "world_joint":
            frames_out[frame_name] = {
                "parent": -1,
                "rotation": np.eye(3).tolist(),
                "translation": [0.0, 0.0, 0.0],
            }
            continue
        joint = joints[frame_name]
        if frame_name in MOVING_JOINTS:
            idx = MOVING_JOINTS.index(frame_name)
            frames_out[frame_name] = {
                "parent": idx,
                "rotation": np.eye(3).tolist(),
                "translation": [0.0, 0.0, 0.0],
            }
        else:
            parent_idx, parent_transform = support(joint["parent"])
            R, p = compose(parent_transform, joint["transform"])
            frames_out[frame_name] = {
                "parent": parent_idx,
                "rotation": R.tolist(),
                "translation": p.tolist(),
            }

    link_frames_out = {}
    for link_name in LINK_NAMES:
        idx, (R, p) = support(link_name)
        link_frames_out[link_name] = {
            "parent": idx,
            "rotation": R.tolist(),
            "translation": p.tolist(),
        }

    model = {
        "name": "frankaridgeback",
        "joints": joints_out,
        "links": links_out,
        "frames": frames_out,
        "link_frames": link_frames_out,
        "end_effector_frame": "panda_grasp_joint",
    }
    with open(output_path, "w") as handle:
        json.dump(model, handle, indent=1)
    print(f"wrote {output_path}")
    total_mass = sum(l["mass"] for l in links_out)
    print(f"moving links: {len(links_out)}, total mass {total_mass:.2f} kg")


if __name__ == "__main__":
    urdf = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src/frankaridgeback/model/robot.urdf"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "assistedmanipulation_tpu/models/frankaridgeback_model.json"
    )
    main(urdf, out)

"""Data exporters + map checkpointing.

Replaces the reference's terminal exports (SURVEY.md §5): trajectory TSV
(System::SaveTrajectoryMapping, System.cc:396-429 format: name, time, 3x4
[Rwc|twc] row-major), COLMAP sparse text model (System::ExportCOLMAP,
System.cc:432-557), Agisoft Metashape XML (System::SaveKeyFramesAgisoft,
System.cc:559-717), and point-cloud TSV (System::SaveMap, System.cc:909).

Plus what the reference lacks (SaveMap/LoadMap are TODO stubs,
System.h:131-134): full MapState checkpoint/restore — arenas serialize
naturally to one npz.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core import mapstate as MS
from hyslam_tpu.core.mapstate import MapState
from hyslam_tpu.core.trajectory import Trajectory
from hyslam_tpu.geometry import se3, so3
from hyslam_tpu.geometry.camera import Camera


def save_trajectory_tsv(path: str, traj: Trajectory, name: str = "SLAM",
                        align_first_kf: np.ndarray | None = None):
    """Reference format: name \\t time \\t r00 r01 r02 tx r10.. (camera->world)."""
    n = int(traj.size)
    Twc = np.asarray(se3.inverse(traj.Tcw[:n]))
    if align_first_kf is not None:
        # re-base the world so the first keyframe sits at the origin (after
        # loop closure KF0 may have moved, System.cc:404-406)
        T0w = np.asarray(align_first_kf)  # first KF's Tcw
        Twc = np.einsum("ij,njk->nik", T0w, Twc)
    t = np.asarray(traj.t[:n])
    with open(path, "w") as f:
        for i in range(n):
            R = Twc[i, :3, :3]
            c = Twc[i, :3, 3]
            row = [name, f"{t[i]:.9f}"]
            for r in range(3):
                row += [f"{R[r,0]:.6f}", f"{R[r,1]:.6f}", f"{R[r,2]:.6f}",
                        f"{c[r]:.6f}"]
            f.write("\t".join(row) + "\n")


def save_trajectory_tum(path: str, traj: Trajectory):
    """TUM RGB-D benchmark format (ts tx ty tz qx qy qz qw, camera->world)
    for ATE evaluation tooling."""
    n = int(traj.size)
    Twc = np.asarray(se3.inverse(traj.Tcw[:n]))
    q = np.asarray(so3.quat_from_mat(jnp.asarray(Twc[:, :3, :3])))
    t = np.asarray(traj.t[:n])
    with open(path, "w") as f:
        for i in range(n):
            c = Twc[i, :3, 3]
            f.write(
                f"{t[i]:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                f"{q[i,1]:.6f} {q[i,2]:.6f} {q[i,3]:.6f} {q[i,0]:.6f}\n"
            )


def export_colmap(folder: str, ms: MapState, cam: Camera, cam_name="SLAM"):
    """COLMAP sparse-model text: cameras.txt / images.txt / points3D.txt
    (ExportCOLMAP analog; PINHOLE model, keyframes as images, landmarks as
    points with observation tracks)."""
    out = os.path.join(folder, cam_name)
    os.makedirs(out, exist_ok=True)
    kf_ok = np.asarray(ms.kf.valid & ~ms.kf.bad)
    lm_ok = np.asarray(ms.lm.valid & ~ms.lm.bad)
    Tcw = np.asarray(ms.kf.Tcw)
    q = np.asarray(so3.quat_from_mat(ms.kf.Tcw[:, :3, :3]))
    lm_id = np.asarray(ms.kf.lm_id)
    uv = np.asarray(ms.kf.uv)
    kp_ok = np.asarray(ms.kf.kp_valid)
    pos = np.asarray(ms.lm.pos)
    obs_kf = np.asarray(ms.lm.obs_kf)
    obs_feat = np.asarray(ms.lm.obs_feat)
    obs_ok = np.asarray(ms.lm.obs_valid)

    with open(os.path.join(out, "cameras.txt"), "w") as f:
        f.write("# Camera list: CAMERA_ID MODEL WIDTH HEIGHT PARAMS[]\n")
        f.write(
            f"1 PINHOLE {cam.width} {cam.height} "
            f"{cam.fx} {cam.fy} {cam.cx} {cam.cy}\n"
        )
    with open(os.path.join(out, "images.txt"), "w") as f:
        f.write("# IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME\n")
        for k in np.nonzero(kf_ok)[0]:
            tx, ty, tz = Tcw[k, :3, 3]
            f.write(
                f"{k+1} {q[k,0]:.8f} {q[k,1]:.8f} {q[k,2]:.8f} {q[k,3]:.8f} "
                f"{tx:.8f} {ty:.8f} {tz:.8f} 1 kf{k:06d}.png\n"
            )
            pts2d = []
            for s in np.nonzero(kp_ok[k])[0]:
                l = lm_id[k, s]
                pts2d.append(
                    f"{uv[k,s,0]:.2f} {uv[k,s,1]:.2f} {l+1 if l >= 0 else -1}"
                )
            f.write(" ".join(pts2d) + "\n")
    with open(os.path.join(out, "points3D.txt"), "w") as f:
        f.write("# POINT3D_ID X Y Z R G B ERROR TRACK[] (IMAGE_ID POINT2D_IDX)\n")
        for l in np.nonzero(lm_ok)[0]:
            track = []
            for o in np.nonzero(obs_ok[l])[0]:
                track += [str(obs_kf[l, o] + 1), str(obs_feat[l, o])]
            f.write(
                f"{l+1} {pos[l,0]:.6f} {pos[l,1]:.6f} {pos[l,2]:.6f} "
                f"128 128 128 1.0 " + " ".join(track) + "\n"
            )


def save_keyframes_agisoft(path: str, ms: MapState, cam: Camera,
                           cam_name="SLAM"):
    """Agisoft Metashape camera-calibration XML (SaveKeyFramesAgisoft
    analog): sensor block with intrinsics + one camera per keyframe with its
    4x4 camera->world transform."""
    kf_ok = np.asarray(ms.kf.valid & ~ms.kf.bad)
    Twc = np.asarray(se3.inverse(ms.kf.Tcw))
    doc = ET.Element("document", version="1.2.0")
    chunk = ET.SubElement(doc, "chunk")
    sensors = ET.SubElement(chunk, "sensors")
    sensor = ET.SubElement(sensors, "sensor", id="0", label=cam_name,
                           type="frame")
    res = ET.SubElement(sensor, "resolution",
                        width=str(cam.width), height=str(cam.height))
    calib = ET.SubElement(sensor, "calibration", type="frame")
    ET.SubElement(calib, "resolution", width=str(cam.width),
                  height=str(cam.height))
    ET.SubElement(calib, "f").text = str(cam.fx)
    ET.SubElement(calib, "cx").text = str(cam.cx - cam.width / 2.0)
    ET.SubElement(calib, "cy").text = str(cam.cy - cam.height / 2.0)
    cameras = ET.SubElement(chunk, "cameras")
    for k in np.nonzero(kf_ok)[0]:
        c = ET.SubElement(cameras, "camera", id=str(int(k)),
                          sensor_id="0", label=f"kf{k:06d}")
        t = ET.SubElement(c, "transform")
        t.text = " ".join(f"{v:.9g}" for v in Twc[k].reshape(-1))
    ET.indent(doc)
    ET.ElementTree(doc).write(path, xml_declaration=True, encoding="utf-8")


def save_map_points_tsv(path: str, ms: MapState):
    """Landmark positions TSV (System::SaveMap point dump analog)."""
    lm_ok = np.asarray(ms.lm.valid & ~ms.lm.bad)
    pos = np.asarray(ms.lm.pos)
    with open(path, "w") as f:
        for l in np.nonzero(lm_ok)[0]:
            f.write(f"{pos[l,0]:.6f}\t{pos[l,1]:.6f}\t{pos[l,2]:.6f}\n")


# ---------------------------------------------------------------------------
# checkpoint / restore (capability the reference stubs out)
# ---------------------------------------------------------------------------

def save_map_state(path: str, ms: MapState):
    """Serialize the full MapState to one npz (poses, landmarks,
    associations, covisibility, sub-map table, cursors)."""
    flat = {}

    def add(prefix, nt):
        for name, val in nt._asdict().items():
            flat[f"{prefix}.{name}"] = np.asarray(val)

    add("kf", ms.kf)
    add("lm", ms.lm)
    add("maps", ms.maps)
    flat["covis"] = np.asarray(ms.covis)
    flat["next_kf"] = np.asarray(ms.next_kf)
    flat["next_lm"] = np.asarray(ms.next_lm)
    np.savez_compressed(path, **flat)


def load_map_state(path: str) -> MapState:
    z = np.load(path)

    def sub(prefix, cls):
        return cls(**{
            name: jnp.asarray(z[f"{prefix}.{name}"])
            for name in cls._fields
        })

    return MapState(
        kf=sub("kf", MS.KeyFrameArena),
        lm=sub("lm", MS.LandmarkArena),
        maps=sub("maps", MS.MapTable),
        covis=jnp.asarray(z["covis"]),
        next_kf=jnp.asarray(z["next_kf"]),
        next_lm=jnp.asarray(z["next_lm"]),
    )


def save_checkpoint(path: str, tracker, system_scalars=None) -> None:
    """Full per-camera checkpoint: map state + trajectory + sensor arena +
    tracker scalars (resume support the reference never had,
    System.h:131-134 TODO stubs). system_scalars: optional iterable of
    System-level counters (frame counter, KFs since GBA) stored alongside."""
    flat = {}

    def add(prefix, nt):
        for name, val in nt._asdict().items():
            flat[f"{prefix}.{name}"] = np.asarray(val)

    add("kf", tracker.ms.kf)
    add("lm", tracker.ms.lm)
    add("maps", tracker.ms.maps)
    flat["covis"] = np.asarray(tracker.ms.covis)
    flat["next_kf"] = np.asarray(tracker.ms.next_kf)
    flat["next_lm"] = np.asarray(tracker.ms.next_lm)
    add("traj", tracker.traj)
    add("sensors", tracker.sensors)
    flat["tk.state"] = np.asarray(tracker.state.value)
    flat["tk.last_Tcw"] = np.asarray(tracker.last_Tcw)
    flat["tk.last_Tcr"] = np.asarray(tracker.last_Tcr)
    flat["tk.scalars"] = np.asarray([
        tracker.ref_kf, tracker.last_ref_kf, tracker.last_kf_frame_id,
        tracker.n_frames, tracker.postinit_left, tracker.frames_since_reloc,
        tracker.mapper.kf_count,
    ])
    if system_scalars is not None:
        flat["sys.scalars"] = np.asarray(list(system_scalars))
    if tracker.last_feats is not None:
        add("last_feats", tracker.last_feats)
        flat["tk.last_lm_id"] = np.asarray(tracker.last_lm_id)
    np.savez_compressed(path, **flat)


def load_checkpoint(path: str, tracker):
    """Restore a tracker saved by save_checkpoint (in place). Returns the
    saved System-level scalars (or None if none were stored)."""
    from hyslam_tpu.core.sensordata import SensorArena
    from hyslam_tpu.core.trajectory import Trajectory as TJ
    from hyslam_tpu.slam.tracker import State

    z = np.load(path)

    def sub(prefix, cls):
        return cls(**{
            name: jnp.asarray(z[f"{prefix}.{name}"]) for name in cls._fields
        })

    tracker.ms = MapState(
        kf=sub("kf", MS.KeyFrameArena),
        lm=sub("lm", MS.LandmarkArena),
        maps=sub("maps", MS.MapTable),
        covis=jnp.asarray(z["covis"]),
        next_kf=jnp.asarray(z["next_kf"]),
        next_lm=jnp.asarray(z["next_lm"]),
    )
    tracker.traj = sub("traj", TJ)
    tracker.sensors = sub("sensors", SensorArena)
    tracker.state = State(int(z["tk.state"]))
    tracker.last_Tcw = np.asarray(z["tk.last_Tcw"])
    tracker.last_Tcr = np.asarray(z["tk.last_Tcr"])
    sc = [int(x) for x in z["tk.scalars"]]
    (tracker.ref_kf, tracker.last_ref_kf, tracker.last_kf_frame_id,
     tracker.n_frames) = sc[:4]
    if len(sc) >= 7:  # r1 checkpoints stored only the first four
        tracker.postinit_left = sc[4]
        tracker.frames_since_reloc = sc[5]
        tracker.mapper.kf_count = sc[6]
    if "last_feats.uv" in z:
        from hyslam_tpu.core.frame import FrameFeatures

        tracker.last_feats = sub("last_feats", FrameFeatures)
        tracker.last_lm_id = jnp.asarray(z["tk.last_lm_id"])
    return z["sys.scalars"] if "sys.scalars" in z else None

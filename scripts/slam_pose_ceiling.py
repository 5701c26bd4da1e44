"""Supervision-pose-cost probe: re-run the leakage-free offline ceiling
with the ONLINE run's Sim3-aligned SLAM poses in place of GT.

The residual online-vs-ceiling gap survives every other attribution
(eval poses: solved by per-view refinement; budget: online trains 2.5x the
ceiling's iters; volume fit: +-3%; final retrain: neutral; shutdown joint
photometric BA: regresses). The last variable separating online from its
ceiling is supervision-pose accuracy: SLAM frame poses carry ~0.005 ATE
(~0.5 px) vs the ceiling's exact GT. This probe holds EVERYTHING else
fixed (same images, masks, schedule, holdout split, encoding) and swaps
only the training poses:

    gap_pose = ceiling(GT poses) - ceiling(SLAM poses)

If gap_pose ~= the online-vs-ceiling gap, the gap is fully attributed to
finite SLAM pose accuracy — irreducible without sub-SLAM-noise pose
sources (photometric joint BA measurably is not one).

usage: python scripts/slam_pose_ceiling.py <online_run_dir> <out_dir>
       (expects <online_run_dir>/{FrameTrajectory.txt,dataset/})
then:  python -m romap_tpu.runtime.offline - <out_dir>/dataset 0 \
           --out <out_dir> --no-video --holdout 4
"""

from __future__ import annotations

import os
import sys

import numpy as np


def load_tum(path):
    rows = []
    for line in open(path):
        if line.startswith("#"):
            continue
        p = line.split()
        if len(p) < 8:
            continue
        # normalize the stamp to a float key: the SLAM trajectory and the
        # dataset format the same timestamp differently
        rows.append((round(float(p[0]), 6),
                     np.array([float(x) for x in p[1:8]])))
    return rows


def quat_to_rot(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def rot_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    if w > 1e-8:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # fall back through the largest diagonal element
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        x_ = np.sqrt(max(0.0, 1 + R[i, i] - R[j, j] - R[k, k])) / 2
        v = [0.0, 0.0, 0.0]
        v[i] = x_
        v[j] = (R[j, i] + R[i, j]) / (4 * x_)
        v[k] = (R[k, i] + R[i, k]) / (4 * x_)
        w = (R[k, j] - R[j, k]) / (4 * x_)
        x, y, z = v
    return np.array([x, y, z, w])


def umeyama(P, Q):
    """Sim3 (s, R, t) with s*R@P + t ~= Q."""
    mp, mq = P.mean(0), Q.mean(0)
    Pc, Qc = P - mp, Q - mq
    U, S, Vt = np.linalg.svd(Qc.T @ Pc / len(P))
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var = (Pc ** 2).sum() / len(P)
    s = (S * [1, 1, d]).sum() / var
    t = mq - s * R @ mp
    return s, R, t


def main():
    run_dir, out_dir = sys.argv[1], sys.argv[2]
    src = os.path.join(run_dir, "dataset")
    est = dict(load_tum(os.path.join(run_dir, "FrameTrajectory.txt")))
    gt_rows = load_tum(os.path.join(src, "groundtruth.txt"))
    gt = dict(gt_rows)

    common = [s for s, _ in gt_rows if s in est]
    P = np.array([est[s][:3] for s in common])
    Q = np.array([gt[s][:3] for s in common])
    s, R, t = umeyama(P, Q)
    resid = np.linalg.norm((s * (R @ P.T).T + t) - Q, axis=1)
    print(f"aligned {len(common)} frames: scale {s:.4f}, "
          f"ATE rmse {np.sqrt((resid ** 2).mean()):.4f} "
          f"mean {resid.mean():.4f}")

    ds = os.path.join(out_dir, "dataset")
    os.makedirs(ds, exist_ok=True)
    # share EVERYTHING except the pose table + frame list (notably
    # obj_offline/, the offline runner's per-object bbox tables — without
    # it the runner creates 0 NeRF instances)
    for entry in os.listdir(src):
        if entry in ("img.txt", "groundtruth.txt"):
            continue
        dst = os.path.join(ds, entry)
        if not os.path.lexists(dst):
            os.symlink(os.path.relpath(os.path.join(src, entry), ds), dst)

    name_of = {}
    stamp_str = {}
    for line in open(os.path.join(src, "img.txt")):
        if line.startswith("#"):
            continue
        p = line.split()
        if len(p) >= 2:
            key = round(float(p[0]), 6)
            name_of[key] = p[1]
            stamp_str[key] = p[0]  # keep the dataset's own formatting

    # frames that the offline runner will HOLD OUT for eval (serial % 4 == 0
    # over each object file's stamp list — mirror of offline.py's split)
    # keep their GT poses: held-out views never train, and giving eval
    # exact-GT poses isolates PURE supervision-pose cost (the GT ceiling
    # also evals at exact poses; online additionally refines eval poses)
    import glob
    holdout_stamps = set()
    for of in glob.glob(os.path.join(src, "obj_offline", "*.txt")):
        rows = [l.split() for l in open(of)
                if l.strip() and not l.startswith("#")]
        for serial, row in enumerate(rows[1:]):  # rows[0] = header
            if serial % 4 == 0:
                holdout_stamps.add(round(float(row[0]), 6))

    # keep EVERY dataset frame so the per-object holdout split stays
    # byte-identical to the GT-pose ceiling's; the 1-2 pre-init frames the
    # SLAM run never tracked fall back to their GT pose
    fallback = 0
    with open(os.path.join(ds, "img.txt"), "w") as fi, \
            open(os.path.join(ds, "groundtruth.txt"), "w") as fg:
        fi.write("# stamp filename\n")
        fg.write("# stamp tx ty tz qx qy qz qw\n")
        for stamp, _gt_v in gt_rows:
            if stamp not in name_of:
                continue
            if stamp in est and stamp not in holdout_stamps:
                v = est[stamp]
                Rw = R @ quat_to_rot(v[3:7])  # into GT gauge (scale-free)
                tw = s * R @ v[:3] + t
                q = rot_to_quat(Rw)
            else:
                fallback += 1
                tw, q = _gt_v[:3], _gt_v[3:7]
            ss = stamp_str[stamp]
            fi.write(f"{ss} {name_of[stamp]}\n")
            fg.write(f"{ss} {tw[0]:.7f} {tw[1]:.7f} {tw[2]:.7f} "
                     f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")
    print(f"wrote {ds} ({len(gt_rows)} frames, SLAM poses in GT gauge, "
          f"{fallback} GT fallbacks)")


if __name__ == "__main__":
    main()

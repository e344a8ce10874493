"""Camera-motion helpers for the ComfyUI CameraCtrl nodes.

Parity target: reference comfyui/utils.py (CAMERA presets :6-20,
get_camera_motion :40-50, combine_camera_motion :66-80) — preset pans/zooms
and rotations composed into per-frame 3x4 [R|T] trajectories that the
control pipeline converts to Plucker embeddings
(easyanimate_tpu/data/camera.py)."""
import numpy as np

CAMERA = {
    "base_T_norm": 1.5,
    "base_angle": np.pi / 3,
    "Static": {"angle": [0., 0., 0.], "T": [0., 0., 0.]},
    "Pan Up": {"angle": [0., 0., 0.], "T": [0., 1., 0.]},
    "Pan Down": {"angle": [0., 0., 0.], "T": [0., -1., 0.]},
    "Pan Left": {"angle": [0., 0., 0.], "T": [1., 0., 0.]},
    "Pan Right": {"angle": [0., 0., 0.], "T": [-1., 0., 0.]},
    "Zoom In": {"angle": [0., 0., 0.], "T": [0., 0., -2.]},
    "Zoom Out": {"angle": [0., 0., 0.], "T": [0., 0., 2.]},
    "ACW": {"angle": [0., 0., 1.], "T": [0., 0., 0.]},
    "CW": {"angle": [0., 0., -1.], "T": [0., 0., 0.]},
}


def compute_R_from_rad_angle(angles):
    tx, ty, tz = angles
    Rx = np.array([[1, 0, 0],
                   [0, np.cos(tx), -np.sin(tx)],
                   [0, np.sin(tx), np.cos(tx)]])
    Ry = np.array([[np.cos(ty), 0, np.sin(ty)],
                   [0, 1, 0],
                   [-np.sin(ty), 0, np.cos(ty)]])
    Rz = np.array([[np.cos(tz), -np.sin(tz), 0],
                   [np.sin(tz), np.cos(tz), 0],
                   [0, 0, 1]])
    return Rz @ Ry @ Rx


def get_camera_motion(angle, T, speed, n=16):
    """preset (angle, T) -> (n, 3, 4) linearly ramped [R|T] trajectory."""
    angle, T = np.asarray(angle, np.float64), np.asarray(T, np.float64)
    RT = []
    for i in range(n):
        _angle = (i / n) * speed * CAMERA["base_angle"] * angle
        R = compute_R_from_rad_angle(_angle)
        _T = (i / n) * speed * CAMERA["base_T_norm"] * T.reshape(3, 1)
        RT.append(np.concatenate([R, _T], axis=1))
    return np.stack(RT)


def combine_camera_motion(RT_0, RT_1):
    """Concatenate trajectories: RT_1 continues from RT_0's final pose."""
    RT = RT_0[-1].copy()
    R, R_inv, T = RT[:, :3], RT[:, :3].T, RT[:, -1]
    temp = []
    for _RT in np.copy(RT_1):
        _RT[:, :3] = _RT[:, :3] @ R
        _RT[:, -1] = _RT[:, -1] + (_RT[:, :3] @ R_inv) @ T
        temp.append(_RT)
    return np.concatenate([RT_0, np.stack(temp)], axis=0)


def gen_gaussian_heatmap(img_size=200, sigma=40.0):
    """Isotropic gaussian disk used for trajectory track images
    (comfyui_nodes.py:70-84)."""
    ys, xs = np.mgrid[0:img_size, 0:img_size].astype(np.float32)
    c = img_size / 2
    g = (1.0 / (2 * np.pi * sigma ** 2)
         * np.exp(-0.5 * (((ys - c) ** 2 + (xs - c) ** 2) / sigma ** 2)))
    rr = (ys - img_size // 2) ** 2 + (xs - img_size // 2) ** 2
    g = g * (rr <= (img_size // 2 - 1) ** 2)
    g = g / g.max() * 255.0
    return g.astype(np.float32)


def trajectory_images(coords_list, frame_height, frame_width):
    """(x, y) per-frame coordinates -> gaussian track frames
    (CreateTrajectoryBasedOnKJNodes, comfyui_nodes.py:1078-1135). Multiple
    trajectories merge by per-pixel maximum."""
    import cv2

    heatmap = gen_gaussian_heatmap()
    circle = int(50 * ((frame_height * frame_width) / (1280 * 720)) ** 0.5)
    merged = None
    for coords in coords_list:
        frames = []
        for x, y in coords:
            img = np.zeros((frame_height, frame_width, 3), np.float32)
            y1, y2 = max(y - circle, 0), min(y + circle, frame_height - 1)
            x1, x2 = max(x - circle, 0), min(x + circle, frame_width - 1)
            if x2 - x1 > 3 and y2 - y1 > 3:
                patch = cv2.resize(heatmap, (x2 - x1, y2 - y1))[:, :, None]
                img[y1:y2, x1:x2] = np.maximum(patch, img[y1:y2, x1:x2])
            frames.append(img / 255.0)
        track = np.stack(frames)
        merged = track if merged is None else np.maximum(merged, track)
    return merged

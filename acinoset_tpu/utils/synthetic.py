"""Synthetic multi-camera cheetah runs (tests + benchmarks)."""
import numpy as np
import jax
import jax.numpy as jnp

from acinoset_tpu.models import cheetah
from acinoset_tpu.ops import camera as cam_ops
from acinoset_tpu.ops.rotations import rodrigues


def ring_cameras(n_cams=6, radius=12.0, height=1.2, fx=700.0, res=(2704, 1520)):
    """Cameras on an arc looking at the origin region."""
    K = np.array([[fx, 0, res[0] / 2], [0, fx, res[1] / 2], [0, 0, 1.0]])
    D = np.array([0.04, 0.005, -0.006, 0.001])
    k_arr, d_arr, r_arr, t_arr = [], [], [], []
    angles = np.linspace(-0.9, 0.9, n_cams)
    for a in angles:
        cam_pos = np.array([radius * np.sin(a), -radius * np.cos(a), height])
        # look-at rotation: z axis towards origin
        z = -cam_pos / np.linalg.norm(cam_pos)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world->cam
        t = -R @ cam_pos
        k_arr.append(K)
        d_arr.append(D)
        r_arr.append(R)
        t_arr.append(t.reshape(3, 1))
    return (np.stack(k_arr), np.stack(d_arr), np.stack(r_arr), np.stack(t_arr), res)


def cheetah_gallop(N=60, fps=90.0, speed=None):
    """Smooth synthetic 25-state trajectory within joint limits.

    ``speed`` defaults to 8 m/s capped so the run covers at most the
    same ~9 m track (x in [-2, 7]) as the canonical N=100 workload —
    i.e. stays inside ring_cameras' capture volume at any N.
    The uncapped 8 m/s straight line put the subject 51 m past the
    camera arc at N=600/90fps, so every long-horizon row measured a
    BROKEN FIXTURE, not solver behavior (the round-3 "cold init
    diverges, 70 m error" scaling rows are that artifact; real AcinoSet
    captures keep the cheetah in view by panning). Pass speed
    explicitly to override.
    """
    if speed is None:
        duration = N / fps
        speed = min(8.0, 9.0 / duration)  # travel <= 9 m end to end
    t = np.arange(N) / fps
    pp = cheetah.get_pose_params()
    X = np.zeros((N, cheetah.N_ACTIVE))
    X[:, pp["x_0"]] = -2.0 + speed * t
    X[:, pp["y_0"]] = 0.3 * np.sin(2 * np.pi * 1.0 * t)
    X[:, pp["z_0"]] = 0.6 + 0.08 * np.sin(2 * np.pi * 3.0 * t)
    X[:, pp["psi_0"]] = 0.05 * np.sin(2 * np.pi * 0.8 * t)
    stride = 2 * np.pi * 3.0 * t  # ~3 Hz stride
    X[:, pp["theta_2"]] = 0.25 * np.sin(stride)
    X[:, pp["theta_3"]] = 0.25 * np.sin(stride + 0.7)
    X[:, pp["theta_4"]] = 0.5 * np.sin(stride + 1.2)
    X[:, pp["theta_5"]] = 0.5 * np.sin(stride + 1.5)
    X[:, pp["theta_6"]] = 0.8 * np.sin(stride)
    X[:, pp["theta_7"]] = -np.pi / 2 + 0.7 * np.sin(stride + 0.4)
    X[:, pp["theta_8"]] = 0.8 * np.sin(stride + np.pi)
    X[:, pp["theta_9"]] = -np.pi / 2 + 0.7 * np.sin(stride + np.pi + 0.4)
    X[:, pp["theta_10"]] = 0.8 * np.sin(stride + 2.0)
    X[:, pp["theta_11"]] = np.pi / 2 + 0.7 * np.sin(stride + 2.4)
    X[:, pp["theta_12"]] = 0.8 * np.sin(stride + 2.0 + np.pi)
    X[:, pp["theta_13"]] = np.pi / 2 + 0.7 * np.sin(stride + 2.4 + np.pi)
    X[:, pp["theta_0"]] = 0.1 * np.sin(stride + 0.3)
    X[:, pp["theta_1"]] = 0.1 * np.sin(stride + 0.9)
    return X


def render_measurements(X25, cams, noise_px=1.0, outlier_frac=0.02, bad_lik_frac=0.05, seed=0):
    """Project GT poses into all cameras, with noise/outliers/low-likelihood."""
    rng = np.random.default_rng(seed)
    k_arr, d_arr, r_arr, t_arr, res = cams
    N = X25.shape[0]
    C = len(k_arr)
    L = cheetah.N_MARKERS
    pts3d = np.asarray(jax.vmap(cheetah.fk25)(jnp.asarray(X25)))  # (N, L, 3)
    pixels = np.zeros((C, N, L, 2))
    for c in range(C):
        pixels[c] = np.asarray(
            cam_ops.project_points_fisheye(pts3d, k_arr[c], d_arr[c], r_arr[c], t_arr[c])
        )
    pixels += rng.normal(scale=noise_px, size=pixels.shape)
    likelihood = np.full((C, N, L), 0.99)
    n_out = int(outlier_frac * C * N * L)
    if n_out:
        ci = rng.integers(0, C, n_out)
        ni = rng.integers(0, N, n_out)
        li = rng.integers(0, L, n_out)
        pixels[ci, ni, li] += rng.normal(scale=80.0, size=(n_out, 2))
    n_bad = int(bad_lik_frac * C * N * L)
    if n_bad:
        ci = rng.integers(0, C, n_bad)
        ni = rng.integers(0, N, n_bad)
        li = rng.integers(0, L, n_bad)
        likelihood[ci, ni, li] = 0.1
        pixels[ci, ni, li] += rng.normal(scale=300.0, size=(n_bad, 2))
    return pixels, likelihood, pts3d


def make_synthetic_run_dir(
    root_dir,
    n_cams: int = 4,
    N: int = 40,
    fps: float = 90.0,
    seed: int = 0,
    cam_res=(2704, 1520),
    noise_px: float = 1.0,
):
    """Write a reference-layout synthetic run directory (dlc/*.h5 +
    extrinsic_calib/scene JSON + video_info.json) and return
    (run_dir, cams, X_true, pts3d). The data-dir twin of
    render_measurements — used by the notebooks and example scripts so
    every pipeline entry point can run without real capture data."""
    import json
    import os

    from ..models import cheetah
    from ..pipeline import data as data_io

    run = os.path.join(root_dir, "2019_03_09", "synthetic", "run")
    dlc = os.path.join(run, "dlc")
    os.makedirs(dlc, exist_ok=True)
    cams = ring_cameras(n_cams=n_cams, res=cam_res)
    k, d, r, t, res = cams
    X_true = cheetah_gallop(N=N, fps=fps)
    pixels, likelihood, pts3d = render_measurements(
        X_true, cams, noise_px=noise_px, outlier_frac=0.01, bad_lik_frac=0.02,
        seed=seed,
    )
    for c in range(n_cams):
        data_io.save_dlc_points_h5(
            os.path.join(dlc, f"cam{c + 1}DLC.h5"), pixels[c], likelihood[c],
            cheetah.get_markers(),
        )
    scene_dir = os.path.join(os.path.dirname(run), "extrinsic_calib")
    os.makedirs(scene_dir, exist_ok=True)
    data_io.save_scene(
        os.path.join(scene_dir, f"{n_cams}_cam_scene_sba.json"),
        k, d.reshape(-1, 4, 1), r, t, res,
    )
    with open(os.path.join(run, "video_info.json"), "w") as f:
        json.dump({"resolution": list(res), "fps": fps, "tot_frames": N}, f)
    return run, cams, X_true, pts3d

"""Video layer smoke tests with real (tiny) mp4 files."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline import data, video


@pytest.fixture(scope="module")
def tiny_videos(tmp_path_factory):
    root = tmp_path_factory.mktemp("vids")
    rng = np.random.default_rng(0)
    paths = []
    for c in range(2):
        fp = str(root / f"cam{c + 1}.mp4")
        w = cv2.VideoWriter(fp, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (64, 48))
        for _ in range(12):
            w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        w.release()
        paths.append(fp)
    return str(root), paths


def test_get_vid_info_and_frames(tiny_videos):
    root, paths = tiny_videos
    from acinoset_tpu.pipeline.app import get_vid_info

    res, fps, tot, fpaths = get_vid_info(root)
    assert res == (64, 48)
    assert tot == 12
    assert len(fpaths) == 2
    frames = video.get_frames(paths[0], [0, 5, 11])
    assert len(frames) == 3
    assert frames[0][1].shape == (48, 64, 3)


def test_create_labeled_videos(tiny_videos, tmp_path):
    root, paths = tiny_videos
    out_dir = str(tmp_path / "labeled")
    os.makedirs(out_dir)
    rng = np.random.default_rng(1)
    markers = cheetah.get_markers()
    label_paths = []
    for c in range(2):
        pix = rng.uniform(5, 55, (12, len(markers), 2))
        lik = np.full((12, len(markers)), 0.9)
        label_paths.append(
            data.save_dlc_points_h5(
                os.path.join(out_dir, f"labels_cam{c + 1}.h5"), pix, lik, markers
            )
        )
    outs = video.create_labeled_videos(
        paths, out_dir=out_dir, draw_skeleton=True, pcutoff=0.5,
        label_fpaths=label_paths,
    )
    assert len(outs) == 2
    for fp in outs:
        cap = cv2.VideoCapture(fp)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
        cap.release()


def test_images_to_video_roundtrip(tiny_videos, tmp_path):
    root, paths = tiny_videos
    frames = video.extract_frame_range(paths[0], 2, 6, str(tmp_path / "frames"))
    assert len(frames) == 4
    imgs = sorted(
        os.path.join(tmp_path / "frames", f) for f in os.listdir(tmp_path / "frames")
    )
    out = video.images_to_video(imgs, str(tmp_path / "out.mp4"), fps=10)
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    cap.release()
    stacked = video.vstack_images(imgs[:2], str(tmp_path / "stack.png"))
    img = cv2.imread(stacked)
    assert img.shape[0] == 96  # 2 x 48

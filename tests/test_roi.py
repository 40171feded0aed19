"""Mouth-ROI alignment: umeyama transform, interpolation, end-to-end crop."""
import os
import subprocess
import sys

import numpy as np
import pytest

from multimodalvc_tpu.data.roi import (
    crop_mouth_rois,
    default_mean_face,
    detect_landmarks,
    landmarks_interpolate,
    umeyama_similarity,
)


def test_umeyama_recovers_similarity(rng):
    src = rng.standard_normal((10, 2)).astype(np.float64) * 20
    theta, scale, t = 0.3, 1.7, np.asarray([5.0, -3.0])
    rot = scale * np.asarray([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    dst = src @ rot.T + t
    m = umeyama_similarity(src, dst)
    ones = np.concatenate([src, np.ones((10, 1))], axis=1)
    np.testing.assert_allclose(ones @ m.T, dst, atol=1e-3)


def test_landmarks_interpolate_fills_gaps():
    a, b = np.zeros((68, 2), np.float32), np.ones((68, 2), np.float32) * 4
    filled = landmarks_interpolate([None, a, None, None, None, b, None])
    assert np.allclose(filled[0], a)  # edge pad
    np.testing.assert_allclose(filled[2], a + (b - a) / 4)
    np.testing.assert_allclose(filled[3], a + (b - a) / 2)
    assert np.allclose(filled[6], b)
    assert landmarks_interpolate([None, None]) is None


def _face_clip(t=5, size=160, mouth_xy=(80, 118), shift=0.0):
    """Frames with a bright square at the mouth + landmarks matching a
    scaled/offset default face."""
    mean = default_mean_face(256)
    scale, off = size / 256.0 * 0.8, np.asarray([size * 0.1 + shift, size * 0.1])
    lms = (mean * scale + off).astype(np.float32)
    frames = np.zeros((t, size, size), np.float32)
    mouth = lms[48:68].mean(axis=0)  # (x, y)
    mx, my = int(mouth[0]), int(mouth[1])
    frames[:, my - 6 : my + 6, mx - 6 : mx + 6] = 1.0
    return frames, [lms.copy() for _ in range(t)]


def test_crop_mouth_rois_centres_mouth():
    frames, lms = _face_clip()
    rois = crop_mouth_rois(frames, lms, default_mean_face(256), std_size=256,
                           crop_height=24, crop_width=24)
    assert rois.shape == (5, 48, 48)
    # the bright mouth square lands near the crop centre
    for roi in rois:
        ys, xs = np.where(roi > 0.5)
        assert len(ys) > 0
        assert abs(ys.mean() - 24) < 8 and abs(xs.mean() - 24) < 8


def test_detect_landmarks_gated():
    with pytest.raises((RuntimeError, NotImplementedError)):
        detect_landmarks(np.zeros((1, 8, 8), np.float32))


@pytest.mark.slow  # >25 s on a 1-core box; sibling tests cover the module
def test_align_mouth_cli(tmp_path):
    frames, lms = _face_clip()
    stack = np.stack(lms)
    stack[2] = np.nan  # a dropped detection
    np.save(tmp_path / "clip.npy", frames)
    np.save(tmp_path / "lm.npy", stack)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "multimodalvc_tpu.cli.manifest_tools", "align-mouth",
         "--video", str(tmp_path / "clip.npy"), "--landmarks", str(tmp_path / "lm.npy"),
         "--crop", "48", "--out", str(tmp_path / "roi.npy")],
        capture_output=True, text=True, cwd=repo,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stderr
    rois = np.load(tmp_path / "roi.npy")
    assert rois.shape == (5, 48, 48)


def test_mediapipe_ibug68_mapping_table():
    """The FaceMesh->iBUG mapping is a valid 68-entry index table."""
    from multimodalvc_tpu.data.roi import MEDIAPIPE_IBUG68, MOUTH_POINTS, STABLE_POINTS

    assert len(MEDIAPIPE_IBUG68) == 68
    assert len(set(MEDIAPIPE_IBUG68)) == 68, "indices must be unique"
    assert all(0 <= i < 468 for i in MEDIAPIPE_IBUG68)
    # the mouth block (48:68) maps to FaceMesh lip indices incl. the corners
    mouth = MEDIAPIPE_IBUG68[MOUTH_POINTS]
    assert 61 in mouth and 291 in mouth  # left/right lip corners
    # stable registration points exist
    for i in STABLE_POINTS:
        assert 0 <= MEDIAPIPE_IBUG68[i] < 468


def test_detect_landmarks_error_guides_to_precomputed():
    import pytest

    from multimodalvc_tpu.data import roi

    frames = np.zeros((2, 32, 32), np.uint8)
    try:
        import mediapipe  # noqa: F401
        has_backend = True
    except ImportError:
        try:
            import dlib  # noqa: F401
            has_backend = True
        except ImportError:
            has_backend = False
    if has_backend:
        pytest.skip("a detector backend is importable here")
    with pytest.raises(RuntimeError, match="landmarks"):
        roi.detect_landmarks(frames)


def test_detect_landmarks_mediapipe_synthetic_face():
    """End-to-end detection on a synthetic face image (skipped without
    mediapipe; reference: avhubert/preparation/detect_landmark.py)."""
    import pytest

    mp = pytest.importorskip("mediapipe")  # noqa: F841
    from multimodalvc_tpu.data.roi import detect_landmarks

    # crude synthetic face: bright oval + dark eyes/mouth on a 128x128 canvas
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w), np.uint8)
    img[((yy - 64) / 45.0) ** 2 + ((xx - 64) / 34.0) ** 2 <= 1.0] = 200
    for cx, cy in ((48, 52), (80, 52)):
        img[((yy - cy) / 4.0) ** 2 + ((xx - cx) / 7.0) ** 2 <= 1.0] = 30
    img[((yy - 88) / 5.0) ** 2 + ((xx - 64) / 14.0) ** 2 <= 1.0] = 40
    frames = np.stack([img, img])
    lms = detect_landmarks(frames, backend="mediapipe")
    assert len(lms) == 2
    found = [lm for lm in lms if lm is not None]
    for lm in found:
        assert lm.shape == (68, 2)

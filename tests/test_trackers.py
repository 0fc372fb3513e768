"""Tracker tests: Kalman sanity, Hungarian matching, ByteTrack id persistence
across synthetic frames, BoT-SORT GMC path."""

import numpy as np
import pytest

from lpc_yolo_tpu.trackers import BOTSORT, BYTETracker, make_tracker
from lpc_yolo_tpu.trackers.kalman_filter import KalmanFilterXYAH, KalmanFilterXYWH
from lpc_yolo_tpu.trackers.matching import iou_distance, linear_assignment


def test_kalman_predict_update_converges():
    kf = KalmanFilterXYAH()
    mean, cov = kf.initiate(np.array([50.0, 50.0, 1.0, 20.0]))
    for t in range(10):
        mean, cov = kf.predict(mean, cov)
        mean, cov = kf.update(mean, cov, np.array([50.0 + 2 * (t + 1), 50.0, 1.0, 20.0]))
    # velocity estimate should approach 2 px/frame in x
    assert 1.0 < mean[4] < 3.0
    assert abs(mean[5]) < 0.5


def test_kalman_xywh_variant():
    kf = KalmanFilterXYWH()
    mean, cov = kf.initiate(np.array([50.0, 50.0, 30.0, 20.0]))
    mean, cov = kf.predict(mean, cov)
    mean, cov = kf.update(mean, cov, np.array([52.0, 50.0, 30.0, 20.0]))
    assert np.isfinite(mean).all() and np.isfinite(cov).all()


def test_linear_assignment_threshold():
    cost = np.array([[0.1, 0.9], [0.9, 0.2]])
    matches, ua, ub = linear_assignment(cost, thresh=0.5)
    assert len(matches) == 2 and not ua and not ub
    matches, ua, ub = linear_assignment(cost, thresh=0.15)
    assert len(matches) == 1 and ua == [1] and ub == [1]


def _frame_dets(t, jitter=0.0, rng=None):
    """Two objects moving right at different speeds."""
    j = rng.randn(2) * jitter if rng is not None else np.zeros(2)
    b1 = [100 + 3 * t + j[0], 100, 140 + 3 * t + j[0], 150]
    b2 = [300 - 2 * t + j[1], 200, 360 - 2 * t + j[1], 260]
    boxes = np.array([b1, b2], np.float32)
    scores = np.array([0.9, 0.85], np.float32)
    classes = np.array([0, 2], np.float32)
    return boxes, scores, classes


def test_bytetrack_id_persistence():
    tracker = BYTETracker()
    rng = np.random.RandomState(0)
    ids_per_frame = []
    for t in range(10):
        boxes, scores, classes = _frame_dets(t, jitter=1.0, rng=rng)
        out = tracker.update(boxes, scores, classes)
        if t >= 1:
            assert out.shape[1] == 8
            ids_per_frame.append(sorted(out[:, 4].astype(int).tolist()))
    # after activation, ids stay stable across frames
    assert all(ids == ids_per_frame[-1] for ids in ids_per_frame[1:])
    assert len(set(ids_per_frame[-1])) == 2


def test_bytetrack_lost_and_reacquired():
    tracker = BYTETracker(track_buffer=30, new_track_thresh=0.6)
    for t in range(5):
        boxes, scores, classes = _frame_dets(t)
        out = tracker.update(boxes, scores, classes)
    stable = sorted(out[:, 4].astype(int))
    # object 1 disappears for 3 frames
    for t in range(5, 8):
        boxes, scores, classes = _frame_dets(t)
        out = tracker.update(boxes[1:], scores[1:], classes[1:])
    # reappears near its predicted position -> same id re-activated
    boxes, scores, classes = _frame_dets(8)
    out = tracker.update(boxes, scores, classes)
    assert sorted(out[:, 4].astype(int)) == stable


def test_low_conf_rescue():
    """A detection that drops below high thresh is rescued by stage 2."""
    tracker = BYTETracker(track_high_thresh=0.5, track_low_thresh=0.1)
    for t in range(3):
        boxes, scores, classes = _frame_dets(t)
        tracker.update(boxes, scores, classes)
    boxes, scores, classes = _frame_dets(3)
    scores = np.array([0.3, 0.85], np.float32)  # first det now low-conf
    out = tracker.update(boxes, scores, classes)
    assert len(out) == 2  # rescued, not dropped


def test_botsort_with_static_camera_frames():
    tracker = BOTSORT(gmc_method="sparseOptFlow")
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (480, 640, 3), np.uint8)
    for t in range(6):
        boxes, scores, classes = _frame_dets(t)
        out = tracker.update(boxes, scores, classes, img=img)
    assert len(out) == 2
    assert out.shape[1] == 8


def test_make_tracker_from_yaml():
    t1 = make_tracker("bytetrack.yaml")
    assert isinstance(t1, BYTETracker) and not isinstance(t1, BOTSORT)
    t2 = make_tracker("botsort.yaml")
    assert isinstance(t2, BOTSORT)
    with pytest.raises(ValueError):
        make_tracker({"tracker_type": "nope"})


def test_botsort_reid_encoder_end_to_end():
    """BoT-SORT with a real ReID encoder (reference leaves encoder=None,
    bot_sort.py:158-160): appearance features flow into get_dists and two
    same-position different-color objects keep distinct ids."""
    import numpy as np

    from lpc_yolo_tpu.trackers.reid import HistogramEncoder, build_encoder
    from lpc_yolo_tpu.trackers.track import make_tracker

    enc = HistogramEncoder()
    img = np.zeros((120, 120, 3), np.uint8)
    img[10:50, 10:50] = (255, 0, 0)    # blue box
    img[60:100, 60:100] = (0, 0, 255)  # red box
    boxes = np.array([[10, 10, 50, 50], [60, 60, 100, 100]], np.float32)
    f = enc(img, boxes)
    assert f.shape[0] == 2
    np.testing.assert_allclose(np.linalg.norm(f, axis=1), 1.0, rtol=1e-5)
    # different colors -> dissimilar embeddings
    assert float(f[0] @ f[1]) < 0.5

    tracker = make_tracker({"tracker_type": "botsort", "with_reid": True, "reid_encoder": "hist"})
    assert tracker.with_reid and tracker.encoder is not None
    for _ in range(3):
        tracks = tracker.update(boxes, np.array([0.9, 0.9]), np.array([0.0, 1.0]), img)
    assert len(tracks) == 2
    assert tracks[0][4] != tracks[1][4]  # distinct ids


def test_reid_cnn_encoder_shapes():
    import numpy as np

    from lpc_yolo_tpu.trackers.reid import CNNEncoder

    enc = CNNEncoder()
    img = (np.random.RandomState(0).rand(90, 90, 3) * 255).astype(np.uint8)
    boxes = np.array([[5, 5, 40, 60], [30, 20, 80, 88], [0, 0, 10, 10]], np.float32)
    f = enc(img, boxes)
    assert f.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(f, axis=1), 1.0, rtol=1e-4)

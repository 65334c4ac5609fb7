"""Face-intrinsic shading realism (round-4 data lever) invariants."""

import numpy as np

from fvd_tpu.models.synthetic_faces import face_shading_realism, render_face


def test_shading_preserves_gt_box_and_landmarks():
    """Shading is photometric-only: box and landmark geometry must be
    byte-identical to the unshaded render at the same rng stream."""
    r1, r2 = np.random.RandomState(5), np.random.RandomState(5)
    img_a, box_a, pts_a = render_face(r1, 256, shaded=False)
    img_b, box_b, pts_b = render_face(r2, 256, shaded=True)
    np.testing.assert_allclose(box_a, box_b)
    # rng streams diverge only through face_shading_realism's own draws in
    # the shaded branch, which happen AFTER geometry is fixed
    np.testing.assert_allclose(pts_a, pts_b)
    assert img_b.dtype == np.uint8
    assert not np.array_equal(img_a, img_b)  # it did change pixels


def test_shading_changes_are_face_local():
    """Pixels outside the (feathered) face ellipse are untouched."""
    rng = np.random.RandomState(9)
    img = (np.ones((200, 200, 3)) * 90).astype(np.uint8)
    ref = img.copy()
    cx, cy, fw, fh = 100.0, 100.0, 80.0, 110.0
    out = face_shading_realism(img, cx, cy, fw, fh, rng)
    yy, xx = np.mgrid[0:200, 0:200]
    r2 = ((xx - cx) / (fw / 2)) ** 2 + ((yy - cy) / (fh / 2)) ** 2
    far = r2 > 1.35  # outside the feather band
    np.testing.assert_array_equal(out[far], ref[far])
    inside = r2 < 0.7
    assert np.abs(out[inside].astype(int) - ref[inside].astype(int)).mean() > 1.0


def test_shaded_batches_keep_shapes():
    from fvd_tpu.models.synthetic_faces import detector_batch, landmark_batch
    from fvd_tpu.models.synthetic_pose import pose_batch

    rng = np.random.RandomState(2)
    frames, labels, locs, boxes = detector_batch(rng, 4, shaded=True)
    assert frames.shape[0] == 4 and np.isfinite(frames).all()
    crops, targets = landmark_batch(rng, 4, shaded=True)
    assert crops.shape == (4, 128, 128, 3)
    assert (targets >= 0).all() and (targets <= 1).all()
    pcrops, Rs, eulers = pose_batch(rng, 4, shaded=True)
    assert pcrops.shape[0] == 4 and np.isfinite(pcrops).all()

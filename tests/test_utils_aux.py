"""HashTable, boxops, compression tests."""

import numpy as np
import jax.numpy as jnp

from spconv_tpu.hash import HashTable
from spconv_tpu.utils.boxops import nms, rbbox_iou, rotate_nms


def test_hash_table_roundtrip(rng):
    t = HashTable(64)
    keys = jnp.asarray([5, 17, 3, 99], jnp.int32)
    vals = jnp.asarray([50, 170, 30, 990], jnp.int32)
    t = t.insert(keys, vals)
    got, empty = t.query(jnp.asarray([3, 99, 7], jnp.int32))
    assert list(np.asarray(got)[:2]) == [30, 990]
    assert list(np.asarray(empty)) == [False, False, True]
    # duplicate insert: first writer wins
    t2 = t.insert(jnp.asarray([5], jnp.int32), jnp.asarray([1], jnp.int32))
    got, _ = t2.query(jnp.asarray([5], jnp.int32))
    assert int(got[0]) == 50
    # insert_exist_keys updates only present keys
    t3, missing = t.insert_exist_keys(jnp.asarray([17, 1000], jnp.int32),
                                      jnp.asarray([7, 8], jnp.int32))
    got, _ = t3.query(jnp.asarray([17], jnp.int32))
    assert int(got[0]) == 7 and list(np.asarray(missing)) == [False, True]
    # assign_arange: sequential ids in key order
    t4, cnt = t.assign_arange_()
    assert int(cnt) == 4
    got, _ = t4.query(jnp.asarray([3, 5, 17, 99], jnp.int32))
    assert list(np.asarray(got)) == [0, 1, 2, 3]


def test_nms_axis_aligned():
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],   # overlaps box 0 heavily
        [20, 20, 30, 30],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    keep = np.asarray(nms(boxes, scores, 0.5))
    assert list(keep) == [True, False, True]


def test_rbbox_iou_identity_and_disjoint():
    b = jnp.asarray([[0, 0, 4, 2, 0.3], [10, 10, 2, 2, 1.0]], jnp.float32)
    iou = np.asarray(rbbox_iou(b, b))
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-4)
    assert iou[0, 1] < 1e-6


def test_rbbox_iou_vs_shapely_style(rng):
    """Golden: axis-aligned rotated boxes (angle=0) reduce to AABB IoU."""
    def aabb_iou(a, b):
        ax1, ay1, ax2, ay2 = a[0]-a[2]/2, a[1]-a[3]/2, a[0]+a[2]/2, a[1]+a[3]/2
        bx1, by1, bx2, by2 = b[0]-b[2]/2, b[1]-b[3]/2, b[0]+b[2]/2, b[1]+b[3]/2
        iw = max(0, min(ax2, bx2) - max(ax1, bx1))
        ih = max(0, min(ay2, by2) - max(ay1, by1))
        inter = iw * ih
        return inter / (a[2]*a[3] + b[2]*b[3] - inter)
    boxes = rng.uniform(0, 8, size=(6, 5)).astype(np.float32)
    boxes[:, 2:4] += 1.0
    boxes[:, 4] = 0.0
    iou = np.asarray(rbbox_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(6):
        for j in range(6):
            want = aabb_iou(boxes[i], boxes[j])
            np.testing.assert_allclose(iou[i, j], want, atol=2e-3,
                                       err_msg=f"{i},{j}")


def test_rotated_90deg_equivalence():
    """Box rotated 90° swaps w/h — IoU with its swapped twin is 1."""
    b = jnp.asarray([[2, 3, 4, 2, np.pi / 2], [2, 3, 2, 4, 0.0]], jnp.float32)
    iou = np.asarray(rbbox_iou(b, b))
    np.testing.assert_allclose(iou[0, 1], 1.0, atol=1e-4)


def test_rotate_nms():
    boxes = jnp.asarray([
        [0, 0, 4, 2, 0.2],
        [0.2, 0, 4, 2, 0.25],  # near-duplicate
        [8, 8, 2, 2, 1.2],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.85, 0.5], jnp.float32)
    keep = np.asarray(rotate_nms(boxes, scores, 0.3))
    assert list(keep) == [True, False, True]

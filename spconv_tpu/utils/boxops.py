"""Box utilities (parity: ``spconv/csrc/utils/boxops.py`` + wrappers in
``spconv/utils/__init__.py:53-116`` — rotated-box IoU, NMS, rotated NMS).

Implemented as jittable JAX ops (static-shape, mask-based greedy NMS via
``fori_loop``) instead of the reference's boost::geometry CPU code — these
run on-device so post-processing stays off the host."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rbbox_iou", "rbbox_intersection", "nms", "rotate_nms"]


def _box_corners(boxes: jax.Array) -> jax.Array:
    """[N, 5] (cx, cy, w, h, angle) → [N, 4, 2] corners (ccw)."""
    cx, cy, w, h, a = [boxes[:, i] for i in range(5)]
    cos, sin = jnp.cos(a), jnp.sin(a)
    dx = jnp.stack([w, w, -w, -w], 1) / 2
    dy = jnp.stack([-h, h, h, -h], 1) / 2
    x = cx[:, None] + dx * cos[:, None] - dy * sin[:, None]
    y = cy[:, None] + dx * sin[:, None] + dy * cos[:, None]
    return jnp.stack([x, y], -1)


def _polygon_area(poly: jax.Array, valid: jax.Array) -> jax.Array:
    """Shoelace area of a masked polygon [V, 2] with validity mask [V]."""
    v = valid.astype(poly.dtype)
    n = poly.shape[0]
    idx = jnp.arange(n)
    nxt = (idx + 1) % n
    # contributions only between consecutive valid vertices: polygon is
    # stored compacted (valid prefix), so next-valid == roll when prefix
    cnt = jnp.sum(valid)
    nxt = jnp.where(idx + 1 < cnt, idx + 1, 0)
    x, y = poly[:, 0], poly[:, 1]
    cross = x * y[nxt] - x[nxt] * y
    return jnp.abs(jnp.sum(cross * v)) / 2


def _clip_polygon(poly, valid, a, b):
    """Sutherland–Hodgman: clip masked polygon by half-plane left of a→b."""
    n = poly.shape[0]
    cnt = jnp.sum(valid)
    idx = jnp.arange(n)
    nxt = jnp.where(idx + 1 < cnt, idx + 1, 0)
    d = b - a
    side = d[0] * (poly[:, 1] - a[1]) - d[1] * (poly[:, 0] - a[0])
    inside = side >= 0
    side_n = side[nxt]
    inside_n = inside[nxt]
    denom = side - side_n
    t = jnp.where(jnp.abs(denom) > 1e-12, side / jnp.where(denom == 0, 1, denom), 0)
    inter = poly + t[:, None] * (poly[nxt] - poly)

    # each edge (i, next) emits up to 2 vertices
    emit1 = inside & valid  # current vertex
    emit2 = (inside != inside_n) & valid & (idx < cnt)  # crossing point
    verts = jnp.concatenate([poly, inter], 0)  # [2n, 2]
    emits = jnp.concatenate([emit1, emit2], 0)
    order = jnp.concatenate([idx * 2, idx * 2 + 1])  # interleave cur, inter
    # compact emitted vertices in edge order
    perm = jnp.argsort(jnp.where(emits, order, 4 * n), stable=True)
    out = verts[perm]
    out_valid = emits[perm]
    return out[: n + 4], out_valid[: n + 4] & (jnp.arange(n + 4) < jnp.sum(emits))


def rbbox_intersection(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise intersection area of rotated boxes [N,5] × [M,5] → [N,M]."""

    c1 = _box_corners(boxes1)
    c2 = _box_corners(boxes2)

    def one_pair(p, q):
        # clip polygon p (4 verts padded to 12) by quad q's 4 edges
        nv = 12
        poly = jnp.zeros((nv, 2), boxes1.dtype).at[:4].set(p)
        valid = jnp.arange(nv) < 4
        for e in range(4):
            poly, valid = _clip_polygon(poly, valid, q[e], q[(e + 1) % 4])
            poly, valid = poly[:nv], valid[:nv]
        return _polygon_area(poly, valid)

    return jax.vmap(lambda p: jax.vmap(lambda q: one_pair(p, q))(c2))(c1)


def rbbox_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Rotated IoU (parity: ``spconv/utils/__init__.py:rbbox_iou``)."""
    inter = rbbox_intersection(boxes1, boxes2)
    a1 = boxes1[:, 2] * boxes1[:, 3]
    a2 = boxes2[:, 2] * boxes2[:, 3]
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def _nms_from_iou(iou: jax.Array, scores: jax.Array, valid: jax.Array,
                  thresh: float) -> jax.Array:
    """Greedy NMS given a pairwise IoU matrix; returns keep mask."""
    n = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    iou_s = iou[order][:, order]
    valid_s = valid[order]

    def body2(i, keep):
        mask = (jnp.arange(n) < i) & keep
        sup = jnp.any(mask & (iou_s[:, i] > thresh))
        return keep.at[i].set(valid_s[i] & ~sup)

    keep_s = jax.lax.fori_loop(0, n, body2, jnp.zeros((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_s)
    return keep


def nms(boxes: jax.Array, scores: jax.Array, thresh: float,
        valid: jax.Array = None) -> jax.Array:
    """Axis-aligned NMS on [N, 4] (x1, y1, x2, y2); returns keep mask
    (parity: ``spconv/utils/__init__.py:non_max_suppression_cpu``)."""
    if valid is None:
        valid = jnp.ones((boxes.shape[0],), bool)
    x1, y1, x2, y2 = [boxes[:, i] for i in range(4)]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-12)
    return _nms_from_iou(iou, scores, valid, thresh)


def rotate_nms(boxes: jax.Array, scores: jax.Array, thresh: float,
               valid: jax.Array = None) -> jax.Array:
    """Rotated NMS on [N, 5] (parity: ``rotate_non_max_suppression_cpu``)."""
    if valid is None:
        valid = jnp.ones((boxes.shape[0],), bool)
    iou = rbbox_iou(boxes, boxes)
    return _nms_from_iou(iou, scores, valid, thresh)

"""On-device box operations: IoU, decode, batched fixed-shape NMS.

The reference does detection post-processing on the CPU: per-image python
loops, numpy IoU inside a greedy while-loop (retinanet.py:523-711), with a
device→host transfer per image (retinanet.py:583-585) — its principal
inference perf cliff.  Here everything is jnp over static shapes:

- :func:`decode_boxes` — regression activations + anchors → clipped min-max
  boxes, whole batch at once (retinanet.py:769-793 semantics),
- :func:`nms_fixed` — greedy class-aware NMS to a FIXED number of output
  slots: top-k prefilter (lax.top_k), one (k, k) IoU matrix, then a
  lax.fori_loop sweep in score order (exactly the reference's greedy
  while-loop, retinanet.py:590-602, without leaving the device),
- :func:`batched_nms` — vmap of the above over the batch; jit once, reuse.

The reference's exotic prune modes (rel_thresh / inc / dup,
retinanet.py:613-695) are host-side post-passes on the ≤k survivors — see
applications.detection.nms_post_passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def pairwise_iou(a, b):
    """IoU of (N,4) vs (M,4) min-max boxes → (N, M); degenerate boxes → 0."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0.0) * jnp.clip(a[:, 3] - a[:, 1], 0.0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0.0) * jnp.clip(b[:, 3] - b[:, 1], 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


BOX_MEAN = (0.0, 0.0, 0.0, 0.0)
BOX_STD = (0.1, 0.1, 0.2, 0.2)


def decode_boxes(reg, anchors, img_hw, mean=BOX_MEAN, std=BOX_STD):
    """Shift anchors by regression activations → clipped min-max boxes.

    reg: (..., N, 4) activations; anchors: (N, 4) min-max; img_hw: (H, W)
    static ints.  Rule (retinanet.py:736-744): d = reg*std + mean;
    center += wh*d[:2]; wh *= exp(d[2:]); clip x to [0, W], y to [0, H].
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * w
    cy = anchors[:, 1] + 0.5 * h

    d = reg * std + mean
    px = cx + w * d[..., 0]
    py = cy + h * d[..., 1]
    pw = w * jnp.exp(d[..., 2])
    ph = h * jnp.exp(d[..., 3])

    H, W = img_hw
    x0 = jnp.clip(px - 0.5 * pw, 0.0)
    y0 = jnp.clip(py - 0.5 * ph, 0.0)
    x1 = jnp.minimum(px + 0.5 * pw, float(W))
    y1 = jnp.minimum(py + 0.5 * ph, float(H))
    return jnp.stack([x0, y0, x1, y1], axis=-1)


@partial(jax.jit, static_argnames=("top_k", "out_k", "return_counts"))
def nms_fixed(boxes, classes, scores, max_overlap=0.5, top_k=1000, out_k=20,
              return_counts=False):
    """Greedy class-aware NMS with fixed output size (single image).

    boxes (N,4), classes (N,) int, scores (N,) — anchors whose score is <= 0
    are treated as invalid (pre-masked by the caller).  Returns
    (boxes (out_k,4), classes (out_k,), scores (out_k,)) sorted by descending
    score; empty slots have score 0.  Semantics match the reference's greedy
    loop: the top survivor kills same-class boxes with IoU > max_overlap
    (retinanet.py:590-602).

    return_counts=True appends an int32 (2,) vector [n_candidates, n_alive]
    (boxes entering the greedy sweep, boxes surviving it) — the counts the
    reference's nms(print_it=True) traces (retinanet.py:578-612).
    """
    N = boxes.shape[0]
    k = min(top_k, N)
    top_scores, idx = lax.top_k(scores, k)
    b = boxes[idx]
    c = classes[idx]
    valid = top_scores > 0.0

    iou = pairwise_iou(b, b)
    same = c[:, None] == c[None, :]
    # j suppressed by i: same class, big overlap, j later in score order
    later = jnp.arange(k)[None, :] > jnp.arange(k)[:, None]
    suppress = (iou > max_overlap) & same & later

    def body(i, alive):
        return alive & ~(alive[i] & suppress[i])

    alive = lax.fori_loop(0, k, body, valid)

    kept_scores = jnp.where(alive, top_scores, 0.0)
    out_scores, oidx = lax.top_k(kept_scores, min(out_k, k))
    if return_counts:
        counts = jnp.stack([valid.sum(), alive.sum()]).astype(jnp.int32)
        return b[oidx], c[oidx], out_scores, counts
    return b[oidx], c[oidx], out_scores


def batched_nms(boxes, classes, scores, max_overlap=0.5, top_k=1000, out_k=20,
                return_counts=False):
    """vmap of :func:`nms_fixed` over a leading batch dim."""
    fn = partial(nms_fixed, max_overlap=max_overlap, top_k=top_k, out_k=out_k,
                 return_counts=return_counts)
    return jax.vmap(fn)(boxes, classes, scores)

"""Instance decoding: center NMS, pixel grouping, consecutive relabel, temporal ID
association.

Reference: /root/reference/fiery/utils/instance.py:80-330. TPU-first split:
  * per-frame decoding (NMS -> grouping -> relabel) is fully jittable with a fixed
    ``max_instances`` bound — no dynamic shapes, batch/time handled by vmap;
  * the cross-frame ID association keeps the reference's Hungarian matching on host
    (tiny K x K problems, inherently sequential across time), with the reference's
    distance threshold 3.0 and new-id allocation semantics.
"""

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

MAX_INSTANCES = 100  # reference caps detected centers at 100 (instance.py:134-136)

# 'nosort' replaces the decode's lax.top_k over the 40000-pixel score map
# (which lowers to a full-width sort on this toolchain) with the radix-select +
# rank-compaction scheme proven on the splat (ops/lift_splat.py), plus one
# k-element ordering sort — bit-exact vs lax.top_k incl. tie order
# (tests/test_postprocess.py). 'topk' keeps the stock lowering.
# Module attribute overrides the env var (tests/tools set it directly); the env
# var is read at call time, i.e. at TRACE time — an already-jitted decode does
# not retrace when the flag flips (jax caches by function identity).
_DECODE_TOPK = None


def _decode_topk():
    if _DECODE_TOPK is not None:
        return _DECODE_TOPK
    return os.environ.get('FIERY_DECODE_TOPK', 'nosort')


def _top_k_scores_nosort(scores, k):
    """Bit-exact ``lax.top_k(scores, k)`` without sorting the full score map.

    Three compare/reduce stages, no full-width sort or scatter:
      1. radix-select the exact k-th largest value (4-bit histogram descent on
         order-mapped float bits — ops/lift_splat._kth_largest_bits);
      2. compact the k selected entries into slots by index rank (ties at the
         k-th value take the lowest indices — lax.top_k's stable rule);
      3. order the k survivors by one tiny k-element stable sort.
    """
    from fiery_tpu.ops.lift_splat import _kth_largest_bits, _order_bits
    u, nbits = _order_bits(scores)
    kth_u = _kth_largest_bits(u, k, nbits)
    gt = u > kth_u
    eq = u == kth_u
    n_gt = gt.sum(axis=-1, keepdims=True)
    eq_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1)       # 1-based among ties
    sel = gt | (eq & (eq_rank <= (k - n_gt)))                 # exactly k true
    slot = jnp.cumsum(sel.astype(jnp.int32), axis=-1) - 1     # 0..k-1 where sel
    onehot = sel[..., None] & (slot[..., None] == jnp.arange(k))
    # each slot has exactly one contributor, so a 0-filled sum is a select
    # (correct even for -inf scores)
    idx = jnp.arange(scores.shape[-1], dtype=jnp.int32)
    sel_scores = jnp.sum(jnp.where(onehot, scores[..., None], 0), axis=-2)
    sel_idx = jnp.sum(jnp.where(onehot, idx[..., :, None], 0), axis=-2)
    sel_u = jnp.sum(jnp.where(onehot, u[..., None], 0), axis=-2)
    # ascending sort on the inverted order key = descending score; stable keeps
    # the compaction's ascending-index order among equal scores, like top_k
    _, out_scores, out_idx = jax.lax.sort(
        (~sel_u, sel_scores, sel_idx), num_keys=1, is_stable=True)
    return out_scores, out_idx


def find_instance_centers(center_prediction, conf_threshold=0.1, nms_kernel_size=3,
                          max_instances=MAX_INSTANCES):
    """(h, w) heatmap -> (max_instances, 2) int32 centers + (max_instances,) validity.

    Threshold + 3x3 max-pool NMS (reference instance.py:80-91); survivors are ranked by
    score and padded/truncated to a fixed count.
    """
    h, w = center_prediction.shape
    x = jnp.where(center_prediction >= conf_threshold, center_prediction, -1.0)
    p = (nms_kernel_size - 1) // 2
    pooled = jax.lax.reduce_window(
        x[None, :, :, None], -jnp.inf, jax.lax.max,
        (1, nms_kernel_size, nms_kernel_size, 1), (1, 1, 1, 1),
        ((0, 0), (p, p), (p, p), (0, 0)))[0, :, :, 0]
    is_peak = (x == pooled) & (x > 0)
    scores = jnp.where(is_peak, x, -jnp.inf).reshape(-1)
    if _decode_topk() == 'nosort':
        top_scores, top_idx = _top_k_scores_nosort(scores, max_instances)
    else:
        top_scores, top_idx = jax.lax.top_k(scores, max_instances)
    centers = jnp.stack([top_idx // w, top_idx % w], axis=-1).astype(jnp.int32)
    valid = top_scores > 0
    return centers, valid


def group_pixels(centers, valid, offset_predictions):
    """Assign each pixel to the nearest valid center via its predicted offset.

    centers: (K, 2); valid: (K,); offset: (h, w, 2) [dx(vertical), dy(horizontal)].
    Returns (h, w) int32 instance ids in [1, K]. Reference: instance.py:94-113.
    """
    h, w, _ = offset_predictions.shape
    xg = jnp.arange(h, dtype=offset_predictions.dtype)[:, None]
    yg = jnp.arange(w, dtype=offset_predictions.dtype)[None, :]
    px = xg + offset_predictions[..., 0]
    py = yg + offset_predictions[..., 1]
    # (K, h, w) squared distances to each center; invalid centers pushed to +inf
    dx = centers[:, 0, None, None].astype(px.dtype) - px[None]
    dy = centers[:, 1, None, None].astype(py.dtype) - py[None]
    dist = dx * dx + dy * dy
    dist = jnp.where(valid[:, None, None], dist, jnp.inf)
    return jnp.argmin(dist, axis=0).astype(jnp.int32) + 1


def make_instance_seg_consecutive(instance_seg, max_ids=MAX_INSTANCES + 1):
    """Relabel ids to be consecutive starting from 0 (background stays 0).

    Fixed-shape device equivalent of the reference torch.unique relabel
    (instance.py:147-170).
    """
    flat = instance_seg.reshape(-1)
    ids = jnp.arange(max_ids, dtype=jnp.int32)
    if _decode_topk() == 'nosort':
        # compare/reduce instead of a 40k-row scatter-max and a 40k-row table
        # gather: random row transactions run at only ~55M rows/s on TPU while
        # the (max_ids, hw) broadcast compare streams on the VPU.
        present = jnp.any(flat[None, :] == ids[:, None], axis=-1).astype(jnp.int32)
        present = present.at[0].set(1)  # background always counts: id 0 -> 0
        mapping = jnp.cumsum(present) - 1
        remapped = jnp.sum(
            jnp.where(instance_seg[..., None] == ids, mapping, 0), axis=-1)
        return remapped.astype(jnp.int32)
    present = jnp.zeros((max_ids,), jnp.int32).at[flat].max(1)
    present = present.at[0].set(1)  # background always counts so id 0 maps to 0
    mapping = jnp.cumsum(present) - 1  # mapping[id] = rank of id among present ids
    return mapping[instance_seg].astype(jnp.int32)


def get_instance_segmentation_and_centers(
        center_predictions, offset_predictions, foreground_mask,
        conf_threshold=0.1, nms_kernel_size=3, max_instances=MAX_INSTANCES,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-frame decode. center (h, w, 1), offset (h, w, 2), foreground (h, w) bool.

    Returns (instance_seg (h, w) int32 consecutive ids, centers (K, 2), valid (K,)).
    Reference: instance.py:116-144.
    """
    centers, valid = find_instance_centers(
        center_predictions[..., 0], conf_threshold, nms_kernel_size, max_instances)
    ids = group_pixels(centers, valid, offset_predictions)
    any_center = jnp.any(valid)
    instance_seg = jnp.where(foreground_mask & any_center, ids, 0)
    instance_seg = make_instance_seg_consecutive(instance_seg)
    return instance_seg, centers, valid


def decode_instance_predictions(output: Dict[str, jnp.ndarray],
                                conf_threshold=0.1, nms_kernel_size=3,
                                max_instances=MAX_INSTANCES, vehicles_id=1):
    """Batch/time decode of the network output dict -> (b, s, h, w) instance ids.

    Jittable (fixed shapes); reference driver loops in python (instance.py:272-292).
    """
    preds = jnp.argmax(output['segmentation'], axis=-1)       # (b, s, h, w)
    foreground = preds == vehicles_id

    def frame(center, offset, fg):
        seg, _, _ = get_instance_segmentation_and_centers(
            center, offset, fg, conf_threshold, nms_kernel_size, max_instances)
        return seg

    fn = jax.vmap(jax.vmap(frame))
    return fn(output['instance_center'], output['instance_offset'], foreground)


# ---------------------------------------------------------------------------
# Host-side temporal consistency (Hungarian matching; reference instance.py:173-269)
# ---------------------------------------------------------------------------

def _segment_centroids(labels, coord_maps, ids):
    """Mean coordinate of each id in ``ids`` under per-pixel coordinate fields.

    labels (h, w) int; coord_maps: sequence of (h, w) float fields (e.g. a pixel
    grid, possibly flow-advected). Returns (len(ids), len(coord_maps)). Uses one
    bincount per coordinate — no per-id mask loops.
    """
    flat = labels.ravel()
    size = int(ids.max()) + 1
    counts = np.bincount(flat, minlength=size)[ids].astype(np.float64)
    sums = [np.bincount(flat, weights=c.ravel().astype(np.float64),
                        minlength=size)[ids] for c in coord_maps]
    return np.stack(sums, axis=-1) / counts[:, None]


def make_instance_id_temporally_consistent(pred_inst, future_flow,
                                           matching_threshold=3.0):
    """pred_inst: (1, s, h, w) int numpy; future_flow: (1, s, h, w, 2) numpy.

    Returns (1, s, h, w) with ids consistent across time: each frame's centroids
    are matched against the previous frame's flow-advected centroids (Hungarian
    optimum, accepted under the distance threshold), and unmatched detections get
    fresh ids. Protocol-equivalent to reference instance.py:173-269 (pinned by
    tests/test_postprocess.py); assumes per-frame ids are consecutive 1..N, which
    decode_instance_predictions guarantees.
    """
    pred_inst = np.asarray(pred_inst)
    future_flow = np.asarray(future_flow)
    assert pred_inst.shape[0] == 1, 'Assumes batch size = 1'
    seq = pred_inst[0]
    seq_len, h, w = seq.shape
    pixel_grid = np.stack(np.meshgrid(np.arange(h, dtype=np.float32),
                                      np.arange(w, dtype=np.float32),
                                      indexing='ij'))

    tracked = [seq[0]]
    next_fresh_id = int(seq[0].max()) + 1

    for t in range(1, seq_len):
        prev_frame, cur_frame = tracked[-1], seq[t]
        prev_ids = np.unique(prev_frame)[1:]
        cur_ids = np.unique(cur_frame)[1:]
        if len(prev_ids) == 0 or len(cur_ids) == 0:
            tracked.append(cur_frame)
            continue

        # where the previous instances should be now, according to the flow
        advected = pixel_grid + np.moveaxis(future_flow[0, t - 1], -1, 0)
        prev_pos = _segment_centroids(prev_frame, advected, prev_ids)
        cur_pos = _segment_centroids(cur_frame, pixel_grid, cur_ids)

        cost = np.linalg.norm(prev_pos[:, None] - cur_pos[None, :], axis=-1)
        rows, cols = scipy.optimize.linear_sum_assignment(cost)
        accepted = cost[rows, cols] < matching_threshold

        relabel = np.zeros(int(cur_ids.max()) + 1, dtype=seq.dtype)
        relabel[cur_ids[cols[accepted]]] = prev_ids[rows[accepted]]
        unmatched = np.setdiff1d(cur_ids, cur_ids[cols[accepted]])
        relabel[unmatched] = next_fresh_id + np.arange(len(unmatched))
        next_fresh_id += len(unmatched)
        tracked.append(relabel[cur_frame])

    return np.stack(tracked)[None]


@functools.lru_cache(maxsize=None)
def _jitted_decode(vehicles_id):
    def fn(output):
        # int16 halves the device->host transfer (ids are capped at MAX_INSTANCES)
        return decode_instance_predictions(output, vehicles_id=vehicles_id).astype(
            jnp.int16)
    return jax.jit(fn)


def predict_instance_segmentation_and_trajectories(
        output, compute_matched_centers=False, make_consistent=True, vehicles_id=1):
    """Full postprocessing driver. Reference: instance.py:272-330.

    output: network output dict (jnp). Returns numpy (b, s, h, w) consistent ids,
    optionally with matched center trajectories {id: (T, 2) array in (y, x)}.
    """
    decode_in = {k: output[k] for k in
                 ['segmentation', 'instance_center', 'instance_offset']}
    pred_inst = np.asarray(_jitted_decode(vehicles_id)(decode_in))
    batch_size, seq_len = pred_inst.shape[:2]

    if make_consistent:
        flow = output.get('instance_flow')
        if flow is None:
            flow = jnp.zeros_like(output['instance_offset'])
        flow = np.asarray(flow.astype(jnp.float16)).astype(np.float32)
        consistent = np.concatenate([
            make_instance_id_temporally_consistent(pred_inst[b:b + 1], flow[b:b + 1])
            for b in range(batch_size)], axis=0)
    else:
        consistent = pred_inst

    if compute_matched_centers:
        assert batch_size == 1
        matched_centers = {}
        h, w = consistent.shape[-2:]
        grid = np.stack(np.meshgrid(np.arange(h, dtype=np.float32),
                                    np.arange(w, dtype=np.float32), indexing='ij'))
        for instance_id in np.unique(consistent[0, 0])[1:]:
            for t in range(seq_len):
                mask = consistent[0, t] == instance_id
                if mask.sum() > 0:
                    matched_centers.setdefault(instance_id, []).append(
                        grid[:, mask].mean(axis=-1))
        matched_centers = {k: np.stack(v)[:, ::-1] for k, v in matched_centers.items()}
        return consistent, matched_centers

    return consistent


# ---------------------------------------------------------------------------
# Device-side temporal consistency (exact optimal assignment, fully jittable)
# ---------------------------------------------------------------------------

def make_instance_id_temporally_consistent_device(pred_inst, future_flow,
                                                  matching_threshold=3.0,
                                                  max_instances=MAX_INSTANCES):
    """Jittable device variant of the Hungarian ID association.

    pred_inst: (s, h, w) int32 (single sequence); future_flow: (s, h, w, 2).
    Solves the same centroid-distance assignment problem as the host scipy path
    (reference instance.py:242) with an exact Jonker-Volgenant solver (ops/lap.py);
    the result is optimal up to f32 tie-breaking (cost precision ~1e-3 after cost
    clipping — see below), so near-tied assignments and matches within ~1e-3 of the
    3.0 threshold can differ from the f64 host path. Cumulative fresh ids are
    tracked in ``s * max_instances + 1`` slots (the worst case: every frame all-new
    instances), so no track is ever dropped from matching. Keeps the whole eval
    path on device. Returns (s, h, w) int32 with temporally consistent ids.
    """
    from fiery_tpu.ops.lap import linear_sum_assignment
    s, h, w = pred_inst.shape
    K = max_instances + 1       # per-frame slots (decode caps each frame at 100 ids)
    K_total = s * max_instances + 1  # worst-case cumulative fresh ids over the clip

    grid = jnp.stack(jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32), indexing='ij'))

    def centers_of(frame, coord_grid, num_slots):
        """Mean position of each id 0..num_slots-1 under the given coordinate grid."""
        flat = frame.reshape(-1)
        counts = jax.ops.segment_sum(jnp.ones_like(flat, jnp.float32), flat,
                                     num_segments=num_slots)
        cx = jax.ops.segment_sum(coord_grid[0].reshape(-1), flat,
                                 num_segments=num_slots)
        cy = jax.ops.segment_sum(coord_grid[1].reshape(-1), flat,
                                 num_segments=num_slots)
        denom = jnp.maximum(counts, 1.0)
        return jnp.stack([cx / denom, cy / denom], -1), counts > 0

    def step(carry, t):
        consistent_prev, next_free_id = carry
        cur = pred_inst[t]

        warped_grid = grid + jnp.moveaxis(future_flow[t - 1], -1, 0)
        prev_centers_all, prev_valid_all = centers_of(
            consistent_prev, warped_grid, K_total)
        cur_centers, cur_valid = centers_of(cur, grid, K)

        # Compact the valid previous ids (at most max_instances per frame — each
        # frame is a relabel of a <=100-id decode) into K assignment slots; slot 0
        # stays background.
        pv = prev_valid_all.at[0].set(False)
        rank = jnp.cumsum(pv.astype(jnp.int32)) - 1
        slot = jnp.where(pv & (rank < K - 1), rank + 1, K)
        prev_slot_ids = jnp.zeros((K + 1,), jnp.int32).at[slot].set(
            jnp.arange(K_total, dtype=jnp.int32), mode='drop')[:K]
        prev_centers = prev_centers_all[prev_slot_ids]
        prev_valid = prev_valid_all[prev_slot_ids] & (prev_slot_ids > 0)

        # distance matrix between warped previous centers and current centers
        dist = jnp.linalg.norm(prev_centers[:, None] - cur_centers[None, :], axis=-1)
        valid_pair = prev_valid[:, None] & cur_valid[None, :]
        valid_pair = valid_pair.at[:, 0].set(False).at[0, :].set(False)
        dist = jnp.where(valid_pair, dist, jnp.inf)

        # Exact optimal assignment on the padded matrix. Costs beyond the accept
        # threshold only matter for dominance, so clip them at 10x the threshold:
        # this keeps the JV dual variables O(10) instead of O(BIG), preserving
        # ~1e-3 f32 cost precision (a 1e6 pad was measured to lose ~0.1 absolute).
        # BIG=1e4 still dominates any K * max-clipped-cost column sum (~3e3).
        clip = jnp.float32(10.0 * matching_threshold)
        big = jnp.float32(1e4)
        cost = jnp.where(valid_pair, jnp.minimum(dist, clip), big)
        # Only rows 0..m (the compacted valid previous tracks, plus the always-
        # invalid row 0) are augmented: the JV solver is sequential over rows,
        # and the 100-slot padding was costing ~50x the serial depth of the
        # 2-20 real tracks of a scene (exactness argument in ops/lap.py).
        n_valid_rows = jnp.sum(prev_valid.astype(jnp.int32)) + 1
        col4row = linear_sum_assignment(cost, n_rows=n_valid_rows)
        # skipped rows return col4row = -1; route them out of the scatter
        scatter_cols = jnp.where(col4row < 0, K, col4row)
        row4col = jnp.zeros((K,), jnp.int32).at[scatter_cols].set(
            jnp.arange(K, dtype=jnp.int32), mode='drop')
        cur_ids = jnp.arange(K)
        best_prev = prev_slot_ids[row4col]                   # actual prev id per cur
        dsel = dist[row4col, cur_ids]                        # unclipped pair distance
        matched = (dsel < matching_threshold) & cur_valid

        # new ids for unmatched current instances (consecutive after next_free_id)
        unmatched = cur_valid & ~matched & (cur_ids > 0)
        new_rank = jnp.cumsum(unmatched.astype(jnp.int32)) - 1
        lut = jnp.where(matched, best_prev, next_free_id + new_rank)
        lut = lut.at[0].set(0)
        lut = jnp.where(cur_valid | (cur_ids == 0), lut, 0)

        consistent = lut[cur]
        next_free_id = next_free_id + unmatched.sum()
        return (consistent, next_free_id), consistent

    first = pred_inst[0]
    init_next = first.max() + 1
    (_, _), rest = jax.lax.scan(step, (first, init_next), jnp.arange(1, s))
    return jnp.concatenate([first[None], rest], axis=0)

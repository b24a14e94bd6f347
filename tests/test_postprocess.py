"""Postprocessing + metric tests on hand-crafted frames."""

import jax.numpy as jnp
import numpy as np

from fiery_tpu.postprocess import instance as I
from fiery_tpu.training.metrics import IntersectionOverUnion, PanopticMetric


def make_center_heatmap(h, w, centers, sigma=2.0):
    x, y = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing='ij')
    hm = np.zeros((h, w), np.float32)
    for cx, cy in centers:
        hm = np.maximum(hm, np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / sigma ** 2))
    return hm


def test_find_instance_centers():
    hm = make_center_heatmap(32, 32, [(8, 8), (20, 24)])
    centers, valid = I.find_instance_centers(jnp.asarray(hm), conf_threshold=0.1)
    got = set(map(tuple, np.asarray(centers)[np.asarray(valid)]))
    assert got == {(8, 8), (20, 24)}


def test_find_instance_centers_empty():
    hm = np.zeros((16, 16), np.float32)
    centers, valid = I.find_instance_centers(jnp.asarray(hm))
    assert not np.asarray(valid).any()


def test_group_pixels_and_decode():
    h = w = 32
    centers_np = [(8, 8), (20, 24)]
    hm = make_center_heatmap(h, w, centers_np)
    # offsets pointing exactly at each pixel's true center
    inst_gt = np.zeros((h, w), np.int32)
    inst_gt[4:12, 4:12] = 1
    inst_gt[16:24, 20:28] = 2
    offset = np.zeros((h, w, 2), np.float32)
    x, y = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing='ij')
    for iid, (cx, cy) in enumerate(centers_np, start=1):
        m = inst_gt == iid
        offset[..., 0][m] = (cx - x)[m]
        offset[..., 1][m] = (cy - y)[m]
    foreground = inst_gt > 0

    seg, centers, valid = I.get_instance_segmentation_and_centers(
        jnp.asarray(hm)[..., None], jnp.asarray(offset), jnp.asarray(foreground))
    seg = np.asarray(seg)
    assert set(np.unique(seg)) == {0, 1, 2}
    # each predicted instance exactly covers one GT instance
    for iid in (1, 2):
        pred_ids = np.unique(seg[inst_gt == iid])
        assert len(pred_ids) == 1 and pred_ids[0] > 0
    assert (seg[inst_gt == 0] == 0).all()


def test_make_instance_seg_consecutive():
    seg = jnp.asarray(np.array([[0, 5, 5], [9, 0, 9], [0, 0, 5]], np.int32))
    out = np.asarray(I.make_instance_seg_consecutive(seg))
    assert set(np.unique(out)) == {0, 1, 2}
    assert (out == np.array([[0, 1, 1], [2, 0, 2], [0, 0, 1]])).all()


def test_temporal_consistency_tracks_moving_instance():
    """One box moving right by 4 px/frame with correct flow: ids must stay constant,
    even though per-frame decoding relabels from scratch."""
    h = w = 32
    s = 3
    pred_inst = np.zeros((1, s, h, w), np.int64)
    flow = np.zeros((1, s, h, w, 2), np.float32)
    for t in range(s):
        pred_inst[0, t, 10:14, 4 + 4 * t: 8 + 4 * t] = 1
        flow[0, t, :, :, 1] = 4.0  # horizontal displacement
    out = I.make_instance_id_temporally_consistent(pred_inst, flow)
    assert (out[0, 0] == pred_inst[0, 0]).all()
    for t in range(s):
        assert set(np.unique(out[0, t])) == {0, 1}


def test_temporal_consistency_new_instance_gets_new_id():
    h = w = 32
    pred_inst = np.zeros((1, 2, h, w), np.int64)
    pred_inst[0, 0, 4:8, 4:8] = 1
    pred_inst[0, 1, 4:8, 4:8] = 1       # same instance persists
    pred_inst[0, 1, 20:24, 20:24] = 2   # appears at t=1
    flow = np.zeros((1, 2, h, w, 2), np.float32)
    out = I.make_instance_id_temporally_consistent(pred_inst, flow)
    assert set(np.unique(out[0, 1])) == {0, 1, 2}
    assert (out[0, 1][4:8, 4:8] == 1).all()
    assert (out[0, 1][20:24, 20:24] == 2).all()


def test_iou_metric():
    m = IntersectionOverUnion(n_classes=2)
    pred = np.array([[0, 0, 1, 1]])
    tgt = np.array([[0, 1, 1, 1]])
    m.update(pred, tgt)
    scores = m.compute()
    # class0: tp=1 fp=1 fn=0 -> 0.5 ; class1: tp=2 fp=0 fn=1 -> 2/3
    np.testing.assert_allclose(scores, [0.5, 2 / 3])
    m.reset()
    m.update(np.zeros((4,)), np.zeros((4,)))
    scores = m.compute()
    np.testing.assert_allclose(scores, [1.0, 0.0])  # class1 absent -> absent_score


def test_panoptic_metric_perfect_match():
    m = PanopticMetric(n_classes=2)
    inst = np.zeros((1, 2, 16, 16), np.int64)
    inst[:, :, 4:8, 4:8] = 1
    m.update(inst, inst)
    scores = m.compute()
    np.testing.assert_allclose(scores['pq'], [1.0, 1.0])
    np.testing.assert_allclose(scores['sq'], [1.0, 1.0])
    np.testing.assert_allclose(scores['rq'], [1.0, 1.0])


def test_panoptic_metric_temporal_inconsistency_penalised():
    """Swapping the id of a tracked instance at t=1 costs a TP and adds FP+FN."""
    gt = np.zeros((1, 2, 16, 16), np.int64)
    gt[:, :, 4:8, 4:8] = 1
    gt[:, :, 10:14, 10:14] = 2

    consistent = gt.copy()
    m = PanopticMetric(n_classes=2)
    m.update(consistent, gt)
    pq_consistent = m.compute()['pq'][1]

    swapped = gt.copy()
    swapped[0, 1][gt[0, 1] == 1] = 2
    swapped[0, 1][gt[0, 1] == 2] = 1
    m2 = PanopticMetric(n_classes=2)
    m2.update(swapped, gt)
    pq_swapped = m2.compute()['pq'][1]
    assert pq_swapped < pq_consistent


def test_panoptic_metric_fp_fn():
    gt = np.zeros((1, 1, 16, 16), np.int64)
    gt[0, 0, 4:8, 4:8] = 1
    pred = np.zeros((1, 1, 16, 16), np.int64)
    pred[0, 0, 10:14, 10:14] = 1  # no overlap: one FN (missed gt) + one FP (spurious)
    m = PanopticMetric(n_classes=2)
    m.update(pred, gt)
    assert m.false_negative[1] == 1
    assert m.false_positive[1] == 1
    assert m.true_positive[1] == 0


def test_predict_instance_segmentation_driver():
    """Full driver on a synthetic output dict (b=1, s=2)."""
    h = w = 32
    seg_logits = np.zeros((1, 2, h, w, 2), np.float32)
    center = np.zeros((1, 2, h, w, 1), np.float32)
    offset = np.zeros((1, 2, h, w, 2), np.float32)
    flow = np.zeros((1, 2, h, w, 2), np.float32)
    x, y = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing='ij')
    for t, cx in enumerate([8, 12]):
        mask = (np.abs(x - cx) < 3) & (np.abs(y - 16) < 3)
        seg_logits[0, t, :, :, 1] = np.where(mask, 5.0, -5.0)
        seg_logits[0, t, :, :, 0] = -seg_logits[0, t, :, :, 1]
        center[0, t, :, :, 0] = make_center_heatmap(h, w, [(cx, 16)])
        offset[0, t, ..., 0][mask] = (cx - x)[mask]
        offset[0, t, ..., 1][mask] = (16 - y)[mask]
        flow[0, t, :, :, 0] = 4.0
    output = {k: jnp.asarray(v) for k, v in
              [('segmentation', seg_logits), ('instance_center', center),
               ('instance_offset', offset), ('instance_flow', flow)]}
    consistent, centers = I.predict_instance_segmentation_and_trajectories(
        output, compute_matched_centers=True)
    assert consistent.shape == (1, 2, h, w)
    assert set(np.unique(consistent)) == {0, 1}
    assert 1 in centers and centers[1].shape == (2, 2)


def test_device_lap_temporal_consistency():
    """The jittable exact-LAP matcher must agree with the host Hungarian on simple
    scenes, and run under jit."""
    import jax
    h = w = 32
    s = 3
    pred_inst = np.zeros((s, h, w), np.int32)
    flow = np.zeros((s, h, w, 2), np.float32)
    # instance A moves right 4 px/frame; instance B static; per-frame ids swap order
    for t in range(s):
        a_id, b_id = (1, 2) if t % 2 == 0 else (2, 1)
        pred_inst[t, 10:14, 4 + 4 * t: 8 + 4 * t] = a_id
        pred_inst[t, 24:28, 24:28] = b_id
        flow[t, 10:14, :, 1] = 4.0
    out_dev = np.asarray(jax.jit(I.make_instance_id_temporally_consistent_device)(
        jnp.asarray(pred_inst), jnp.asarray(flow)))
    out_host = I.make_instance_id_temporally_consistent(
        pred_inst[None].astype(np.int64), flow[None])[0]
    # both must track: the moving instance keeps one id across frames
    for out in (out_dev, out_host):
        ids_a = {int(out[t][11, 5 + 4 * t]) for t in range(s)}
        ids_b = {int(out[t][25, 25]) for t in range(s)}
        assert len(ids_a) == 1, out
        assert len(ids_b) == 1
        assert ids_a != ids_b


def test_device_lap_new_instance():
    import jax
    h = w = 32
    pred_inst = np.zeros((2, h, w), np.int32)
    pred_inst[0, 4:8, 4:8] = 1
    pred_inst[1, 4:8, 4:8] = 1
    pred_inst[1, 20:24, 20:24] = 2
    flow = np.zeros((2, h, w, 2), np.float32)
    out = np.asarray(jax.jit(I.make_instance_id_temporally_consistent_device)(
        jnp.asarray(pred_inst), jnp.asarray(flow)))
    assert (out[1][4:8, 4:8] == 1).all()
    new_id = int(out[1][21, 21])
    assert new_id not in (0, 1)


def test_device_lap_matches_host_on_random_scenes():
    """Device LAP matcher == host scipy-Hungarian matcher on randomized crowded
    scenes (many instances, random motion, id permutations across frames)."""
    import jax
    rng = np.random.RandomState(7)
    h = w = 48
    s = 4
    for trial in range(5):
        n_inst = rng.randint(3, 8)
        base = rng.randint(6, h - 10, size=(n_inst, 2))
        vel = rng.randint(-3, 4, size=(n_inst, 2))
        pred_inst = np.zeros((s, h, w), np.int32)
        flow = np.zeros((s, h, w, 2), np.float32)
        for t in range(s):
            perm = rng.permutation(n_inst)  # decoded per-frame ids are arbitrary
            for local_id, k in enumerate(perm, start=1):
                x = int(np.clip(base[k, 0] + vel[k, 0] * t, 0, h - 5))
                y = int(np.clip(base[k, 1] + vel[k, 1] * t, 0, w - 5))
                pred_inst[t, x:x + 4, y:y + 4] = local_id
                flow[t, x:x + 4, y:y + 4, 0] = vel[k, 0]
                flow[t, x:x + 4, y:y + 4, 1] = vel[k, 1]
        # fresh lambda: re-jitting the SAME function object at a second shape in
        # one process trips a stale-executable fastpath ("supplied 2 buffers but
        # compiled program expected 3") in this jax build
        out_dev = np.asarray(
            jax.jit(lambda p, f: I.make_instance_id_temporally_consistent_device(p, f))(
                jnp.asarray(pred_inst), jnp.asarray(flow)))
        out_host = I.make_instance_id_temporally_consistent(
            pred_inst[None].astype(np.int64), flow[None])[0]
        # identical tracking decisions => identical label fields:
        # both relabel against frame-0 ids with the same fresh-id allocation order
        assert (out_dev == out_host).all(), trial


def test_device_lap_tracks_beyond_100_cumulative_ids():
    """Cumulative fresh ids past max_instances must keep matching (regression:
    one_hot sized at max_instances+1 silently dropped tracks with id > 100)."""
    import jax
    h = w = 120
    s = 3
    n = 60  # 60 ids in frame 0 + 60 fresh in frame 1 -> ids up to 120 > 100
    pred_inst = np.zeros((s, h, w), np.int32)
    flow = np.zeros((s, h, w, 2), np.float32)
    # frame 0: n instances on an even grid; frames 1-2: n instances on a grid
    # offset far (>3 px) from frame 0 -> all of frame 1 gets fresh ids, and
    # frame 2 must re-match frame 1's (id > 100) tracks exactly.
    k = 0
    for i in range(0, h, 12):
        for j in range(0, w, 12):
            if k >= n:
                break
            pred_inst[0, i:i + 3, j:j + 3] = k + 1
            pred_inst[1, i + 6:i + 9, j + 6:j + 9] = k + 1
            pred_inst[2, i + 6:i + 9, j + 6:j + 9] = k + 1
            k += 1
    out = np.asarray(
        jax.jit(lambda p, f: I.make_instance_id_temporally_consistent_device(p, f))(
            jnp.asarray(pred_inst), jnp.asarray(flow)))
    out_host = I.make_instance_id_temporally_consistent(
        pred_inst[None].astype(np.int64), flow[None])[0]
    assert int(out[1].max()) > 100  # the scenario really crosses the old cap
    assert (out[2] == out[1]).all()  # tracks with id > 100 persist
    assert (out == out_host).all()


def test_topk_nosort_bit_exact_vs_lax_top_k():
    """The decode's no-sort top-k (radix select + rank compaction + k-element
    ordering sort) must reproduce lax.top_k bit-for-bit, including the stable
    lowest-index-first tie rule and all-(-inf) score maps."""
    import jax

    rng = np.random.RandomState(0)
    n, k = 4000, 100
    cases = []
    for _ in range(2):  # generic sparse peaks
        s = np.full(n, -np.inf, np.float32)
        peaks = rng.choice(n, rng.randint(0, 300), replace=False)
        s[peaks] = rng.rand(len(peaks)).astype(np.float32) + 0.1
        cases.append(s)
    for _ in range(2):  # heavy ties, incl. at the k-th boundary
        s = np.full(n, -np.inf, np.float32)
        peaks = rng.choice(n, 250, replace=False)
        s[peaks] = rng.choice([0.25, 0.5, 0.75], 250).astype(np.float32)
        cases.append(s)
    empty = np.full(n, -np.inf, np.float32)
    single = empty.copy()
    single[7] = 0.9
    cases += [empty, single]
    for s in cases:
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(s), k)
        got_v, got_i = I._top_k_scores_nosort(jnp.asarray(s), k)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_make_instance_seg_consecutive_nosort_matches_scatter(monkeypatch):
    rng = np.random.RandomState(3)
    for _ in range(4):
        seg = rng.randint(0, 101, size=(50, 50)).astype(np.int32)
        seg[seg % 3 == 0] = 0
        monkeypatch.setattr(I, '_DECODE_TOPK', 'nosort')
        a = I.make_instance_seg_consecutive(jnp.asarray(seg))
        monkeypatch.setattr(I, '_DECODE_TOPK', 'topk')
        b = I.make_instance_seg_consecutive(jnp.asarray(seg))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

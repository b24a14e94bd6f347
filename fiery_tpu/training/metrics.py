"""Evaluation metrics: per-class IoU and (video) Panoptic Quality.

Reference: /root/reference/fiery/metrics.py. The IoU update is a vectorised jnp
computation (cheap, jittable); the panoptic matching — bincount confusion, IoU>0.5
matching, and the sequential cross-frame consistency mapping — runs host-side in numpy
(eval-only path, tiny per-frame cost). Metric states are plain arrays; under
data-parallel evaluation, sum states across processes before compute() (the reference
relies on Lightning's dist_reduce_fx='sum', metrics.py:26-29, 83-86).
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np


class IntersectionOverUnion:
    """Accumulated per-class IoU. Reference: metrics.py:9-65."""

    def __init__(self, n_classes: int, ignore_index: Optional[int] = None,
                 absent_score: float = 0.0):
        self.n_classes = n_classes
        self.ignore_index = ignore_index
        self.absent_score = absent_score
        self.reset()

    def reset(self):
        self.true_positive = np.zeros(self.n_classes)
        self.false_positive = np.zeros(self.n_classes)
        self.false_negative = np.zeros(self.n_classes)
        self.support = np.zeros(self.n_classes)

    def update(self, prediction, target):
        prediction = np.asarray(prediction).reshape(-1)
        target = np.asarray(target).reshape(-1)
        for c in range(self.n_classes):
            pred_c = prediction == c
            tgt_c = target == c
            self.true_positive[c] += np.sum(pred_c & tgt_c)
            self.false_positive[c] += np.sum(pred_c & ~tgt_c)
            self.false_negative[c] += np.sum(~pred_c & tgt_c)
            self.support[c] += np.sum(tgt_c)

    def state(self):
        return np.stack([self.true_positive, self.false_positive,
                         self.false_negative, self.support])

    def load_state(self, state):
        self.true_positive, self.false_positive, self.false_negative, self.support = state

    def compute(self):
        scores = np.zeros(self.n_classes)
        for c in range(self.n_classes):
            if c == self.ignore_index:
                continue
            tp, fp, fn = self.true_positive[c], self.false_positive[c], self.false_negative[c]
            sup = self.support[c]
            if sup + tp + fp == 0:
                scores[c] = self.absent_score
                continue
            scores[c] = tp / (tp + fp + fn)
        if self.ignore_index is not None and 0 <= self.ignore_index < self.n_classes:
            scores = np.concatenate([scores[:self.ignore_index],
                                     scores[self.ignore_index + 1:]])
        return scores


class PanopticMetric:
    """Video panoptic quality with temporal-consistency penalty.

    Reference: metrics.py:68-255.
    """

    def __init__(self, n_classes: int, temporally_consistent: bool = True,
                 vehicles_id: int = 1):
        self.n_classes = n_classes
        self.temporally_consistent = temporally_consistent
        self.vehicles_id = vehicles_id
        self.reset()

    def reset(self):
        self.iou = np.zeros(self.n_classes)
        self.true_positive = np.zeros(self.n_classes)
        self.false_positive = np.zeros(self.n_classes)
        self.false_negative = np.zeros(self.n_classes)

    def state(self):
        return np.stack([self.iou, self.true_positive, self.false_positive,
                         self.false_negative])

    def load_state(self, state):
        self.iou, self.true_positive, self.false_positive, self.false_negative = state

    def update(self, pred_instance, gt_instance):
        """pred_instance/gt_instance: (b, s, h, w) int arrays; id 0 = background."""
        pred_instance = np.asarray(pred_instance)
        gt_instance = np.asarray(gt_instance)
        batch_size, sequence_length = gt_instance.shape[:2]
        assert gt_instance.min() == 0, 'ID 0 of gt_instance must be background'

        pred_segmentation = (pred_instance > 0).astype(np.int64)
        gt_segmentation = (gt_instance > 0).astype(np.int64)

        for b in range(batch_size):
            unique_id_mapping = {}
            for t in range(sequence_length):
                result = self._panoptic_metrics(
                    pred_segmentation[b, t], pred_instance[b, t],
                    gt_segmentation[b, t], gt_instance[b, t], unique_id_mapping)
                self.iou += result['iou']
                self.true_positive += result['true_positive']
                self.false_positive += result['false_positive']
                self.false_negative += result['false_negative']

    def compute(self):
        denominator = np.maximum(
            self.true_positive + self.false_positive / 2 + self.false_negative / 2, 1.0)
        pq = self.iou / denominator
        sq = self.iou / np.maximum(self.true_positive, 1.0)
        rq = self.true_positive / denominator
        return {
            'pq': pq, 'sq': sq, 'rq': rq,
            'denominator': (self.true_positive + self.false_positive / 2
                            + self.false_negative / 2),
        }

    def _panoptic_metrics(self, pred_segmentation, pred_instance, gt_segmentation,
                          gt_instance, unique_id_mapping):
        n_classes = self.n_classes
        result = {key: np.zeros(n_classes) for key in
                  ['iou', 'true_positive', 'false_positive', 'false_negative']}

        n_instances = int(max(pred_instance.max(), gt_instance.max()))
        n_all_things = n_instances + n_classes
        n_things_and_void = n_all_things + 1

        prediction, pred_to_cls = self._combine_mask(
            pred_segmentation, pred_instance, n_classes, n_all_things)
        target, target_to_cls = self._combine_mask(
            gt_segmentation, gt_instance, n_classes, n_all_things)

        # confusion via joint bincount (reference metrics.py:167-172)
        x = prediction + n_things_and_void * target
        bincount_2d = np.bincount(x, minlength=n_things_and_void ** 2)
        conf = bincount_2d.reshape(n_things_and_void, n_things_and_void)
        conf = conf[1:, 1:]  # drop void

        union = conf.sum(0)[None] + conf.sum(1)[:, None] - conf
        iou = np.where(union > 0, (conf + 1e-9) / (union + 1e-9), 0.0)

        mapping = np.argwhere(iou > 0.5)  # (k, 2): [target_id, pred_id]
        is_matching = pred_to_cls[mapping[:, 1]] == target_to_cls[mapping[:, 0]]
        mapping = mapping[is_matching]
        tp_mask = np.zeros_like(conf, dtype=bool)
        tp_mask[mapping[:, 0], mapping[:, 1]] = True

        for target_id, pred_id in mapping:
            cls_id = pred_to_cls[pred_id]
            if (self.temporally_consistent and cls_id == self.vehicles_id
                    and target_id in unique_id_mapping
                    and unique_id_mapping[target_id] != pred_id):
                # temporally inconsistent match: penalise (metrics.py:195-201)
                result['false_negative'][target_to_cls[target_id]] += 1
                result['false_positive'][pred_to_cls[pred_id]] += 1
                unique_id_mapping[target_id] = pred_id
                continue
            result['true_positive'][cls_id] += 1
            result['iou'][cls_id] += iou[target_id, pred_id]
            unique_id_mapping[target_id] = pred_id

        for target_id in range(n_classes, n_all_things):
            if tp_mask[target_id, n_classes:].any():
                continue
            if target_to_cls[target_id] != -1:
                result['false_negative'][target_to_cls[target_id]] += 1

        for pred_id in range(n_classes, n_all_things):
            if tp_mask[n_classes:, pred_id].any():
                continue
            if pred_to_cls[pred_id] != -1 and (conf[:, pred_id] > 0).any():
                result['false_positive'][pred_to_cls[pred_id]] += 1

        return result

    def _combine_mask(self, segmentation, instance, n_classes, n_all_things):
        """Shift thing ids past the class ids, combine stuff+things into one mask.

        Reference: metrics.py:225-255.
        """
        instance = instance.reshape(-1).astype(np.int64)
        instance_mask = instance > 0
        instance = instance - 1 + n_classes

        segmentation = segmentation.reshape(-1).astype(np.int64).copy()
        segmentation_mask = segmentation < n_classes  # remove void pixels

        keep = instance_mask & segmentation_mask
        instance_id_to_class = -np.ones(n_all_things, dtype=np.int64)
        instance_id_to_class[instance[keep]] = segmentation[keep]
        instance_id_to_class[np.arange(n_classes)] = np.arange(n_classes)

        segmentation[instance_mask] = instance[instance_mask]
        segmentation += 1
        segmentation[~segmentation_mask] = 0
        return segmentation, instance_id_to_class


def iou_update_jnp(prediction, target, n_classes):
    """Jittable per-class (tp, fp, fn, support) for accumulating on device."""
    prediction = prediction.reshape(-1)
    target = target.reshape(-1)
    classes = jnp.arange(n_classes)
    pred_c = prediction[None, :] == classes[:, None]
    tgt_c = target[None, :] == classes[:, None]
    tp = jnp.sum(pred_c & tgt_c, axis=1)
    fp = jnp.sum(pred_c & ~tgt_c, axis=1)
    fn = jnp.sum(~pred_c & tgt_c, axis=1)
    sup = jnp.sum(tgt_c, axis=1)
    return jnp.stack([tp, fp, fn, sup]).astype(jnp.float32)

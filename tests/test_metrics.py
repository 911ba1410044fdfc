"""IoU metric: vectorised accumulator vs a transliteration of the
reference's per-point Python loop (eval_noise.py:23-72)."""
import numpy as np

from r3dfsseg_tpu.utils.metrics import IoUAccumulator, evaluate_metric


def _reference_metric(pred_list, gt_list, l2c_list, test_classes):
    num = len(test_classes) + 1
    gt_classes = [0] * num
    positive = [0] * num
    tp = [0] * num
    for preds, gts, l2c in zip(pred_list, gt_list, l2c_list):
        for j in range(preds.shape[0]):
            for k in range(preds.shape[1]):
                gt = int(gts[j, k]); pr = int(preds[j, k])
                gi = 0 if gt == 0 else test_classes.index(l2c[gt - 1]) + 1
                pi = 0 if pr == 0 else test_classes.index(l2c[pr - 1]) + 1
                gt_classes[gi] += 1
                positive[pi] += 1
                tp[gi] += int(gt == pr)
    ious = [tp[c] / float(gt_classes[c] + positive[c] - tp[c])
            for c in range(num)]
    return np.asarray(ious[1:]).mean()


def test_iou_matches_reference_loop(rng):
    test_classes = [3, 7, 9, 11]
    preds, gts, l2cs = [], [], []
    for _ in range(4):
        l2c = rng.choice(test_classes, 2, replace=False).tolist()
        preds.append(rng.integers(0, 3, size=(2, 50)))
        gts.append(rng.integers(0, 3, size=(2, 50)))
        l2cs.append(l2c)
    want = _reference_metric(preds, gts, l2cs, test_classes)
    got = evaluate_metric(preds, gts, l2cs, test_classes)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_streaming_equals_batch(rng):
    test_classes = [1, 2]
    acc = IoUAccumulator(test_classes)
    preds, gts = [], []
    for _ in range(3):
        p = rng.integers(0, 3, size=(2, 20)); g = rng.integers(0, 3, size=(2, 20))
        preds.append(p); gts.append(g)
        acc.update(p, g, np.asarray([1, 2]))
    batch = evaluate_metric(preds, gts, [np.asarray([1, 2])] * 3, test_classes)
    np.testing.assert_allclose(acc.mean_iou(), batch)

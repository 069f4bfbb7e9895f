import numpy as np

from aldi_tpu.engine.coco_eval import evaluate_detections, _iou_xywh


def test_iou_xywh_basic():
    d = np.array([[0, 0, 10, 10]], float)
    g = np.array([[0, 0, 10, 10], [5, 0, 10, 10]], float)
    iou = _iou_xywh(d, g, np.array([False, False]))
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 50 / 150)


def test_iou_crowd_uses_det_area():
    d = np.array([[0, 0, 10, 10]], float)
    g = np.array([[0, 0, 100, 100]], float)
    iou = _iou_xywh(d, g, np.array([True]))
    np.testing.assert_allclose(iou[0, 0], 1.0)  # inter / det area


def _gt(bbox, cat=0, crowd=0):
    return {"bbox": bbox, "category_id": cat, "iscrowd": crowd,
            "area": bbox[2] * bbox[3]}


def _det(bbox, score, cat=0):
    return {"bbox": bbox, "score": score, "category_id": cat}


def test_perfect_predictions_ap100():
    anns = {
        1: [_gt([10, 10, 50, 50]), _gt([100, 100, 40, 40], cat=1)],
        2: [_gt([0, 0, 30, 60])],
    }
    preds = {
        1: [_det([10, 10, 50, 50], 0.9), _det([100, 100, 40, 40], 0.8, cat=1)],
        2: [_det([0, 0, 30, 60], 0.95)],
    }
    res = evaluate_detections(preds, anns, [0, 1])
    assert abs(res["bbox/AP"] - 100.0) < 1e-6
    assert abs(res["bbox/AP50"] - 100.0) < 1e-6


def test_no_predictions_ap0():
    anns = {1: [_gt([10, 10, 50, 50])]}
    res = evaluate_detections({}, anns, [0])
    assert res["bbox/AP"] == 0.0


def test_half_recall():
    # 2 gts, 1 perfect detection -> precision 1 at recall .5, 0 beyond
    anns = {1: [_gt([10, 10, 50, 50]), _gt([200, 200, 50, 50])]}
    preds = {1: [_det([10, 10, 50, 50], 0.9)]}
    res = evaluate_detections(preds, anns, [0])
    # 101-pt interpolation: precision 1 for recall 0..0.5 (51 points)
    expected = 51 / 101 * 100
    assert abs(res["bbox/AP50"] - expected) < 1e-6


def test_false_positive_lowers_precision():
    anns = {1: [_gt([10, 10, 50, 50])]}
    preds = {
        1: [
            _det([300, 300, 20, 20], 0.95),  # FP ranked first
            _det([10, 10, 50, 50], 0.9),
        ]
    }
    res = evaluate_detections(preds, anns, [0])
    # precision at full recall is 0.5; envelope -> AP50 = 50
    assert abs(res["bbox/AP50"] - 50.0) < 1e-6


def test_localization_quality_separates_ap50_ap75():
    # IoU ~0.6 detection: counts at 0.5 threshold, not at 0.75
    anns = {1: [_gt([0, 0, 100, 100])]}
    preds = {1: [_det([0, 0, 75, 100], 0.9)]}  # IoU = .75/1.0 = 0.75- eps?
    # width 75 -> inter 7500, union 10000 -> IoU 0.75 exactly; use 70
    preds = {1: [_det([0, 0, 70, 100], 0.9)]}  # IoU 0.7
    res = evaluate_detections(preds, anns, [0])
    assert res["bbox/AP50"] > 99.0
    assert res["bbox/AP75"] == 0.0


def test_crowd_gt_ignored_not_counted():
    anns = {1: [_gt([10, 10, 50, 50]), _gt([100, 100, 80, 80], crowd=1)]}
    preds = {1: [
        _det([10, 10, 50, 50], 0.9),
        _det([100, 100, 80, 80], 0.85),  # matches crowd -> ignored, not FP
    ]}
    res = evaluate_detections(preds, anns, [0])
    assert abs(res["bbox/AP50"] - 100.0) < 1e-6


def test_duplicate_detections_are_fps():
    anns = {1: [_gt([10, 10, 50, 50])]}
    preds = {1: [
        _det([10, 10, 50, 50], 0.9),
        _det([11, 11, 50, 50], 0.8),  # duplicate -> FP
    ]}
    res = evaluate_detections(preds, anns, [0])
    # recall 1 reached at precision 1 (first det), duplicate lowers nothing
    # past the envelope
    assert abs(res["bbox/AP50"] - 100.0) < 1e-6

"""Reference oracle: a direct transcription of pycocotools' COCOeval bbox
protocol (cocoeval.py: computeIoU / evaluateImg / accumulate), kept
deliberately loop-for-loop faithful to the published algorithm rather than
vectorized, so it can serve as an independent cross-check for
aldi_tpu/engine/coco_eval.py (the reference evaluates through pycocotools,
aldi/helpers.py:65-81).

Inputs mirror evaluate_detections(): dicts of per-image det/gt lists.
"""

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DET = 100
AREA_RNGS = {
    "all": [0.0, 1e10],
    "small": [0.0, 32.0 ** 2],
    "medium": [32.0 ** 2, 96.0 ** 2],
    "large": [96.0 ** 2, 1e10],
}


def _iou(d, g, iscrowd):
    """maskUtils.iou for xywh boxes."""
    ious = np.zeros((len(d), len(g)))
    for j, gb in enumerate(g):
        gx0, gy0, gw, gh = gb
        ga = gw * gh
        for i, db in enumerate(d):
            dx0, dy0, dw, dh = db
            da = dw * dh
            ix = min(dx0 + dw, gx0 + gw) - max(dx0, gx0)
            iy = min(dy0 + dh, gy0 + gh) - max(dy0, gy0)
            if ix <= 0 or iy <= 0:
                continue
            inter = ix * iy
            union = da if iscrowd[j] else da + ga - inter
            if union > 0:
                ious[i, j] = inter / union
    return ious


def _evaluate_img(dts, gts, a_rng):
    """COCOeval.evaluateImg, bbox, one (img, cat, areaRng), maxDet=100."""
    if len(dts) == 0 and len(gts) == 0:
        return None
    gts = [dict(g) for g in gts]
    dts = [dict(d) for d in dts]
    for g in gts:
        g.setdefault("area", g["bbox"][2] * g["bbox"][3])
        ign = g.get("ignore", 0) or g.get("iscrowd", 0)
        g["_ignore"] = 1 if (
            ign or g["area"] < a_rng[0] or g["area"] > a_rng[1]
        ) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[:MAX_DET]]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
    ious = _iou([d["bbox"] for d in dts], [g["bbox"] for g in gts], iscrowd)

    T, G, D = len(IOU_THRS), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    if len(ious):
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dts):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gts):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = 1 + m  # gt id stand-in
                gtm[tind, m] = 1 + dind
    a = np.array(
        [
            d["bbox"][2] * d["bbox"][3] < a_rng[0]
            or d["bbox"][2] * d["bbox"][3] > a_rng[1]
            for d in dts
        ]
    ).reshape((1, len(dts)))
    dt_ig = np.logical_or(
        dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0))
    )
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def evaluate_oracle(predictions, annotations, category_ids):
    """COCOeval.evaluate + accumulate + summarize (bbox AP metrics only)."""
    img_ids = sorted(annotations.keys())
    K, T, R = len(category_ids), len(IOU_THRS), len(REC_THRS)
    out = {}
    precisions = {}
    for a_name, a_rng in AREA_RNGS.items():
        precision = -np.ones((T, R, K))
        for k, cat in enumerate(category_ids):
            evals = []
            for img in img_ids:
                dts = [d for d in predictions.get(img, [])
                       if d["category_id"] == cat]
                gts = [g for g in annotations.get(img, [])
                       if g["category_id"] == cat]
                evals.append(_evaluate_img(dts, gts, a_rng))
            evals = [e for e in evals if e is not None]
            if not evals:
                continue
            dt_scores = np.concatenate([e["dtScores"] for e in evals])
            inds = np.argsort(-dt_scores, kind="mergesort")
            dtm = np.concatenate([e["dtMatches"] for e in evals], 1)[:, inds]
            dt_ig = np.concatenate([e["dtIgnore"] for e in evals], 1)[:, inds]
            gt_ig = np.concatenate([e["gtIgnore"] for e in evals])
            npig = np.count_nonzero(gt_ig == 0)
            if npig == 0:
                continue
            tps = np.logical_and(dtm, np.logical_not(dt_ig))
            fps = np.logical_and(
                np.logical_not(dtm), np.logical_not(dt_ig)
            )
            tp_sum = np.cumsum(tps, 1).astype(float)
            fp_sum = np.cumsum(fps, 1).astype(float)
            for t in range(T):
                tp, fp = tp_sum[t], fp_sum[t]
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                q = np.zeros((R,))
                pr = pr.tolist()
                q = q.tolist()
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds2 = np.searchsorted(rc, REC_THRS, side="left")
                try:
                    for ri, pi in enumerate(inds2):
                        q[ri] = pr[pi]
                except IndexError:
                    pass
                precision[t, :, k] = np.array(q)
        precisions[a_name] = precision

    def mean_p(p):
        valid = p[p > -1]
        return float(valid.mean() * 100) if valid.size else float("nan")

    out["bbox/AP"] = mean_p(precisions["all"])
    out["bbox/AP50"] = mean_p(precisions["all"][0])
    out["bbox/AP75"] = mean_p(precisions["all"][5])
    out["bbox/APs"] = mean_p(precisions["small"])
    out["bbox/APm"] = mean_p(precisions["medium"])
    out["bbox/APl"] = mean_p(precisions["large"])
    return out

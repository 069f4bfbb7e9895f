"""A tiny fixed batch with real visual signal for learning-signal tests:
shape-coded classes (0=filled rect, 1=ring, 2=cross) drawn in bright colors
on dark noise. Shape coding survives the color-jitter/grayscale strong
augmentations, so a correct loss implementation must overfit it."""

import numpy as np


def make_learnable_batch(n=4, canvas=(128, 128), max_gt=8, seed=0):
    rng = np.random.default_rng(seed)
    h, w = canvas
    images = rng.uniform(0, 40, (n, h, w, 3)).astype(np.float32)
    boxes = np.zeros((n, max_gt, 4), np.float32)
    classes = np.zeros((n, max_gt), np.int32)
    valid = np.zeros((n, max_gt), bool)
    for i in range(n):
        for j in range(3):
            bw, bh = rng.integers(28, 56, 2)
            x0 = rng.integers(0, w - bw)
            y0 = rng.integers(0, h - bh)
            c = int(rng.integers(0, 3))
            col = rng.uniform(150, 255, 3)
            if c == 0:
                images[i, y0:y0 + bh, x0:x0 + bw] = col
            elif c == 1:
                images[i, y0:y0 + bh, x0:x0 + bw] = col
                t = 6
                images[i, y0 + t:y0 + bh - t, x0 + t:x0 + bw - t] = 20.0
            else:
                cy, cx = y0 + bh // 2, x0 + bw // 2
                images[i, cy - 4:cy + 4, x0:x0 + bw] = col
                images[i, y0:y0 + bh, cx - 4:cx + 4] = col
            boxes[i, j] = [x0, y0, x0 + bw, y0 + bh]
            classes[i, j] = c
            valid[i, j] = True
    sizes = np.tile([[h, w]], (n, 1)).astype(np.int32)
    return images, sizes, boxes, classes, valid


def as_train_batch(images, sizes, boxes, classes, valid, with_unlabeled=False):
    import jax.numpy as jnp

    canvas = images.shape[1:3]
    batch = {
        "labeled": {
            "image": jnp.asarray(images), "sizes": jnp.asarray(sizes),
            "boxes": jnp.asarray(boxes), "classes": jnp.asarray(classes),
            "valid": jnp.asarray(valid),
        },
        "unlabeled": (
            {"image": jnp.asarray(images), "sizes": jnp.asarray(sizes)}
            if with_unlabeled
            else {"image": jnp.zeros((0, *canvas, 3)),
                  "sizes": jnp.zeros((0, 2), np.int32)}
        ),
    }
    return batch


def ap50_on_batch(det, variables, images, sizes, boxes, classes, valid,
                  category_ids=(0, 1, 2)):
    """Run forward_inference and score AP on the same batch (train-set AP)."""
    import jax
    import jax.numpy as jnp

    from aldi_tpu.engine.coco_eval import evaluate_detections

    pb, ps, pc, pv = jax.device_get(jax.jit(det.forward_inference)(
        variables, jnp.asarray(images), jnp.asarray(sizes)))
    preds, anns = {}, {}
    for i in range(images.shape[0]):
        preds[i] = [
            {"bbox": [b[0], b[1], b[2] - b[0], b[3] - b[1]],
             "score": float(s), "category_id": int(c)}
            for b, s, c, v in zip(pb[i], ps[i], pc[i], pv[i]) if v
        ]
        anns[i] = [
            {"bbox": [b[0], b[1], b[2] - b[0], b[3] - b[1]],
             "category_id": int(c), "iscrowd": 0}
            for b, c, v in zip(boxes[i], classes[i], valid[i]) if v
        ]
    return evaluate_detections(preds, anns, list(category_ids))

import numpy as np
import jax.numpy as jnp

from aldi_tpu.ops.roi_align import roi_align, assign_levels


def naive_roi_align_single_level(feat, box, out_size, sr, scale):
    """Oracle: torchvision-style aligned ROIAlign on one [H, W, C] level."""
    h, w, c = feat.shape
    x0 = box[0] * scale - 0.5
    y0 = box[1] * scale - 0.5
    x1 = box[2] * scale - 0.5
    y1 = box[3] * scale - 0.5
    bw = (x1 - x0) / out_size
    bh = (y1 - y0) / out_size
    out = np.zeros((out_size, out_size, c), np.float64)

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = max(y, 0.0)
        x = max(x, 0.0)
        yl, xl = int(y), int(x)
        if yl >= h - 1:
            yl = yh = h - 1
            y = float(yl)
        else:
            yh = yl + 1
        if xl >= w - 1:
            xl = xh = w - 1
            x = float(xl)
        else:
            xh = xl + 1
        ly, lx = y - yl, x - xl
        hy, hx = 1 - ly, 1 - lx
        return (
            hy * hx * feat[yl, xl]
            + hy * lx * feat[yl, xh]
            + ly * hx * feat[yh, xl]
            + ly * lx * feat[yh, xh]
        )

    for py in range(out_size):
        for px in range(out_size):
            acc = np.zeros(c)
            for iy in range(sr):
                for ix in range(sr):
                    y = y0 + (py + (iy + 0.5) / sr) * bh
                    x = x0 + (px + (ix + 0.5) / sr) * bw
                    acc += bilinear(y, x)
            out[py, px] = acc / (sr * sr)
    return out


def test_roi_align_matches_naive_single_level():
    rng = np.random.default_rng(7)
    feat = rng.normal(size=(16, 24, 8)).astype(np.float32)
    # small boxes so they map to the lone level (stride 4)
    boxes = np.asarray(
        [[4.0, 4.0, 40.0, 30.0], [0.0, 0.0, 12.5, 17.2], [30.0, 20.0, 90.0, 60.0]],
        np.float32,
    )
    got = np.asarray(
        roi_align(
            [jnp.asarray(feat)],
            jnp.asarray(boxes),
            jnp.ones(3, bool),
            strides=[4],
            output_size=7,
            sampling_ratio=2,
        )
    )
    for i, b in enumerate(boxes):
        want = naive_roi_align_single_level(feat, b, 7, 2, 1.0 / 4)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)


def test_roi_align_invalid_boxes_zero():
    feat = jnp.ones((8, 8, 4))
    boxes = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
    out = roi_align([feat], boxes, jnp.zeros(1, bool), strides=[4])
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_assign_levels_canonical():
    # area 224^2 -> canonical level 4 (p4); tiny -> clamped to p2; huge -> p5
    boxes = jnp.asarray(
        [
            [0, 0, 224, 224],
            [0, 0, 8, 8],
            [0, 0, 1000, 1000],
        ],
        jnp.float32,
    )
    lvl = np.asarray(assign_levels(boxes, min_level=2, max_level=5))
    np.testing.assert_array_equal(lvl, [2, 0, 3])  # offsets from min_level


def test_roi_align_multilevel_routing():
    # two levels with distinct constant values; check each box reads its level
    f2 = jnp.full((32, 32, 2), 1.0)  # stride 4
    f3 = jnp.full((16, 16, 2), 2.0)  # stride 8
    # small box -> level assigned min; big box -> higher level
    boxes = jnp.asarray([[8, 8, 40, 40], [0, 0, 127.9, 127.9]], jnp.float32)
    out = roi_align([f2, f3], boxes, jnp.ones(2, bool), strides=[4, 8])
    lvl = np.asarray(assign_levels(boxes, 2, 3))
    vals = np.asarray(out).mean(axis=(1, 2, 3))
    want = np.where(lvl == 0, 1.0, 2.0)
    np.testing.assert_allclose(vals, want, rtol=1e-5)


def test_slice2x2_mode_matches_corner_gather():
    rng = np.random.default_rng(3)
    feats = [
        jnp.asarray(rng.normal(size=(32, 48, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 24, 8)).astype(np.float32)),
    ]
    boxes = jnp.asarray(rng.uniform(0, 120, (6, 4)).astype(np.float32))
    boxes = boxes.at[:, 2:].add(30)
    valid = jnp.asarray([True] * 5 + [False])
    a = roi_align(feats, boxes, valid, [4, 8], mode="corner_gather")
    b = roi_align(feats, boxes, valid, [4, 8], mode="slice2x2")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)

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


def test_fused_mode_matches_corner_gather_forward():
    rng = np.random.default_rng(4)
    feats = [
        jnp.asarray(rng.normal(size=(32, 48, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 24, 8)).astype(np.float32)),
    ]
    boxes = jnp.asarray(rng.uniform(0, 120, (6, 4)).astype(np.float32))
    boxes = boxes.at[:, 2:].add(30)
    valid = jnp.asarray([True] * 5 + [False])
    a = roi_align(feats, boxes, valid, [4, 8], mode="corner_gather")
    b = roi_align(feats, boxes, valid, [4, 8], mode="fused")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_fused_mode_feature_grads_match_corner_gather():
    import jax

    rng = np.random.default_rng(5)
    feats = [
        jnp.asarray(rng.normal(size=(32, 48, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 24, 4)).astype(np.float32)),
    ]
    boxes = jnp.asarray(rng.uniform(0, 120, (5, 4)).astype(np.float32))
    boxes = boxes.at[:, 2:].add(30)
    valid = jnp.asarray([True, True, True, True, False])
    # weighted sum as loss so the cotangent is non-uniform
    w = jnp.asarray(rng.normal(size=(5, 7, 7, 4)).astype(np.float32))

    def loss(fs, mode):
        out = roi_align(fs, boxes, valid, [4, 8], mode=mode)
        return (out * w).sum()

    g_ref = jax.grad(lambda fs: loss(fs, "corner_gather"))(feats)
    g_fused = jax.grad(lambda fs: loss(fs, "fused"))(feats)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_fused_mode_box_grads_are_zero():
    import jax

    feats = [jnp.ones((16, 16, 2), jnp.float32)]
    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0]])
    valid = jnp.ones(1, bool)

    g = jax.grad(
        lambda b: roi_align(feats, b, valid, [4], mode="fused").sum()
    )(boxes)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_pallas_kernel_matches_corner_gather():
    """Pallas ROIAlign (interpret mode on CPU) vs the XLA corner-gather
    formulation, on both the VMEM-resident and footprint-DMA paths."""
    import aldi_tpu.ops.pallas_roi_align as pra

    rng = np.random.default_rng(11)
    feats = [
        jnp.asarray(rng.normal(size=(64, 96, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(32, 48, 8)).astype(np.float32)),
    ]
    x0 = rng.uniform(0, 300, (16, 1)).astype(np.float32)
    y0 = rng.uniform(0, 180, (16, 1)).astype(np.float32)
    w = rng.uniform(20, 120, (16, 1)).astype(np.float32)
    h = rng.uniform(20, 120, (16, 1)).astype(np.float32)
    boxes = np.concatenate([x0, y0, x0 + w, y0 + h], axis=1)
    # extreme-aspect boxes exercise the multi-chunk window walk (wide,
    # tall, and a full-extent sliver on the fine level)
    boxes[0] = [2.0, 10.0, 370.0, 22.0]     # flat: many x chunks
    boxes[1] = [30.0, 3.0, 44.0, 250.0]     # narrow: many y chunks
    boxes[2] = [0.0, 100.0, 383.0, 104.0]   # full-width sliver
    boxes[3] = [100.0, 90.0, 230.0, 212.0]  # 2x2 chunk square
    boxes = jnp.asarray(boxes)
    valid = jnp.asarray([True] * 14 + [False, True])

    ref = roi_align(feats, boxes, valid, [4, 8], mode="corner_gather")

    # default: both levels take the chunked-DMA fine path
    out_fine = pra.roi_align_pallas(feats, boxes, valid, [4, 8],
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out_fine), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # force the VMEM-resident path (level smaller than one chunk)
    saved = pra.CHUNK_Y, pra.CHUNK_X
    try:
        pra.CHUNK_Y, pra.CHUNK_X = 128, 128
        out_res = pra.roi_align_pallas(feats, boxes, valid, [4, 8],
                                       interpret=True)
    finally:
        pra.CHUNK_Y, pra.CHUNK_X = saved
    np.testing.assert_allclose(np.asarray(out_res), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_batched_kernel_matches_per_image():
    """Batch-in-grid Pallas ROIAlign (one pallas_call chain per level for
    the whole batch, per-box image index in scalar prefetch) vs the
    per-image kernel and the XLA corner-gather reference, both paths."""
    import aldi_tpu.ops.pallas_roi_align as pra
    from aldi_tpu.ops.roi_align import roi_align_batched

    rng = np.random.default_rng(23)
    b = 3
    feats = [
        jnp.asarray(rng.normal(size=(b, 64, 96, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, 32, 48, 8)).astype(np.float32)),
    ]
    x0 = rng.uniform(0, 300, (b, 12, 1)).astype(np.float32)
    y0 = rng.uniform(0, 180, (b, 12, 1)).astype(np.float32)
    w = rng.uniform(20, 120, (b, 12, 1)).astype(np.float32)
    h = rng.uniform(20, 120, (b, 12, 1)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([x0, y0, x0 + w, y0 + h], axis=2))
    valid = jnp.asarray(rng.random((b, 12)) > 0.2)

    ref = roi_align_batched(feats, boxes, valid, [4, 8],
                            mode="corner_gather")

    out = pra.roi_align_pallas_batched(feats, boxes, valid, [4, 8],
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # the per-image wrapper must agree image by image
    for i in range(b):
        one = pra.roi_align_pallas([f[i] for f in feats], boxes[i],
                                   valid[i], [4, 8], interpret=True)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(one),
                                   rtol=1e-5, atol=1e-5)

    # resident path (levels smaller than one chunk)
    saved = pra.CHUNK_Y, pra.CHUNK_X
    try:
        pra.CHUNK_Y, pra.CHUNK_X = 128, 128
        out_res = pra.roi_align_pallas_batched(feats, boxes, valid, [4, 8],
                                               interpret=True)
    finally:
        pra.CHUNK_Y, pra.CHUNK_X = saved
    np.testing.assert_allclose(np.asarray(out_res), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_fused_batched_grads_match_xla():
    """The batched pallas_fused custom-vjp backward (vmapped corner
    scatter) must match the corner-gather autodiff gradient."""
    from aldi_tpu.ops import roi_align as ra
    import aldi_tpu.ops.pallas_roi_align as pra

    rng = np.random.default_rng(31)
    b = 2
    feats = [
        jnp.asarray(rng.normal(size=(b, 16, 24, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, 8, 12, 4)).astype(np.float32)),
    ]
    boxes = jnp.asarray(
        [[[4.0, 4.0, 40.0, 30.0], [10.0, 8.0, 80.0, 60.0]],
         [[2.0, 6.0, 30.0, 44.0], [20.0, 10.0, 70.0, 50.0]]],
        jnp.float32,
    )
    valid = jnp.ones((b, 2), bool)
    co = jnp.asarray(rng.normal(size=(b, 2, 7, 7, 4)).astype(np.float32))

    def loss(mode, fs):
        out = ra.roi_align_batched(fs, boxes, valid, [4, 8], mode=mode)
        return (out * co).sum()

    import jax

    g_ref = jax.grad(lambda fs: loss("corner_gather", fs))(feats)
    # interpret mode: route the fused forward through interpret so the
    # custom-vjp pair runs on CPU
    orig = pra.roi_align_pallas_batched
    try:
        pra.roi_align_pallas_batched = lambda *a, **k: orig(
            *a, **{**k, "interpret": True}
        )
        g_pal = jax.grad(lambda fs: loss("pallas_fused", fs))(feats)
    finally:
        pra.roi_align_pallas_batched = orig
    for a, c in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_auto_mode_guards_unaligned_channels():
    """"auto" only picks the Pallas kernels when C is a 128-lane multiple:
    Mosaic cannot lower the fine-path [CY, CX, C] -> [CY, CX*C] reshape for
    unaligned C (caught by the bench kernels smoke on real hardware), so
    auto falls back to corner_gather instead of failing at compile.
    Explicit pallas requests are honored unchanged."""
    from aldi_tpu.ops.dispatch import force_backend
    from aldi_tpu.ops.roi_align import _auto_safe_mode, resolve_pool_mode

    with force_backend("tpu"):
        resolved = resolve_pool_mode("auto")
        assert resolved == "pallas_fused"
        assert _auto_safe_mode("auto", resolved, 256) == "pallas_fused"
        assert _auto_safe_mode("auto", resolved, 32) == "corner_gather"
        # explicit request: caller asked for the kernel, keep it
        assert _auto_safe_mode("pallas_fused", "pallas_fused", 32) \
            == "pallas_fused"
    with force_backend("cpu"):
        assert _auto_safe_mode("auto", resolve_pool_mode("auto"), 32) \
            == "corner_gather"

import numpy as np
import jax.numpy as jnp

from aldi_tpu.ops import boxes as B


def naive_iou(a, b):
    out = np.zeros((len(a), len(b)))
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            ix0, iy0 = max(x[0], y[0]), max(x[1], y[1])
            ix1, iy1 = min(x[2], y[2]), min(x[3], y[3])
            inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
            area_a = (x[2] - x[0]) * (x[3] - x[1])
            area_b = (y[2] - y[0]) * (y[3] - y[1])
            u = area_a + area_b - inter
            out[i, j] = inter / u if u > 0 else 0
    return out


def random_boxes(n, size=100.0, rng=None):
    rng = rng or np.random.default_rng(0)
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pairwise_iou_matches_naive():
    rng = np.random.default_rng(42)
    a, b = random_boxes(13, rng=rng), random_boxes(7, rng=rng)
    got = np.asarray(B.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, naive_iou(a, b), rtol=1e-5, atol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    src = random_boxes(20, rng=rng)
    tgt = random_boxes(20, rng=rng)
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = B.encode_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
    rec = np.asarray(B.decode_deltas(deltas, jnp.asarray(src), w))
    np.testing.assert_allclose(rec, tgt, rtol=1e-4, atol=1e-3)


def test_decode_multiclass_layout():
    # [N, K*4] deltas against [N, 4] boxes -> [N, K*4]
    src = jnp.asarray(random_boxes(5))
    deltas = jnp.zeros((5, 12))
    out = B.decode_deltas(deltas, src, (1.0, 1.0, 1.0, 1.0))
    assert out.shape == (5, 12)
    # zero deltas = identity per class
    np.testing.assert_allclose(np.asarray(out[:, 4:8]), np.asarray(src), rtol=1e-5)


def test_clip_and_area():
    b = jnp.asarray([[-5.0, -5.0, 50.0, 200.0]])
    c = B.clip_boxes(b, (100, 60))
    np.testing.assert_allclose(np.asarray(c), [[0, 0, 50, 100]])
    assert float(B.box_area(c)[0]) == 50 * 100


def test_giou_range_and_identity():
    a = jnp.asarray(random_boxes(6))
    g = B.pairwise_giou(a, a)
    np.testing.assert_allclose(np.asarray(jnp.diag(g)), 1.0, atol=1e-5)
    assert float(g.min()) >= -1.0 - 1e-5

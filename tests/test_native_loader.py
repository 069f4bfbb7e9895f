import numpy as np
import pytest

from tests.synthetic_data import make_synthetic_coco

aldi_native = pytest.importorskip("aldi_native")


@pytest.fixture(scope="module")
def png_path(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native"))
    jp, ir = make_synthetic_coco(root, "ds", n_images=1, size=(96, 128))
    import os

    return os.path.join(ir, "img_0000.png")


def test_native_matches_pil_resize(png_path):
    from PIL import Image

    arr, h, w, scale = aldi_native.load_resize_pad(
        png_path, 64, 100, 128, 128, True, False
    )
    assert arr.shape == (128, 128, 3) and arr.dtype == np.uint8
    img = Image.open(png_path).convert("RGB")
    s = 64 / min(img.size)
    if max(img.size) * s > 100:
        s = 100 / max(img.size)
    nw, nh = int(img.size[0] * s + 0.5), int(img.size[1] * s + 0.5)
    assert (h, w) == (nh, nw)
    ref = np.asarray(img.resize((nw, nh), Image.BILINEAR), np.uint8)[:, :, ::-1]
    diff = np.abs(arr[:nh, :nw].astype(int) - ref.astype(int))
    assert diff.mean() < 1.5  # same sampling grid, different filter tails
    # padding stays zero
    assert not arr[nh:].any() and not arr[:, nw:].any()


def test_native_flip(png_path):
    a, h, w, _ = aldi_native.load_resize_pad(
        png_path, 64, 100, 128, 128, True, False
    )
    f, _, _, _ = aldi_native.load_resize_pad(
        png_path, 64, 100, 128, 128, True, True
    )
    np.testing.assert_array_equal(f[:h, :w], a[:h, :w][:, ::-1])


def test_native_missing_file_raises():
    with pytest.raises(IOError):
        aldi_native.load_resize_pad("/nonexistent.png", 64, 100, 128, 128,
                                    True, False)


def test_transform_record_uses_native(png_path):
    # the transform path should go through the native core when available
    # and produce a batch-contract-compatible record
    import os

    from aldi_tpu.data.transforms import transform_record

    rec = {
        "file_name": png_path,
        "image_id": 1,
        "height": 96,
        "width": 128,
        "annotations": [
            {"bbox": [10, 10, 30, 20], "category_id": 0, "iscrowd": 0,
             "area": 600}
        ],
    }
    rng = np.random.default_rng(0)
    out = transform_record(
        rec, rng, min_sizes=[64], max_size=100, canvas=(128, 128), max_gt=4
    )
    assert out["image"].shape == (128, 128, 3)
    assert out["valid"][0]
    b = out["boxes"][0]
    assert 0 <= b[0] < b[2] <= out["sizes"][1]

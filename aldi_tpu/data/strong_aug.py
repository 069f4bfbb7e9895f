"""Device-side strong augmentation, fused into the jitted train step.

The reference applies its strong recipe on CPU worker processes per record
(``aldi/aug.py:39-60``: color jitter x3 @0.8, grayscale @0.2, gaussian blur
@0.5, 3x random-erase @0.7/0.5/0.3, optional MIC masked-image block dropout
@ratio 0.5/block 32, ``aldi/aug.py:154-185``) and ships both weak and strong
copies over the host->device boundary. Here only the weak image crosses; the
strong view is derived on-device (strong = pixel-space f(weak); geometry is
shared, so GT boxes carry over), halving transfer volume and removing the
per-batch deepcopy (``aldi/dataloader.py:57-80``).

All functions take float images in 0..255 (any channel order) with shape
[B, H, W, 3] and a per-call PRNG key; everything is branchless (lax.select
by per-image bernoullis) so XLA sees one static graph.

Deliberate deviation: the reference's blur calls scipy ``gaussian_filter``
over all axes of HWC (blurring across channels); here the blur is spatial
only (separable H/W depthwise), the standard definition.
"""

import math

import jax
import jax.numpy as jnp

_GRAY = jnp.asarray([0.299, 0.587, 0.114])
_BLUR_RADIUS = 6  # covers 3*sigma at sigma_max=2.0

# (scale_lo, scale_hi, ratio_lo, ratio_hi, prob) per erase pass,
# reference ``aldi/aug.py:55-58``
ERASE_PASSES = (
    (0.05, 0.2, 0.3, 3.3, 0.7),
    (0.02, 0.2, 0.1, 6.0, 0.5),
    (0.02, 0.2, 0.05, 8.0, 0.3),
)


def _blend(src, dst, w):
    """D2 blend: src*(1-w) + dst*w, clipped to uint8 range."""
    return jnp.clip(src * (1.0 - w) + dst * w, 0.0, 255.0)


def color_jitter(key, img):
    """contrast/brightness/saturation jitter group @0.8 + grayscale @0.2."""
    k = jax.random.split(key, 6)
    do_jitter = jax.random.uniform(k[0]) < 0.8
    do_gray = jax.random.uniform(k[1]) < 0.2
    wc, wb, ws = (
        jax.random.uniform(k[i], minval=0.6, maxval=1.4) for i in (2, 3, 4)
    )

    out = img
    # contrast: blend against global mean
    out_c = _blend(out.mean(), out, wc)
    # brightness: blend against black
    out_cb = _blend(0.0, out_c, wb)
    # saturation: blend against per-pixel grayscale
    gray = (out_cb * _GRAY).sum(-1, keepdims=True)
    out_cbs = _blend(gray, out_cb, ws)
    out = jnp.where(do_jitter, out_cbs, out)

    gray2 = jnp.broadcast_to((out * _GRAY).sum(-1, keepdims=True), out.shape)
    return jnp.where(do_gray, gray2, out)


def gaussian_blur(key, img):
    """Spatial gaussian blur @0.5 with sigma ~ U(0.1, 2.0)."""
    k1, k2 = jax.random.split(key)
    do_blur = jax.random.uniform(k1) < 0.5
    sigma = jax.random.uniform(k2, minval=0.1, maxval=2.0)

    xs = jnp.arange(-_BLUR_RADIUS, _BLUR_RADIUS + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (xs / sigma) ** 2)
    kern = kern / kern.sum()

    def sep_conv(x):
        # x: [H, W, C]; reflect-pad then correlate along each spatial axis
        p = _BLUR_RADIUS
        xh = jnp.pad(x, ((p, p), (0, 0), (0, 0)), mode="reflect")
        x1 = sum(
            xh[i : i + x.shape[0]] * kern[i] for i in range(2 * p + 1)
        )
        xw = jnp.pad(x1, ((0, 0), (p, p), (0, 0)), mode="reflect")
        return sum(
            xw[:, i : i + x.shape[1]] * kern[i] for i in range(2 * p + 1)
        )

    blurred = jnp.clip(sep_conv(img), 0.0, 255.0)
    return jnp.where(do_blur, blurred, img)


def random_erase(key, img, hw):
    """Three random-erase passes filling a random rect with noise."""
    h_img, w_img = hw[0].astype(jnp.float32), hw[1].astype(jnp.float32)
    area = h_img * w_img
    rows = jnp.arange(img.shape[0], dtype=jnp.float32)[:, None, None]
    cols = jnp.arange(img.shape[1], dtype=jnp.float32)[None, :, None]

    out = img
    keys = jax.random.split(key, len(ERASE_PASSES) + 1)
    noise = jax.random.uniform(keys[-1], img.shape) * 255.0
    for (sl, sh, r1, r2, prob), kk in zip(ERASE_PASSES, keys[:-1]):
        ks = jax.random.split(kk, 5)
        do = jax.random.uniform(ks[0]) < prob
        target_area = jax.random.uniform(ks[1], minval=sl, maxval=sh) * area
        aspect = jax.random.uniform(ks[2], minval=r1, maxval=r2)
        eh = jnp.clip(jnp.round(jnp.sqrt(target_area * aspect)), 1, h_img - 2)
        ew = jnp.clip(jnp.round(jnp.sqrt(target_area / aspect)), 1, w_img - 2)
        y0 = jax.random.uniform(ks[3]) * (h_img - eh - 1)
        x0 = jax.random.uniform(ks[4]) * (w_img - ew - 1)
        y0, x0 = jnp.floor(y0), jnp.floor(x0)
        mask = (
            (rows >= y0) & (rows < y0 + eh) & (cols >= x0) & (cols < x0 + ew)
        )
        out = jnp.where(do & mask, noise, out)
    return out


def mic_mask(key, img, block_size: int, ratio: float):
    """MIC masked-image consistency block dropout (reference
    ``aldi/aug.py:154-185``): drop ``ratio`` of block_size x block_size
    patches."""
    h, w = img.shape[0], img.shape[1]
    mh = max(1, round(h / block_size))
    mw = max(1, round(w / block_size))
    u = jax.random.uniform(key, (mh, mw))
    keep = (u > ratio).astype(img.dtype)
    # nearest-neighbor upsample to (h, w)
    ry = math.ceil(h / mh)
    rx = math.ceil(w / mw)
    keep = jnp.repeat(jnp.repeat(keep, ry, axis=0), rx, axis=1)[:h, :w]
    return img * keep[..., None]


def strong_augment(
    key,
    images: jnp.ndarray,  # [B, H, W, 3] float 0..255
    image_sizes: jnp.ndarray,  # [B, 2]
    include_erasing: bool = True,
    mic: bool = False,
    mic_ratio: float = 0.5,
    mic_block_size: int = 32,
) -> jnp.ndarray:
    """Full strong recipe, vmapped over the batch."""

    def one(k, img, hw):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        img = color_jitter(k1, img)
        img = gaussian_blur(k2, img)
        if include_erasing:
            img = random_erase(k3, img, hw)
        if mic:
            img = mic_mask(k4, img, mic_block_size, mic_ratio)
        return img

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(one)(keys, images.astype(jnp.float32), image_sizes)

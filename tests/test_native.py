"""Native host runtime tests: PNG codec round trips (cross-checked with
Pillow) and the C error-diffusion ditherer vs the NumPy specification."""

import io

import numpy as np
import pytest

from avir_tpu import native
from avir_tpu.models.host_reference import errdiff_dither as np_errdiff

from conftest import xorshift128_fill


requires_native = pytest.mark.skipif(
    not native.have_native(), reason="native library unavailable"
)


@requires_native
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_png_roundtrip(ch, dtype):
    img = xorshift128_fill((13, 17, ch), dtype, 42 + ch)
    data = native.png_encode(img)
    back = native.png_decode(data)
    np.testing.assert_array_equal(back, img)


@requires_native
def test_png_cross_pillow():
    from PIL import Image

    img = xorshift128_fill((21, 33, 3), np.uint8, 7)
    # Our encode -> Pillow decode.
    data = native.png_encode(img)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(pil, img)
    # Pillow encode -> our decode (Pillow may use any filters).
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    back = native.png_decode(buf.getvalue())
    np.testing.assert_array_equal(back.reshape(img.shape), img)


@requires_native
def test_errdiff_matches_numpy_spec():
    img = (
        xorshift128_fill((9, 14, 3), np.uint16, 5).astype(np.float64)
        / 257.0
    )
    a = native.errdiff_dither(img.copy(), 0, 255.0)
    b = np_errdiff(img.copy(), 0, 255.0)
    np.testing.assert_array_equal(a, b)
    a = native.errdiff_dither(img.copy(), 2, 255.0)
    b = np_errdiff(img.copy(), 2, 255.0)
    np.testing.assert_array_equal(a, b)

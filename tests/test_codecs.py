"""Pure-stdlib codec correctness: PNG (all filter types, grey/RGB/RGBA)
and WAV (16/8-bit int, float32 PCM) — the real decode path behind the
multimodal operators. No Spark session needed."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from vectordb_cloud_spark.functions.codecs import (
    CodecError,
    decode_image,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    png_dimensions,
    resize_nearest,
)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(1, 1, 3), (5, 7, 3), (16, 16, 4),
                                   (9, 3, 1), (4, 11)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(hash(shape) & 0xFFFF)
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(arr))
    want = arr.reshape(arr.shape[0], arr.shape[1]) if (arr.ndim == 3 and arr.shape[2] == 1) \
        else arr
    np.testing.assert_array_equal(out, want)


def test_png_dimensions_probe():
    arr = np.zeros((12, 34, 3), dtype=np.uint8)
    assert png_dimensions(encode_png(arr)) == (34, 12)


def _ref_encode_png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Test-local reference encoder that applies the GIVEN filter type per
    scanline (spec 6.x forward transform) — exercises decoder filters 1-4,
    which encode_png (always filter 0) never emits."""
    h, w, c = arr.shape
    prev = np.zeros(w * c, dtype=np.int64)
    out = bytearray()
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        enc = line.copy()
        for x in range(w * c):
            left = line[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if f == 1:
                enc[x] = (line[x] - left) % 256
            elif f == 2:
                enc[x] = (line[x] - up) % 256
            elif f == 3:
                enc[x] = (line[x] - ((left + up) >> 1)) % 256
            elif f == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                enc[x] = (line[x] - pred) % 256
        out += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = line

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(filters):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    payload = _ref_encode_png_with_filters(arr, filters)
    np.testing.assert_array_equal(decode_png(payload), arr)


def test_png_idat_split_across_chunks():
    """IDAT may legally be split at any byte boundary across chunks."""
    arr = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    full = encode_png(arr)
    # re-frame: split the single IDAT into two chunks
    (ihdr_len,) = struct.unpack(">I", full[8:12])
    ihdr_end = 8 + 8 + ihdr_len + 4
    (idat_len,) = struct.unpack(">I", full[ihdr_end:ihdr_end + 4])
    idat_body = full[ihdr_end + 8:ihdr_end + 8 + idat_len]
    mid = len(idat_body) // 2

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    refr = (full[:ihdr_end] + chunk(b"IDAT", idat_body[:mid])
            + chunk(b"IDAT", idat_body[mid:]) + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(refr), arr)


def test_png_rejects_bad_magic_and_unsupported():
    with pytest.raises(CodecError, match="magic"):
        decode_png(b"JFIF" + b"\x00" * 64)
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    good = bytearray(encode_png(arr))
    good[24] = 16  # bit depth byte in IHDR
    # fix nothing else; decoder must reject before CRC concerns
    with pytest.raises(CodecError, match="bit depth"):
        decode_png(bytes(good))
    with pytest.raises(CodecError, match="uint8"):
        encode_png(arr.astype(np.float32))


def test_decode_image_dispatches_png_and_rejects_others():
    arr = np.zeros((3, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_png(arr)), arr)
    with pytest.raises(CodecError):
        decode_image(b"\xff\xd8\xff\xe0 not-actually-jpeg")


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def test_wav_roundtrip_mono():
    t = np.arange(800) / 8000.0
    pcm = 0.5 * np.sin(2 * np.pi * 440 * t)
    out, rate = decode_wav(encode_wav(pcm, 8000))
    assert rate == 8000
    assert out.shape == pcm.shape
    np.testing.assert_allclose(out, pcm, atol=2.0 / 32767)


def test_wav_roundtrip_stereo():
    rng = np.random.default_rng(3)
    pcm = rng.uniform(-0.9, 0.9, (500, 2))
    out, rate = decode_wav(encode_wav(pcm, 16000))
    assert rate == 16000
    assert out.shape == (500, 2)
    np.testing.assert_allclose(out, pcm, atol=2.0 / 32767)


def test_wav_8bit_pcm():
    samples = bytes(range(256))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(samples)
    out, rate = decode_wav(buf.getvalue())
    assert out.min() >= -1.0 and out.max() <= 1.0
    assert out[128] == 0.0  # unsigned midpoint maps to 0


def test_wav_float32_pcm():
    pcm = np.linspace(-1, 1, 64, dtype="<f4")
    body = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
               + b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(body)) + body)
    out, rate = decode_wav(payload)
    assert rate == 8000
    np.testing.assert_allclose(out, pcm.astype(np.float64), rtol=1e-6)


def test_wav_rejects_garbage():
    with pytest.raises(CodecError):
        decode_wav(b"OggS" + b"\x00" * 40)


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

def test_resize_nearest_shapes_and_identity():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    np.testing.assert_array_equal(resize_nearest(arr, 6, 8), arr)  # no-op
    up = resize_nearest(arr, 12, 16)
    assert up.shape == (16, 12, 3)
    # 2x upscale with nearest = pixel replication
    np.testing.assert_array_equal(up[::2, ::2], arr)
    down = resize_nearest(arr, 3, 4)
    assert down.shape == (4, 3, 3)
    np.testing.assert_array_equal(down, arr[::2, ::2])


def test_avi_roundtrip_and_dimensions():
    import numpy as np

    from vectordb_cloud_spark.functions.codecs import (
        avi_dimensions,
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (21, 37, 3), dtype=np.uint8)
              for _ in range(7)]
    data = encode_avi(frames, fps=12)
    back, fps = decode_avi(data)
    assert fps == 12 and len(back) == 7
    for a, b in zip(frames, back):
        assert (a == b).all()
    assert avi_dimensions(data) == (37, 21, 7)


def test_avi_rejects_non_avi_and_compressed():
    import struct

    import numpy as np
    import pytest

    from vectordb_cloud_spark.functions.codecs import (
        CodecError,
        decode_avi,
        encode_avi,
    )

    with pytest.raises(CodecError, match="not an AVI"):
        decode_avi(b"garbage bytes that are not RIFF framed")
    # flip biCompression to MJPG in a valid container: loud, named failure
    rng = np.random.default_rng(3)
    data = bytearray(encode_avi(
        [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)], fps=5))
    i = bytes(data).index(b"strf") + 8
    # BITMAPINFOHEADER: biCompression at offset 16
    data[i + 16:i + 20] = struct.pack("<I", 0x47504A4D)
    with pytest.raises(CodecError, match="BI_RGB"):
        decode_avi(bytes(data))


def test_avi_odd_width_row_padding():
    """Odd widths force 4-byte row padding — the decode must strip it."""
    import numpy as np

    from vectordb_cloud_spark.functions.codecs import decode_avi, encode_avi

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)]  # 9B rows -> pad 12
    back, _ = decode_avi(encode_avi(frames, fps=4))
    assert (back[0] == frames[0]).all()

"""Real codec-free multimodal decode (round-6: VERDICT task 3).

PPM (P6/P3), 24-bit BMP, and PCM WAV decode are pure struct/numpy
parsing; the NotImplementedError boundary now covers only genuinely
compressed formats.  The Spark stages run the real path end-to-end:
decode → resample → re-encode PPM, and decode → real feature vectors.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sparkdon.multimodal import (
    audio_feature, decode_image, decode_wav, encode_ppm, extract_features,
    image_feature, resample_nearest, resize_images,
)


def make_rgb(h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(h * 1000 + w)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    data = samples.astype("<i2").tobytes()
    ch = samples.shape[1]
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_bmp(arr: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BI_RGB BMP."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in arr[::-1]:  # bottom-up
        raster += row[:, ::-1].tobytes()  # RGB -> BGR
        raster += b"\x00" * (stride - w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                       2835, 2835, 0, 0)
    return header + info + bytes(raster)


# -- pure decode ---------------------------------------------------------

def test_ppm_p6_roundtrip_with_comments():
    arr = make_rgb(5, 7)
    payload = b"P6 # cmt\n# another comment\n7 5\n255\n" + arr.tobytes()
    out = decode_image(payload)
    assert out.shape == (5, 7, 3)
    assert np.array_equal(out, arr)
    # encode half round-trips too
    assert np.array_equal(decode_image(encode_ppm(arr)), arr)


def test_ppm_p3_matches_p6():
    arr = make_rgb(3, 4)
    ascii_body = " ".join(str(int(x)) for x in arr.reshape(-1))
    payload = ("P3\n4 3\n255\n" + ascii_body).encode()
    assert np.array_equal(decode_image(payload), arr)


def test_ppm_maxval_scaling():
    # maxval 15 -> values scale to 0..255
    payload = b"P6\n1 1\n15\n" + bytes([15, 0, 7])
    out = decode_image(payload)
    assert out.tolist() == [[[255, 0, 119]]]


def test_bmp_24bit_decode():
    arr = make_rgb(4, 5)  # width 5 forces row padding (15 -> 16 bytes)
    assert np.array_equal(decode_image(make_bmp(arr)), arr)


def test_compressed_formats_still_raise():
    # JPEG decodes as of r9 (sparkdon/jpeg.py); a garbage body behind
    # the SOI magic is now a parse error, not a missing codec
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    with pytest.raises(ValueError):
        decode_image(jpeg)
    # unknown format (no decoder): still the honest boundary
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x00\x11unknown-format-bytes")
    with pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x00 not a wav")
    # malformed PNG (signature but no chunks) is a parse error, not a
    # missing codec
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_wav_pcm16_decode():
    t = np.arange(800)
    mono = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    samples = np.stack([mono, -mono], axis=1)
    got, rate = decode_wav(make_wav(samples))
    assert rate == 8000 and got.shape == (800, 2)
    assert np.array_equal(got, samples)


def test_resample_nearest_and_features():
    arr = make_rgb(10, 20)
    small = resample_nearest(arr, 5, 4)
    assert small.shape == (4, 5, 3)
    # upscale keeps the value set (nearest never interpolates)
    big = resample_nearest(arr, 40, 20)
    assert set(np.unique(big)) <= set(np.unique(arr))
    feat = image_feature(arr)
    assert len(feat) == 8 and abs(sum(feat) - 1.0) < 1e-9
    mono = np.zeros((100, 1), dtype=np.int16)
    af = audio_feature(mono, 8000)
    assert len(af) == 8 and af[1] == 0.0  # silence -> zero rms


# -- Spark end-to-end ----------------------------------------------------

MEDIA_DDL = ("media_id long, modality string, payload binary, "
             "meta struct<mime:string,width:int,height:int,duration_ms:long>")


def media_df(spark, rows):
    return spark.createDataFrame(rows, MEDIA_DDL)


def test_spark_real_resize_consumes_real_pixels(spark):
    arrs = {i: make_rgb(8 + i, 12) for i in range(4)}
    rows = [(i, "image", bytearray(encode_ppm(a)),
             ("image/x-portable-pixmap", 12, 8 + i, None))
            for i, a in arrs.items()]
    out = resize_images(media_df(spark, rows), 6, 4, decode_real=True).collect()
    assert len(out) == 4
    for r in out:
        decoded = decode_image(bytes(r["payload"]))
        assert decoded.shape == (4, 6, 3)
        expect = resample_nearest(arrs[r["media_id"]], 6, 4)
        assert np.array_equal(decoded, expect)
        assert r["meta"]["width"] == 6 and r["meta"]["height"] == 4
    # composes: real features over the real resized pixels
    feats = extract_features(
        resize_images(media_df(spark, rows), 6, 4, decode_real=True),
        decode_real=True).collect()
    assert len(feats) == 4
    for f in feats:
        assert abs(sum(f["feature"]) - 1.0) < 1e-6


def test_resize_and_features_consume_oriented_pixels(spark):
    """r11 VERDICT #8: the resize/feature stages must see the EXIF-
    oriented array (decode_image applies the rotation), never the raw
    sensor layout — an orientation-6 JPEG resizes and featurizes
    exactly like its pre-rotated twin."""
    from sparkdon.jpeg import encode_jpeg_lossless
    from sparkdon.multimodal import (exif_orientation_segment,
                                     extract_features, image_feature,
                                     resize_images)

    rng = np.random.default_rng(21)
    arr = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    plain = encode_jpeg_lossless(arr)
    tagged = plain[:2] + exif_orientation_segment(6) + plain[2:]
    oriented = np.rot90(arr, -1)                     # 24x16 display form
    rows = [(1, "image", bytearray(tagged), ("image/jpeg", 24, 16, None))]

    out = resize_images(media_df(spark, rows), 8, 12,
                        decode_real=True).collect()
    got = decode_image(bytes(out[0]["payload"]))
    assert got.shape == (12, 8, 3)
    assert np.array_equal(got, resample_nearest(oriented, 8, 12))

    feats = extract_features(media_df(spark, rows),
                             decode_real=True).collect()
    assert feats[0]["feature"] == pytest.approx(
        image_feature(oriented), abs=1e-6)  # float32 on the wire


def test_spark_real_audio_features(spark):
    t = np.arange(1600)
    tone = (np.sin(2 * np.pi * 220 * t / 8000) * 16000).astype(np.int16)
    rows = [
        (1, "audio", bytearray(make_wav(tone.reshape(-1, 1))),
         ("audio/wav", None, None, 200)),
        (2, "audio", bytearray(make_wav(np.zeros((800, 1), dtype=np.int16))),
         ("audio/wav", None, None, 100)),
    ]
    got = {r["media_id"]: r["feature"]
           for r in extract_features(media_df(spark, rows),
                                     decode_real=True).collect()}
    assert got[1][0] == pytest.approx(0.2)   # duration_s
    assert got[1][1] > 0.1                   # tone rms
    assert got[2][1] == 0.0                  # silence rms


def test_show_image_headless(tmp_path):
    """S7 parity: without IPython, show_image returns decoded pixels for
    codec-free formats and raw bytes otherwise."""
    from sparkdon.multimodal import show_image

    arr = make_rgb(3, 3)
    p = tmp_path / "img.ppm"
    p.write_bytes(encode_ppm(arr))
    out = show_image(str(p))
    if hasattr(out, "shape"):  # headless container path
        assert np.array_equal(out, arr)
    else:  # IPython present: display side effect, None returned
        assert out is None

    q = tmp_path / "img.png"
    q.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)
    out2 = show_image(str(q))
    assert out2 is None or bytes(out2).startswith(b"\x89PNG")


# -- property tests ------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**32 - 1))
def test_ppm_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(arr)), arr)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(1, 12),
       st.integers(1, 12))
def test_resample_roundtrip_property(h, w, th, tw):
    rng = np.random.default_rng(h * 13 + w * 7 + th * 3 + tw)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = resample_nearest(arr, tw, th)
    assert out.shape == (th, tw, 3)
    # identity resample is exact
    assert np.array_equal(resample_nearest(arr, w, h), arr)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 400), st.integers(1, 2), st.integers(0, 2**31 - 1))
def test_wav_roundtrip_property(n, ch, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
    got, rate = decode_wav(make_wav(samples, rate=16000))
    assert rate == 16000
    assert np.array_equal(got, samples)


# -- PNG: stdlib-zlib decode, five scanline filters ----------------------

import struct
import zlib

from sparkdon.multimodal import encode_png


def make_png(arr: np.ndarray, color_type: int = 2,
             filters: list[int] | None = None,
             interlace: int = 0, bit_depth: int = 8,
             palette: np.ndarray | None = None) -> bytes:
    """Hand-rolled PNG writer for tests: encodes ``arr`` (HxW for gray/
    palette index, HxWxC otherwise) with a chosen scanline filter per
    row — so each of the five filter reconstructions is exercised
    independently of what an encoder would pick."""
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    a = arr.reshape(arr.shape[0], arr.shape[1], ch).astype(np.uint8)
    h, w = a.shape[0], a.shape[1]
    bpp = ch
    filters = filters if filters is not None else [0] * h
    lines = []
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        cur = a[y].reshape(-1).astype(np.int32)
        ft = filters[y]
        if ft == 0:
            enc = cur.copy()
        else:
            enc = np.zeros_like(cur)
            for x in range(len(cur)):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 2:
                    pred = up
                elif ft == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0,
                             interlace))
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(b"".join(lines))) + chunk(b"IEND", b"")


def test_png_rgb_each_filter_type():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    for ft in range(5):
        got = decode_image(make_png(arr, filters=[ft] * 5))
        assert np.array_equal(got, arr), f"filter {ft}"
    # mixed filters per row
    got = decode_image(make_png(arr, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, arr)


def test_png_color_type_variants():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
    got = decode_image(make_png(gray, color_type=0))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    # palette
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(4, 6), dtype=np.uint8)
    got = decode_image(make_png(idx, color_type=3, palette=pal))
    assert np.array_equal(got, pal[idx])
    # RGBA drops alpha
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    got = decode_image(make_png(rgba, color_type=6))
    assert np.array_equal(got, rgba[:, :, :3])
    # gray+alpha
    ga = rng.integers(0, 256, size=(3, 4, 2), dtype=np.uint8)
    got = decode_image(make_png(ga, color_type=4))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))


def make_png16(arr16: np.ndarray, color_type: int = 2,
               up_filter: bool = False) -> bytes:
    """16-bit PNG writer for tests: big-endian samples, filter 0 (or
    byte-wise Up) scanlines."""
    a = np.asarray(arr16, dtype=">u2")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    rows = a.reshape(h, -1).view(np.uint8)  # bytes per row, BE order
    lines = []
    prev = np.zeros(rows.shape[1], np.int32)
    for y in range(h):
        cur = rows[y].astype(np.int32)
        if up_filter:
            lines.append(b"\x02" + ((cur - prev) & 0xFF)
                         .astype(np.uint8).tobytes())
        else:
            lines.append(b"\x00" + cur.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16,
                                         color_type, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


def test_png_16bit_decodes_high_byte():
    """16-bit PNGs decode with the standard high-byte depth reduction
    (round 9 — closes the last PNG boundary); filters operate on BYTES
    per spec, so the Up-filtered variant checks byte-wise reconstruction
    across the 2-byte samples."""
    rng = np.random.default_rng(23)
    rgb16 = rng.integers(0, 65536, size=(5, 7, 3), dtype=np.uint16)
    got = decode_image(make_png16(rgb16))
    assert np.array_equal(got, (rgb16 >> 8).astype(np.uint8))
    got_up = decode_image(make_png16(rgb16, up_filter=True))
    assert np.array_equal(got_up, (rgb16 >> 8).astype(np.uint8))
    gray16 = rng.integers(0, 65536, size=(4, 6), dtype=np.uint16)
    got_g = decode_image(make_png16(gray16, color_type=0))
    want_g = np.repeat(((gray16 >> 8).astype(np.uint8))[:, :, None], 3, axis=2)
    assert np.array_equal(got_g, want_g)


def test_png_unsupported_variants_raise():
    arr = np.zeros((2, 2), np.uint8)
    # 16-bit PALETTE is invalid per spec and stays unsupported
    with pytest.raises(NotImplementedError, match="depth=16, type=3"):
        decode_image(make_png(arr, color_type=3, bit_depth=16,
                              palette=np.zeros((2, 3), np.uint8)))


def make_png_adam7(arr: np.ndarray, pass_filter: int = 0) -> bytes:
    """Adam7 PNG writer for tests: the IDAT stream is the 7 sub-images
    in pass order, each with its own filtered scanlines."""
    from sparkdon.multimodal import _ADAM7

    a = arr.astype(np.uint8)
    h, w, ch = a.shape
    lines = []
    for x0, y0, dx, dy in _ADAM7:
        sub = a[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        prev = np.zeros(sub.shape[1] * ch, np.int32)
        for y in range(sub.shape[0]):
            cur = sub[y].reshape(-1).astype(np.int32)
            if pass_filter == 2:  # Up
                enc = (cur - prev) & 0xFF
                lines.append(b"\x02" + enc.astype(np.uint8).tobytes())
            else:
                lines.append(b"\x00" + cur.astype(np.uint8).tobytes())
            prev = cur

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


def test_png_adam7_interlaced_roundtrip():
    """Adam7 decode (round 9): the 7 passes scatter back to the exact
    sequential raster — checked on sizes that hit empty and partial
    passes (1x1 has only pass 1; 9x9 exercises all seven), and with
    Up-filtered pass scanlines (each pass filters independently)."""
    rng = np.random.default_rng(13)
    for (h, w) in ((1, 1), (2, 3), (7, 5), (8, 8), (9, 9), (16, 11)):
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = decode_image(make_png_adam7(arr))
        assert np.array_equal(got, arr), (h, w)
    arr = rng.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)
    got = decode_image(make_png_adam7(arr, pass_filter=2))
    assert np.array_equal(got, arr)


def test_png_adam7_truncated_raises():
    """An interlaced raster missing part of a late pass raises the
    module's ValueError, not an index error."""
    arr = np.random.default_rng(5).integers(
        0, 256, size=(9, 9, 3), dtype=np.uint8)
    full = make_png_adam7(arr)
    i = full.index(b"IDAT")
    length = struct.unpack(">I", full[i - 4:i])[0]
    body = full[i + 4:i + 4 + length]
    short = zlib.compress(zlib.decompress(body)[:-20])

    def chunk(ctype, b):
        return (struct.pack(">I", len(b)) + ctype + b
                + struct.pack(">I", zlib.crc32(ctype + b)))

    rebuilt = full[:i - 4] + chunk(b"IDAT", short) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="truncated"):
        decode_image(rebuilt)


def test_png_reference_art_corpus_decodes():
    """The reference's own artwork (gastrodon art/*.png, the show_image
    corpus format) — all 8-bit palette non-interlaced — decodes to
    plausible pixel arrays headlessly."""
    import glob
    import os

    paths = sorted(glob.glob("/root/reference/art/*.png"))
    if not paths:
        pytest.skip("reference art not present")
    for p in paths:
        with open(p, "rb") as f:
            arr = decode_image(f.read())
        assert arr.ndim == 3 and arr.shape[2] == 3 and arr.shape[0] > 100
        assert arr.dtype == np.uint8
        assert len(np.unique(arr.reshape(-1, 3), axis=0)) > 1, os.path.basename(p)


def test_png_feature_pipeline_real_decode(tmp_path):
    """encode_png → extract_features(decode_real=True) consumes real PNG
    pixels (VERDICT r6 'done' criterion)."""
    arr = make_rgb(6, 9)
    feat = image_feature(decode_image(encode_png(arr)))
    assert feat == image_feature(arr)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(arr)), arr)
    # and cross-format: PNG-decoded pixels re-encode to identical PPM
    assert encode_ppm(decode_image(encode_png(arr))) == encode_ppm(arr)


# --- GIF (round 8: pure-stdlib LZW decode) --------------------------------

def _gif_pack(codes, width_of):
    """LSB-first bit packing of an LZW code sequence (per-code widths)."""
    acc = bits = 0
    out = bytearray()
    for c, w in codes:
        acc |= c << bits
        bits += w
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_bytes(indices, w, h, palette, min_code, code_stream):
    """Assemble a single-frame GIF87a around a pre-built LZW stream."""
    import struct

    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    gct = b"".join(bytes(c) for c in palette) + b"\x00\x00\x00" * ((1 << depth) - n)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += gct
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code])
    data = _gif_pack(code_stream, None)
    i = 0
    while i < len(data):
        blk = data[i:i + 255]
        out += bytes([len(blk)]) + blk
        i += 255
    out += b"\x00\x3B"
    return bytes(out)


def _gif_encode_uncompressed(indices, min_code):
    """CLEAR before every literal — the classic 'uncompressed GIF'
    trick: the decoder's table never grows, so this stream exercises
    the reader/palette path independently of the LZW table logic."""
    clear, eoi, width = 1 << min_code, (1 << min_code) + 1, min_code + 1
    codes = []
    for px in indices:
        codes.append((clear, width))
        codes.append((px, width))
    codes.append((eoi, width))
    return codes


def _gif_encode_lzw(indices, min_code):
    """Real GIF LZW encoder (string table, width growth) — the
    compressed round-trip exercises compound codes and KwKwK."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes = [(clear, min_code + 1)]
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    run = ()
    for px in indices:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        codes.append((table[run], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            # decoder grows width when its next slot hits 2^width;
            # mirror that exactly (grow after assigning code 2^width-1)
            width += 1
        run = (px,)
    if run:
        codes.append((table[run], width))
    codes.append((eoi, width))
    return codes


def test_gif_uncompressed_stream_decodes_exact():
    import numpy as np

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0]
    gif = _gif_bytes(idx, 4, 2, palette, 2, _gif_encode_uncompressed(idx, 2))
    arr = decode_image(gif)
    assert arr.shape == (2, 4, 3)
    want = np.array([palette[i] for i in idx], dtype=np.uint8).reshape(2, 4, 3)
    assert np.array_equal(arr, want)


def test_gif_lzw_roundtrip_with_runs():
    """Repeated runs force compound codes, immediate-reuse (KwKwK), and
    code-width growth past min_code+1."""
    import numpy as np

    rng = np.random.default_rng(7)
    palette = [(i, 255 - i, i * 3 % 256) for i in range(8)]
    # long runs -> the encoder table grows well past 2^(min+1)
    idx = []
    for _ in range(40):
        v = int(rng.integers(0, 8))
        idx += [v] * int(rng.integers(1, 9))
    w, h = len(idx), 1
    gif = _gif_bytes(idx, w, h, palette, 3, _gif_encode_lzw(idx, 3))
    arr = decode_image(gif)
    want = np.array([palette[i] for i in idx], dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(arr, want)


def test_gif_truncated_raises_valueerror():
    """A GIF chopped mid-stream must raise the module's documented
    ValueError, not a bare IndexError from the block walker
    (advice r8: bounds-check the sub-block loops)."""
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0]
    gif = _gif_bytes(idx, 4, 2, palette, 2, _gif_encode_uncompressed(idx, 2))
    # chop at several points: inside the header, the descriptor, the
    # sub-block chain, and right before the terminator byte
    for cut in (14, 30, len(gif) // 2, len(gif) - 2):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_image(gif[:cut])
    # a truncated extension block (0x21 intro, then EOF) as well
    ext = gif[:13 + 3 * 4] + b"\x21\xF9\x04"
    with pytest.raises(ValueError):
        decode_image(ext)


def test_gif_lzw_table_freezes_at_4096():
    """Deferred-clear streams: the string table must freeze at the
    12-bit/4096-code ceiling (spec decoder behavior) while decode stays
    exact — the encoder here freezes its inserts at 4096 the way real
    frozen encoders do, and keeps emitting existing codes after."""
    import numpy as np

    rng = np.random.default_rng(11)
    # random 8-color pixels mint roughly one table entry per 2-4 px;
    # 20000 px hits the 4096 ceiling with no CLEAR ever sent
    idx = [int(v) for v in rng.integers(0, 8, size=20000)]
    clear, eoi, min_code = 8, 9, 3
    codes = [(clear, min_code + 1)]
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    run = ()
    frozen = False
    for px in idx:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        codes.append((table[run], width))
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            frozen = True
        run = (px,)
    assert frozen, "fixture too small to reach the 4096 ceiling"
    if run:
        codes.append((table[run], width))
    codes.append((eoi, width))
    palette = [(i, 255 - i, i * 3 % 256) for i in range(8)]
    gif = _gif_bytes(idx, len(idx), 1, palette, min_code, codes)
    arr = decode_image(gif)
    want = np.array([palette[i] for i in idx],
                    dtype=np.uint8).reshape(1, len(idx), 3)
    assert np.array_equal(arr, want)


def test_gif_interlaced_roundtrip():
    """Interlaced GIF decode (round 9): rows stored in the 4-pass
    0::8/4::8/2::4/1::2 order come back permuted to display order —
    checked on heights that hit every pass boundary."""
    import numpy as np

    rng = np.random.default_rng(17)
    palette = [(i * 16, 255 - i * 16, (i * 37) % 256) for i in range(16)]
    for h in (1, 2, 3, 5, 8, 9, 13):
        w = 6
        disp = rng.integers(0, 16, size=(h, w))
        order = np.concatenate([np.arange(s, h, t)
                                for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))])
        stored = disp[order]  # rows in transmission order
        idx = [int(v) for v in stored.reshape(-1)]
        gif = bytearray(_gif_bytes(idx, w, h, palette, 4,
                                   _gif_encode_lzw(idx, 4)))
        desc = gif.index(b"\x2C")
        gif[desc + 9] |= 0x40  # set the interlace flag
        arr = decode_image(bytes(gif))
        want = np.array([palette[i] for i in disp.reshape(-1)],
                        dtype=np.uint8).reshape(h, w, 3)
        assert np.array_equal(arr, want), h


# --- JPEG (round 9: pure-Python baseline decoder, sparkdon/jpeg.py) --------

def test_jpeg_roundtrip_444():
    """Encode→decode with 4:4:4 sampling and fine quantization must
    reproduce pixels within the quantization error bound."""
    from sparkdon.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    for (h, w) in ((1, 1), (8, 8), (7, 9), (16, 16), (33, 41)):
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(arr, quality_div=16))
        assert out.shape == arr.shape
        err = int(np.max(np.abs(out.astype(int) - arr.astype(int))))
        assert err <= 12, ((h, w), err)


def test_jpeg_roundtrip_420_and_restarts():
    """4:2:0 chroma subsampling and restart-marker streams decode; a
    smooth gradient bounds the subsampling error tightly."""
    from sparkdon.jpeg import decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 17)
    y = np.linspace(0, 255, 23)
    gx, gy = np.meshgrid(x, y)
    arr = np.stack([gx, gy, (gx + gy) / 2], axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality_div=16, subsample=True))
    assert int(np.max(np.abs(out.astype(int) - arr.astype(int)))) <= 16
    out2 = decode_jpeg(
        encode_jpeg(arr, quality_div=16, restart_interval=2))
    assert int(np.max(np.abs(out2.astype(int) - arr.astype(int)))) <= 4


def test_jpeg_decode_image_dispatch():
    """decode_image routes SOI-headed payloads to the JPEG decoder."""
    from sparkdon.jpeg import encode_jpeg

    arr = np.full((9, 9, 3), 77, np.uint8)
    out = decode_image(encode_jpeg(arr, quality_div=16))
    assert out.shape == (9, 9, 3)
    assert int(np.max(np.abs(out.astype(int) - 77))) <= 3


def test_jpeg_unsupported_and_corrupt_raise():
    from sparkdon.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # arithmetic SOF9 (progressive SOF2 and lossless SOF3 decode, r10)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(b"\xff\xd8\xff\xc9\x00\x04\x00\x00")
    # truncated SOF3 header must be a clean ValueError
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b"\xff\xd8\xff\xc3\x00\x04\x00\x00")
    # truncated segment
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b"\xff\xd8\xff\xdb\x00\x45\x00")
    # chopped scan: decoder either hits a padding-induced invalid code
    # or runs out of data — both must be clean ValueErrors
    arr = np.random.default_rng(9).integers(
        0, 256, size=(24, 24, 3), dtype=np.uint8)
    full = encode_jpeg(arr, quality_div=16)
    with pytest.raises(ValueError):
        decode_jpeg(full[: int(len(full) * 0.6)])


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1),
       st.booleans())
def test_jpeg_roundtrip_property(h, w, seed, subsample):
    """Property fuzz: any size (including non-multiple-of-8/16 edges),
    any noise content, both sampling modes — encode→decode stays within
    the quantization error bound and never crashes."""
    from sparkdon.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality_div=16, subsample=subsample))
    assert out.shape == arr.shape
    if subsample:
        # 4:2:0 averages 2x2 chroma neighborhoods — on NOISE the chroma
        # error is unbounded by the quant step, but LUMINANCE is never
        # subsampled and must still round-trip tightly
        def luma(a):
            return (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
                    + 0.114 * a[:, :, 2])

        # bound is loose-ish (32) because gamut CLIPPING of
        # chroma-shifted channels distorts recomputed luma — still far
        # under the ~200 worst case of raw chroma averaging
        err = float(np.max(np.abs(luma(out.astype(float))
                                  - luma(arr.astype(float)))))
        assert err <= 32, (h, w, seed, err)
    else:
        # worst case on noise: quant round-off across 64 coefficients can
        # constructively interfere at one pixel; p99 is ~7 but the tail
        # reaches 13+ (seed 39877 at 16x16), so bound at 16 — still well
        # under the quality_div=16 quant step while deterministic in CI
        err = int(np.max(np.abs(out.astype(int) - arr.astype(int))))
        assert err <= 16, (h, w, seed, err)


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2) — round 10
# ---------------------------------------------------------------------------


def test_jpeg_progressive_exact_vs_baseline():
    """The progressive stream carries the SAME quantized coefficients as
    the baseline stream (shared `_coeff_grids` math), so decoding it
    must give EXACTLY the baseline decode's pixels — a strong
    cross-check: the two entropy paths (sequential Huffman vs spectral
    bands + successive approximation + EOB runs + refinement correction
    bits) share no decode code beyond the bit reader and IDCT."""
    from sparkdon.jpeg import decode_jpeg, encode_jpeg, encode_jpeg_progressive

    rng = np.random.default_rng(7)
    for h, w, sub, ri in [(16, 16, False, 0), (24, 17, False, 0),
                          (32, 32, True, 0), (23, 9, True, 0),
                          (40, 40, False, 3), (33, 31, True, 2),
                          (8, 8, False, 0), (1, 1, False, 0),
                          (3, 21, True, 0)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(arr, quality_div=8, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(
            arr, quality_div=8, subsample=sub, restart_interval=ri))
        assert np.array_equal(base, prog), (h, w, sub, ri)


def test_jpeg_progressive_flat_image_eob_runs():
    """A flat image drives maximal EOB-run accumulation (every AC block
    empty): the whole-band EOBn path plus the flat-image exactness the
    baseline codec guarantees."""
    from sparkdon.jpeg import decode_jpeg, encode_jpeg_progressive

    arr = np.full((48, 40, 3), 130, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(arr, quality_div=8))
    assert int(np.max(np.abs(out.astype(int) - arr.astype(int)))) <= 1


def test_jpeg_progressive_truncation_semantics():
    """Progressive truncation has TWO correct behaviors: a cut at a
    scan boundary yields a valid coarse PREVIEW (that is the format's
    whole point — browsers render exactly this), while a cut inside a
    scan's entropy data is a clean ValueError."""
    from sparkdon.jpeg import _next_marker, decode_jpeg, encode_jpeg_progressive

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    full = encode_jpeg_progressive(arr, quality_div=8)

    # locate the first SOS and its entropy span
    sos = full.index(b"\xff\xda")
    seglen = struct.unpack(">H", full[sos + 2:sos + 4])[0]
    entropy_start = sos + 2 + seglen
    entropy_end = _next_marker(full, entropy_start)
    assert entropy_end - entropy_start > 8

    # mid-entropy cut -> error
    with pytest.raises(ValueError):
        decode_jpeg(full[: entropy_start + (entropy_end - entropy_start) // 2])

    # scan-boundary cut -> coarse but valid preview
    preview = decode_jpeg(full[:entropy_end])
    assert preview.shape == arr.shape


def test_jpeg_grayscale_scan_ignores_sampling_factors():
    """T.81 §A.2.2: a single-component scan is non-interleaved — one 8x8
    block per MCU regardless of declared factors.  Patch a 1x1 grayscale
    stream's SOF to declare 2x2; the decode must be unchanged (the r10
    ADVICE fix; previously the raster came out scrambled)."""
    from sparkdon.jpeg import decode_jpeg

    # build a grayscale baseline JPEG by hand from the RGB encoder's Y
    # path: encode a gray RGB image, then rewrite SOF/SOS to 1 component
    from sparkdon.jpeg import encode_jpeg

    g = np.random.default_rng(11).integers(0, 256, (16, 16), dtype=np.uint8)
    arr = np.repeat(g[:, :, None], 3, axis=2)
    # reference: full RGB decode (gray in = gray out)
    rgb = decode_jpeg(encode_jpeg(arr, quality_div=16))

    # hand-build the grayscale stream: reuse encoder internals
    from sparkdon.jpeg import (_BitWriter, _K_DC_LUMA, _K_AC_LUMA, _K_LUMA,
                               _ZIGZAG, _dct_matrix, _encode_table, _mag, _seg)
    import struct as _struct

    ql = np.maximum(1, np.array(_K_LUMA, dtype=np.int64) // 16)
    ql8 = ql.reshape(8, 8).astype(float)
    C = _dct_matrix()
    dc_t, ac_t = _encode_table(*_K_DC_LUMA), _encode_table(*_K_AC_LUMA)
    bw = _BitWriter()
    pred = 0
    for by in range(2):
        for bx in range(2):
            blk = g[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float) - 128.0
            zz = np.round((C @ blk @ C.T) / ql8).astype(np.int64).reshape(-1)[_ZIGZAG]
            t, bits = _mag(int(zz[0]) - pred)
            pred = int(zz[0])
            code, ln = dc_t[t]
            bw.write(code, ln)
            bw.write(bits, t)
            last = 63
            while last > 0 and zz[last] == 0:
                last -= 1
            run = 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_t[0xF0]
                    bw.write(code, ln)
                    run -= 16
                t, bits = _mag(v)
                code, ln = ac_t[(run << 4) | t]
                bw.write(code, ln)
                bw.write(bits, t)
                run = 0
            if last < 63:
                code, ln = ac_t[0x00]
                bw.write(code, ln)
    bw.flush()

    def gray_jpeg(hv):
        head = bytearray(b"\xff\xd8")
        head += _seg(0xDB, bytes([0]) + bytes(int(ql[_ZIGZAG[k]]) for k in range(64)))
        head += _seg(0xC0, _struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, hv, 0]))
        head += _seg(0xC4, bytes([0x00]) + bytes(_K_DC_LUMA[0]) + _K_DC_LUMA[1])
        head += _seg(0xC4, bytes([0x10]) + bytes(_K_AC_LUMA[0]) + _K_AC_LUMA[1])
        head += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        return bytes(head) + bytes(bw.out) + b"\xff\xd9"

    out11 = decode_jpeg(gray_jpeg(0x11))
    out22 = decode_jpeg(gray_jpeg(0x22))  # declared 2x2 must be ignored
    assert np.array_equal(out11, out22)
    assert int(np.max(np.abs(out11.astype(int) - rgb.astype(int)))) <= 2


def test_jpeg_many_restart_segments_pad_budget():
    """r10 ADVICE fix: the >2-padding-byte truncation cap is per restart
    segment, not cumulative — a valid stream with many restart intervals
    must decode even when several segments over-read padding bits."""
    from sparkdon.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    # restart_interval=1 -> 35 restart segments on a 6x6-MCU image
    out = decode_jpeg(encode_jpeg(arr, quality_div=16, restart_interval=1))
    assert out.shape == arr.shape


# -- round-10 WAV format closure: float, 24/32-bit, G.711, extensible ----


def make_wav_ex(data: bytes, fmt_code: int, bits: int, ch: int = 1,
                rate: int = 8000, extensible: bool = False) -> bytes:
    block = ch * max(bits // 8, 1)
    if extensible:
        guid = struct.pack("<H", fmt_code) + b"\x00\x00" + \
            b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, ch, rate, rate * block,
                          block, bits, 22, bits, 0x3) + guid
    else:
        fmt = struct.pack("<HHIIHH", fmt_code, ch, rate, rate * block,
                          block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_float_decode_and_clip():
    vals = np.array([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 3.0])
    want = np.round(np.clip(vals, -1, 1) * 32767).astype(np.int16)
    for dt, bits in [("<f4", 32), ("<f8", 64)]:
        got, rate = decode_wav(make_wav_ex(vals.astype(dt).tobytes(), 3, bits))
        assert rate == 8000
        np.testing.assert_array_equal(got[:, 0], want)


def test_wav_pcm_24_and_32_bit_keep_top_16():
    full = np.array([-(1 << 23), -1 << 8, 0, 1 << 8, (1 << 23) - 256],
                    dtype=np.int32)
    data24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in full)
    got, _ = decode_wav(make_wav_ex(data24, 1, 24))
    np.testing.assert_array_equal(got[:, 0], (full >> 8).astype(np.int16))
    data32 = (full << 8).astype("<i4").tobytes()
    got32, _ = decode_wav(make_wav_ex(data32, 1, 32))
    np.testing.assert_array_equal(got32[:, 0], ((full << 8) >> 16).astype(np.int16))


def test_wav_extensible_wraps_pcm16():
    samples = np.array([[-3], [0], [7], [32000]], dtype=np.int16)
    plain = decode_wav(make_wav(samples))
    ext = decode_wav(make_wav_ex(samples.astype("<i2").tobytes(), 1, 16,
                                 extensible=True))
    np.testing.assert_array_equal(plain[0], ext[0])


def test_wav_g711_spot_values():
    # µ-law: G.711 table extremes and zero
    got, _ = decode_wav(make_wav_ex(bytes([0xFF, 0x00, 0x80, 0x7F]), 7, 8))
    np.testing.assert_array_equal(got[:, 0], [0, -32124, 32124, -0])
    # A-law: silence pair ±8, max-positive 0xAA = +32256
    got, _ = decode_wav(make_wav_ex(bytes([0xD5, 0x55, 0xAA, 0x2A]), 6, 8))
    np.testing.assert_array_equal(got[:, 0], [8, -8, 32256, -32256])


def test_wav_g711_bruteforce_roundtrip_monotone():
    # decode all 256 µ-law/A-law codes; nearest-code re-encode of each
    # decoded value must be the original code (codec self-consistency)
    for code in (7, 6):
        table, _ = decode_wav(make_wav_ex(bytes(range(256)), code, 8))
        table = table[:, 0].astype(np.int32)
        assert len(np.unique(table)) >= 255  # ±0 may collide
        back = np.abs(table[None, :] - table[:, None]).argmin(axis=1)
        assert np.array_equal(table[back], table)


def test_wav_adpcm_still_honest_boundary():
    # fmt 2 (MS ADPCM) decodes as of round 10; sub-block payloads are a
    # loud truncation error, and MPEG audio stays NotImplementedError
    with pytest.raises(ValueError, match="block"):
        decode_wav(make_wav_ex(b"\x00\x00", 2, 4))


# -- round-10 (late) CMYK/YCCK JPEG ---------------------------------------


def _cmyk_reference_rgb(stored: np.ndarray) -> np.ndarray:
    """Expected RGB for Adobe-inverted stored CMYK samples."""
    ink = 255.0 - stored.astype(np.float64)
    r = (255.0 - ink[..., 0]) * (255.0 - ink[..., 3]) / 255.0
    g = (255.0 - ink[..., 1]) * (255.0 - ink[..., 3]) / 255.0
    b = (255.0 - ink[..., 2]) * (255.0 - ink[..., 3]) / 255.0
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def test_jpeg_cmyk_flat_colors_exact():
    from sparkdon.jpeg import decode_jpeg, encode_jpeg_cmyk

    # stored 255 everywhere = zero ink = white; stored K=0 = full black
    for stored, want in [
        ((255, 255, 255, 255), (255, 255, 255)),
        ((255, 255, 255, 0), (0, 0, 0)),
        ((0, 255, 255, 255), (0, 255, 255)),     # full cyan ink
        ((255, 255, 255, 127), (127, 127, 127)),  # gray via K only
    ]:
        img = np.full((16, 16, 4), stored, dtype=np.uint8)
        got = decode_jpeg(encode_jpeg_cmyk(img, quality_div=16))
        assert got.shape == (16, 16, 3)
        np.testing.assert_array_equal(got, np.full((16, 16, 3), want,
                                                   dtype=np.uint8))


def test_jpeg_ycck_matches_cmyk_transform():
    from sparkdon.jpeg import decode_jpeg, encode_jpeg_cmyk

    rng = np.random.default_rng(7)
    # blockwise-flat stored samples so quantization error stays tiny
    blocks = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    via_cmyk = decode_jpeg(encode_jpeg_cmyk(img, 16, transform=0)).astype(int)
    via_ycck = decode_jpeg(encode_jpeg_cmyk(img, 16, transform=2)).astype(int)
    assert np.abs(via_cmyk - via_ycck).max() <= 2
    assert np.abs(via_cmyk - _cmyk_reference_rgb(img).astype(int)).max() <= 2


def test_jpeg_cmyk_random_roundtrip_bounded():
    from sparkdon.jpeg import decode_jpeg, encode_jpeg_cmyk

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 17, 4), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_cmyk(img, quality_div=16)).astype(int)
    want = _cmyk_reference_rgb(img).astype(int)
    assert got.shape == want.shape
    # same quantization-noise regime as the 3-component property tests,
    # doubled for the two-channel C*K product
    assert np.abs(got - want).max() <= 32
    assert np.abs(got - want).mean() <= 4


def test_jpeg_cmyk_no_app14_is_direct_ink():
    from sparkdon.jpeg import decode_jpeg, encode_jpeg_cmyk

    img = np.full((8, 8, 4), (0, 0, 0, 0), dtype=np.uint8)  # stored zeros
    data = encode_jpeg_cmyk(img, quality_div=16)
    # with APP14: stored 0 = full ink everywhere = black
    np.testing.assert_array_equal(decode_jpeg(data)[0, 0], (0, 0, 0))
    # strip the APP14 segment: bare CMYK, stored 0 = no ink = white
    i = data.index(b"\xff\xee")
    seglen = int.from_bytes(data[i + 2:i + 4], "big")
    stripped = data[:i] + data[i + 2 + seglen:]
    np.testing.assert_array_equal(decode_jpeg(stripped)[0, 0],
                                  (255, 255, 255))


def test_jpeg_fill_bytes_before_markers():
    """Regression (r10 review): T.81 B.1.1.2 allows any number of 0xFF
    fill bytes before a marker; both the segment walker and the
    progressive next-marker scan must skip them."""
    from sparkdon.jpeg import decode_jpeg, encode_jpeg, encode_jpeg_progressive

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)

    def stuff_fill_bytes(data: bytes) -> bytes:
        # insert fill bytes before every DHT/SOS/EOI marker (never
        # inside entropy data: these markers all begin a new segment)
        out = bytearray()
        i = 0
        while i < len(data):
            if data[i] == 0xFF and i + 1 < len(data) and \
                    data[i + 1] in (0xC4, 0xDA, 0xD9):
                out += b"\xff\xff\xff"
            out.append(data[i])
            i += 1
        return bytes(out)

    for enc in (encode_jpeg, encode_jpeg_progressive):
        plain = enc(img, 16)
        stuffed = stuff_fill_bytes(plain)
        assert len(stuffed) > len(plain)
        np.testing.assert_array_equal(decode_jpeg(stuffed),
                                      decode_jpeg(plain))


# -- round-10 (late): sub-byte PNG depths (1/2/4-bit gray + palette) -----


def _pack_subbyte_rows(samples: np.ndarray, depth: int,
                       filters: list[int] | None = None) -> bytes:
    """samples (h, w) -> filtered scanlines, MSB-first bit packing.
    Filters apply at BYTE level with bpp=1, per the PNG spec."""
    h, w = samples.shape
    rb = (w * depth + 7) // 8
    packed = np.zeros((h, rb), np.uint8)
    for y in range(h):
        bits = ((samples[y][:, None] >> np.arange(depth - 1, -1, -1)) & 1)
        bits = bits.reshape(-1).astype(np.uint8)
        bits = np.pad(bits, (0, rb * 8 - len(bits)))
        packed[y] = np.packbits(bits)
    filters = filters if filters is not None else [0] * h
    lines, prev = [], np.zeros(rb, np.int32)
    for y in range(h):
        cur = packed[y].astype(np.int32)
        ft = filters[y]
        enc = cur.copy()
        for x in range(rb):
            left = cur[x - 1] if x >= 1 else 0
            up = prev[x]
            ul = prev[x - 1] if x >= 1 else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1}.get(ft)
            if pred is None:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else \
                    (up if pb <= pc else ul)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur
    return b"".join(lines)


def _subbyte_png(samples, depth, color_type, palette=None,
                 filters=None, interlace=0, raster=None) -> bytes:
    h, w = samples.shape

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                             interlace))
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    body = raster if raster is not None else _pack_subbyte_rows(
        samples, depth, filters)
    return out + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b"")


def test_png_subbyte_gray_depths_rescale():
    for depth in (1, 2, 4):
        hi = (1 << depth) - 1
        rng = np.random.default_rng(depth)
        s = rng.integers(0, hi + 1, size=(7, 11), dtype=np.uint8)
        got = decode_image(_subbyte_png(s, depth, 0))
        want = (s.astype(np.uint16) * 255 // hi).astype(np.uint8)
        np.testing.assert_array_equal(got, np.repeat(want[:, :, None], 3, 2))


def test_png_subbyte_palette_and_filters():
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]],
                   np.uint8)
    rng = np.random.default_rng(5)
    s = rng.integers(0, 4, size=(6, 13), dtype=np.uint8)
    for filters in ([0] * 6, [0, 1, 2, 3, 4, 1]):
        got = decode_image(_subbyte_png(s, 2, 3, palette=pal,
                                        filters=filters))
        np.testing.assert_array_equal(got, pal[s])


def test_png_subbyte_interlaced_1bit():
    from sparkdon.multimodal import _ADAM7

    rng = np.random.default_rng(9)
    s = rng.integers(0, 2, size=(9, 10), dtype=np.uint8)
    passes = []
    for x0, y0, dx, dy in _ADAM7:
        sub = s[y0::dy, x0::dx]
        if sub.size:
            passes.append(_pack_subbyte_rows(sub, 1))
    got = decode_image(_subbyte_png(s, 1, 0, interlace=1,
                                    raster=b"".join(passes)))
    want = (s * 255).astype(np.uint8)
    np.testing.assert_array_equal(got, np.repeat(want[:, :, None], 3, 2))


def test_png_subbyte_rgb_is_rejected():
    s = np.zeros((4, 4), np.uint8)
    with pytest.raises(NotImplementedError, match="depth=4, type=2"):
        decode_image(_subbyte_png(s, 4, 2))


def test_jpeg_16bit_quant_tables():
    """DQT precision 1 (16-bit entries, legal in extended-sequential
    streams): rewriting an 8-bit-table stream's DQTs to 16-bit with the
    same values must decode to identical pixels."""
    from sparkdon.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(img, 8)

    out = bytearray()
    i = 0
    while i < len(data):
        if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] == 0xDB:
            seglen = int.from_bytes(data[i + 2:i + 4], "big")
            body = data[i + 4:i + 2 + seglen]
            assert len(body) == 65 and body[0] >> 4 == 0
            wide = bytes([0x10 | (body[0] & 0x0F)]) + b"".join(
                int(v).to_bytes(2, "big") for v in body[1:])
            out += b"\xff\xdb" + (len(wide) + 2).to_bytes(2, "big") + wide
            i += 2 + seglen
        else:
            out.append(data[i])
            i += 1
    np.testing.assert_array_equal(decode_jpeg(bytes(out)), decode_jpeg(data))
    with pytest.raises(ValueError, match="DQT precision"):
        bad = bytearray(data)
        j = bad.index(b"\xff\xdb") + 4
        bad[j] = 0x20 | (bad[j] & 0x0F)
        decode_jpeg(bytes(bad))


# --- IMA ADPCM (round 10: WAV fmt 0x11) ------------------------------------

def test_ima_adpcm_roundtrip_mono_and_stereo():
    """Encode→decode with the IMA state machine: a full-scale sine must
    come back within ADPCM's 4-bit quantization envelope (max err well
    under 2% of full scale, mean ~54 — the measured operating point
    with the primed/carried step index), block-count padding included."""
    from sparkdon.multimodal import decode_wav, encode_wav_ima_adpcm

    t = np.arange(2000)
    sig = (8000 * np.sin(2 * np.pi * t / 50)).astype(np.int16).reshape(-1, 1)
    got, rate = decode_wav(encode_wav_ima_adpcm(sig, 8000))
    assert rate == 8000 and got.shape[1] == 1
    n = min(len(got), len(sig))
    err = np.abs(got[:n].astype(int) - sig[:n].astype(int))
    assert err.max() <= 600 and err.mean() <= 120, (err.max(), err.mean())

    sig2 = np.stack([(6000 * np.sin(2 * np.pi * t / 37)).astype(np.int16),
                     (9000 * np.sin(2 * np.pi * t / 61)).astype(np.int16)],
                    axis=1)
    got2, rate2 = decode_wav(encode_wav_ima_adpcm(sig2, 16000))
    assert rate2 == 16000 and got2.shape[1] == 2
    n2 = min(len(got2), len(sig2))
    err2 = np.abs(got2[:n2].astype(int) - sig2[:n2].astype(int))
    assert err2.max() <= 600 and err2.mean() <= 120


def test_ima_adpcm_known_nibbles():
    """Spec-exactness on a hand-built block: header predictor 0, index
    0 (step 7), one nibble group — nibble 0 adds step>>3 = 0, nibble 4
    adds step, nibble 8+4 subtracts; the decoder must reproduce the
    hand-run state machine exactly."""
    import struct

    from sparkdon.multimodal import _ima_adpcm_decode

    # mono block, block_align 12: 4-byte header + 8 bytes = 16 nibbles
    hdr = struct.pack("<hBB", 0, 0, 0)
    # nibbles: 4 (add step=7), 4 (add step=8 after idx+=6... recompute
    # below), then zeros
    nibbles = [4, 4] + [0] * 14
    body = bytearray(8)
    for k, nb in enumerate(nibbles):
        if k % 2:
            body[k // 2] |= nb << 4
        else:
            body[k // 2] |= nb
    out = _ima_adpcm_decode(bytes(hdr + bytes(body)), 1, 12)
    # hand-run: pred=0 idx=0 step=7; n=4: diff=7>>3+7=7... diff =
    # (7>>3)+(7)=7? diff = step>>3 + step = 0+7 = 7 → pred 7, idx
    # +=2 → 2 (step 9); n=4: diff = 9>>3 + 9 = 1+9 = 10 → pred 17,
    # idx 4 (step 11); n=0 thereafter: diff = step>>3, idx -1 each
    assert out[0, 0] == 0 and out[1, 0] == 7 and out[2, 0] == 17
    # n=0 run: idx 4→3 step 11 diff 1 → 18; idx 3→2 step 10 diff 1 → 19
    assert out[3, 0] == 18 and out[4, 0] == 19


def test_ms_adpcm_roundtrip():
    """Microsoft ADPCM (fmt 2): predictor-selected, delta-adaptive
    round trip — tighter than IMA by design (measured max err 71 mono /
    125 stereo, mean ~19 on full-scale sines)."""
    from sparkdon.multimodal import decode_wav, encode_wav_ms_adpcm

    t = np.arange(2000)
    sig = (8000 * np.sin(2 * np.pi * t / 50)).astype(np.int16).reshape(-1, 1)
    got, rate = decode_wav(encode_wav_ms_adpcm(sig, 8000))
    assert rate == 8000 and got.shape[1] == 1
    n = min(len(got), len(sig))
    err = np.abs(got[:n].astype(int) - sig[:n].astype(int))
    assert err.max() <= 400 and err.mean() <= 80, (err.max(), err.mean())

    sig2 = np.stack([(6000 * np.sin(2 * np.pi * t / 37)).astype(np.int16),
                     (9000 * np.sin(2 * np.pi * t / 61)).astype(np.int16)],
                    axis=1)
    got2, rate2 = decode_wav(encode_wav_ms_adpcm(sig2, 16000))
    assert rate2 == 16000 and got2.shape[1] == 2
    n2 = min(len(got2), len(sig2))
    err2 = np.abs(got2[:n2].astype(int) - sig2[:n2].astype(int))
    assert err2.max() <= 400 and err2.mean() <= 80


def test_adpcm_unsupported_still_raises():
    """Still-unsupported compressed formats (MPEG layer-3 fmt 0x55)
    stay an honest NotImplementedError boundary."""
    import struct

    from sparkdon.multimodal import decode_wav

    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 256, 0)
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    wav = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(NotImplementedError):
        decode_wav(wav)


# -- round-10 (late): 12-bit extended-sequential JPEG -----------------------

def test_jpeg_12bit_roundtrip():
    """12-bit (SOF1) encode→decode: uint16 samples in [0, 4095], output
    reduced to uint8 via >> 4 (the 16-bit-PNG high-byte convention) —
    noise round-trips within the scaled quant envelope and a smooth
    gradient within 1 LSB."""
    from sparkdon.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    a12 = rng.integers(0, 4096, size=(16, 16, 3)).astype(np.uint16)
    payload = encode_jpeg(a12, quality_div=16, bits=12)
    assert b"\xff\xc1" in payload and b"\xff\xc0" not in payload
    out = decode_jpeg(payload)
    want = (a12 >> 4).astype(int)
    assert int(np.max(np.abs(out.astype(int) - want))) <= 16

    x = np.linspace(0, 4095, 64)
    g = np.stack([np.tile(x, (64, 1))] * 3, axis=2).astype(np.uint16)
    out = decode_jpeg(encode_jpeg(g, quality_div=16, bits=12))
    assert int(np.max(np.abs(out.astype(int) - (g >> 4).astype(int)))) <= 2


def test_jpeg_12bit_progressive_matches_baseline():
    """12-bit SOF2: the progressive stream's accumulated coefficients
    must decode to EXACTLY the pixels of the 12-bit baseline stream
    built from the same quantized blocks (the same cross-check the
    8-bit paths assert)."""
    from sparkdon.jpeg import (decode_jpeg, encode_jpeg,
                               encode_jpeg_progressive)

    rng = np.random.default_rng(11)
    a12 = rng.integers(0, 4096, size=(16, 16, 3)).astype(np.uint16)
    prog = decode_jpeg(encode_jpeg_progressive(a12, quality_div=16, bits=12))
    base = decode_jpeg(encode_jpeg(a12, quality_div=16, bits=12))
    assert np.array_equal(prog, base)
    want = (a12 >> 4).astype(int)
    assert int(np.max(np.abs(prog.astype(int) - want))) <= 16


def test_jpeg_12bit_baseline_rejected():
    """T.81: baseline (SOF0) frames are 8-bit only — a 12-bit SOF0 must
    raise, and the encoder refuses table divisors that would overflow
    the standard Huffman categories."""
    from sparkdon.jpeg import decode_jpeg, encode_jpeg

    a12 = np.zeros((8, 8, 3), np.uint16)
    payload = bytearray(encode_jpeg(a12, quality_div=16, bits=12))
    payload[payload.index(b"\xff\xc1") + 1] = 0xC0  # forge baseline marker
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="quality_div"):
        encode_jpeg(a12, quality_div=32, bits=12)


# --- animated GIF (round 10: multi-frame decode + compositing) ------------

def _gif_animated(w_screen, h_screen, palette, frames, bg=0):
    """Assemble a GIF89a animation: frames are (x, y, w, h, indices,
    disposal, delay_cs, tidx) tuples; LZW via the real encoder."""
    import struct

    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    min_code = max(2, depth)
    gct = b"".join(bytes(c) for c in palette) + b"\x00\x00\x00" * (
        (1 << depth) - n)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w_screen, h_screen, 0x80 | (depth - 1),
                       bg, 0)
    out += gct
    for x, y, w, h, idx, disposal, delay_cs, tidx in frames:
        gflags = (disposal << 2) | (1 if tidx is not None else 0)
        out += b"\x21\xF9\x04" + struct.pack(
            "<BHB", gflags, delay_cs, tidx if tidx is not None else 0)
        out += b"\x00"
        out += b"\x2C" + struct.pack("<HHHHB", x, y, w, h, 0)
        out += bytes([min_code])
        data = _gif_pack(_gif_encode_lzw(idx, min_code), None)
        i = 0
        while i < len(data):
            blk = data[i:i + 255]
            out += bytes([len(blk)]) + blk
            i += 255
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def test_gif_animation_frames_and_delays():
    import numpy as np

    from sparkdon.multimodal import decode_gif_frames

    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    # frame 1: full 4x2 screen of red; frame 2: 2x1 green patch at (1,1)
    f1 = [1] * 8
    f2 = [2, 2]
    gif = _gif_animated(4, 2, pal, [
        (0, 0, 4, 2, f1, 0, 5, None),
        (1, 1, 2, 1, f2, 0, 10, None),
    ])
    frames = decode_gif_frames(gif)
    assert [d for _, d in frames] == [50, 100]
    a, b = frames[0][0], frames[1][0]
    assert (a == (255, 0, 0)).all()
    assert tuple(b[1, 1]) == (0, 255, 0) and tuple(b[1, 2]) == (0, 255, 0)
    assert tuple(b[0, 0]) == (255, 0, 0)  # untouched canvas persists


def test_gif_animation_transparency_and_disposal():
    import numpy as np

    from sparkdon.multimodal import decode_gif_frames

    pal = [(9, 9, 9), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    f1 = [1, 2, 1, 2]  # 2x2 checkerboard red/green
    # frame 2 overlays blue with index-2 transparent: only where f1 had
    # red does blue land; disposal 2 then restores bg over its rect
    f2 = [3, 2, 2, 3]
    f3 = [2, 2, 2, 2]  # full green after bg-restore
    gif = _gif_animated(2, 2, pal, [
        (0, 0, 2, 2, f1, 0, 1, None),
        (0, 0, 2, 2, f2, 2, 1, 2),
        (0, 0, 2, 2, f3, 0, 1, None),
    ], bg=0)
    frames = decode_gif_frames(gif)
    assert len(frames) == 3
    m2 = frames[1][0]
    assert tuple(m2[0, 0]) == (0, 0, 255)   # blue drew
    assert tuple(m2[0, 1]) == (0, 255, 0)   # transparent kept green
    assert tuple(m2[1, 1]) == (0, 0, 255)
    m3 = frames[2][0]
    assert (m3 == (0, 255, 0)).all()


def test_gif_animation_disposal_previous():
    import numpy as np

    from sparkdon.multimodal import decode_gif_frames

    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    gif = _gif_animated(2, 1, pal, [
        (0, 0, 2, 1, [1, 1], 0, 1, None),   # red
        (0, 0, 1, 1, [2], 3, 1, None),      # green patch, restore-prev
        (1, 0, 1, 1, [3], 0, 1, None),      # blue right pixel
    ])
    frames = decode_gif_frames(gif)
    m2 = frames[1][0]
    assert tuple(m2[0, 0]) == (0, 255, 0)
    m3 = frames[2][0]
    # disposal 3 restored the all-red canvas before frame 3 drew
    assert tuple(m3[0, 0]) == (255, 0, 0)
    assert tuple(m3[0, 1]) == (0, 0, 255)


def test_gif_single_frame_still_decodes_via_frames_api():
    from sparkdon.multimodal import decode_gif_frames

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0]
    gif = _gif_bytes(idx, 4, 2, palette, 2, _gif_encode_lzw(idx, 2))
    # GIF87a (no GCE): one frame, delay 0
    frames = decode_gif_frames(gif)
    assert len(frames) == 1 and frames[0][1] == 0
    assert frames[0][0].shape == (2, 4, 3)


def test_sample_frames_real_gif_decode(spark):
    from sparkdon.multimodal import decode_image, sample_frames

    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    # 3 frames, 60 ms apart -> ts 0, 60, 120; every_ms=100 keeps 0 and 120
    gif = _gif_animated(2, 1, pal, [
        (0, 0, 2, 1, [1, 1], 0, 6, None),
        (0, 0, 2, 1, [2, 2], 0, 6, None),
        (0, 0, 2, 1, [3, 3], 0, 6, None),
    ])
    media = spark.createDataFrame(
        [(7, "video", bytearray(gif), ("image/gif", 2, 1, 180))],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    rows = sample_frames(media, every_ms=100, decode_real=True).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in rows] == [
        (7, 0), (7, 120)]
    first = decode_image(bytes(rows[0]["frame_ppm"]))
    assert tuple(first[0, 0]) == (255, 0, 0)
    last = decode_image(bytes(rows[1]["frame_ppm"]))
    assert tuple(last[0, 0]) == (0, 0, 255)


# --- lossless JPEG (round 10: SOF3, T.81 Annex H) --------------------------

def test_jpeg_lossless_all_predictors_exact():
    import numpy as np

    from sparkdon.jpeg import decode_jpeg, encode_jpeg_lossless

    rng = np.random.default_rng(1234)
    for pred in range(1, 8):
        arr = rng.integers(0, 256, (9, 5, 3), dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg_lossless(arr, predictor=pred))
                == arr).all(), pred
    gray = rng.integers(0, 256, (6, 11), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_lossless(gray, predictor=7))
    assert (got == np.repeat(gray[:, :, None], 3, axis=2)).all()


def test_jpeg_lossless_point_transform():
    import numpy as np

    from sparkdon.jpeg import decode_jpeg, encode_jpeg_lossless

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_lossless(arr, point_transform=2))
    assert (got[:, :, 0] == (arr >> 2) << 2).all()


def test_jpeg_lossless_flat_and_gradient():
    import numpy as np

    from sparkdon.jpeg import decode_jpeg, encode_jpeg_lossless

    flat = np.full((16, 16, 3), 200, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg_lossless(flat, predictor=4))
            == flat).all()
    grad = np.tile(np.arange(256, dtype=np.uint8), (4, 1))
    got = decode_jpeg(encode_jpeg_lossless(grad, predictor=1))
    assert (got[:, :, 0] == grad).all()


def test_jpeg_lossless_boundaries():
    import numpy as np
    import pytest as _pytest

    from sparkdon.jpeg import encode_jpeg_lossless

    arr = np.zeros((4, 4), dtype=np.uint8)
    body = bytearray(encode_jpeg_lossless(arr))
    # patch DRI in front of SOS to hit the restart boundary
    sos = body.find(b"\xff\xda")
    body[sos:sos] = b"\xff\xdd\x00\x04\x00\x02"
    from sparkdon.jpeg import decode_jpeg

    with _pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg(bytes(body))


def test_jpeg_lossless_16bit_and_category16():
    import numpy as np

    from sparkdon.jpeg import decode_jpeg, encode_jpeg_lossless

    rng = np.random.default_rng(11)
    arr16 = rng.integers(0, 65536, (7, 5), dtype=np.uint16)
    for pred in (1, 4, 7):
        got = decode_jpeg(
            encode_jpeg_lossless(arr16, predictor=pred, precision=16))
        assert (got[:, :, 0] == (arr16 >> 8).astype(np.uint8)).all()
    # alternating 0/32768 under predictor 1 forces the special
    # all-16-bit residual category (no extra bits)
    arr = np.array([[0, 32768, 0, 32768]], dtype=np.uint16)
    got = decode_jpeg(encode_jpeg_lossless(arr, predictor=1, precision=16))
    assert (got[:, :, 0] == (arr >> 8).astype(np.uint8)).all()


# --- FLAC (round 10: lossless audio decode + encoder twin) -----------------

def test_flac_roundtrip_shapes_and_modes():
    import numpy as np

    from sparkdon.flac import decode_flac, encode_flac

    rng = np.random.default_rng(3)
    t = np.arange(3000)
    sine = (3000 * np.sin(t / 20.0)).astype(np.int16)
    noise = rng.integers(-32768, 32768, 3000).astype(np.int16)
    stereo = np.stack([sine, (sine // 2 + 17).astype(np.int16)], axis=1)
    cases = [
        (sine, {}), (noise, {"order": 0}), (noise, {"order": -1}),
        (sine, {"order": 4}), (sine, {"block_size": 192}),
        (stereo, {}), (stereo, {"stereo": "left_side"}),
        (stereo, {"stereo": "mid_side"}),
        (np.full(500, -123, np.int16), {}),
    ]
    for data, kw in cases:
        got, rate = decode_flac(encode_flac(data, 22050, **kw))
        want = data if data.ndim == 2 else data[:, None]
        assert rate == 22050 and (got == want).all(), kw


def test_flac_compresses_smooth_signals():
    import numpy as np

    from sparkdon.flac import encode_flac

    t = np.arange(8000)
    sine = (3000 * np.sin(t / 30.0)).astype(np.int16)
    fixed = encode_flac(sine, 44100, order=4)
    verbatim = encode_flac(sine, 44100, order=-1)
    assert len(fixed) < len(verbatim) / 3


def test_flac_in_audio_feature_dispatch(spark):
    import numpy as np

    from sparkdon.flac import encode_flac
    from sparkdon.multimodal import extract_features

    sine = (2000 * np.sin(np.arange(2000) / 9.0)).astype(np.int16)
    payload = encode_flac(sine, 16000)
    media = spark.createDataFrame(
        [(3, "audio", bytearray(payload), ("audio/flac", None, None, None))],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    rows = extract_features(media, decode_real=True).collect()
    assert len(rows) == 1 and len(rows[0]["feature"]) > 0


def test_flac_rejects_garbage():
    import pytest as _pytest

    from sparkdon.flac import decode_flac

    with _pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFnotflac")


def test_sample_frames_gap_does_not_burst(spark):
    from sparkdon.multimodal import sample_frames

    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    # 5 s gap then rapid 100 ms frames: the bucket must not burst-keep
    gif = _gif_animated(2, 1, pal, [
        (0, 0, 2, 1, [1, 1], 0, 500, None),   # ts 0, next at 5000
        (0, 0, 2, 1, [2, 2], 0, 10, None),    # ts 5000 (kept)
        (0, 0, 2, 1, [3, 3], 0, 10, None),    # ts 5100 (< 5000+1000)
        (0, 0, 2, 1, [1, 1], 0, 10, None),    # ts 5200
    ])
    media = spark.createDataFrame(
        [(1, "video", bytearray(gif), ("image/gif", 2, 1, 5300))],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    rows = sample_frames(media, every_ms=1000, decode_real=True).collect()
    assert [r["frame_ts_ms"] for r in rows] == [0, 5000]


def test_gif_frame_rect_clips_to_screen():
    from sparkdon.multimodal import decode_gif_frames

    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    # second frame's 2x2 rect at (1, 0) runs past the 2x1 screen
    gif = _gif_animated(2, 1, pal, [
        (0, 0, 2, 1, [1, 1], 0, 1, None),
        (1, 0, 2, 2, [2, 3, 2, 3], 0, 1, None),
    ])
    frames = decode_gif_frames(gif)
    assert len(frames) == 2
    m = frames[1][0]
    assert m.shape == (1, 2, 3)
    assert tuple(m[0, 0]) == (255, 0, 0)  # untouched
    assert tuple(m[0, 1]) == (0, 255, 0)  # clipped draw kept in-screen


def test_jpeg_lossless_multiscan_raises():
    import struct

    import pytest as _pytest

    from sparkdon.jpeg import decode_jpeg, encode_jpeg_lossless
    import numpy as np

    body = bytearray(encode_jpeg_lossless(
        np.zeros((2, 2, 3), dtype=np.uint8)))
    # shrink the SOS to a single component (ns=1): legal multi-scan
    # layout the decoder does not support — must raise, not mis-decode
    sos = body.find(b"\xff\xda")
    ns = 1
    new_sos = (b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 * ns + 3)
               + bytes([ns, 1, 0x00, 1, 0, 0]))
    old_len = struct.unpack(">H", body[sos + 2:sos + 4])[0]
    body[sos:sos + 2 + old_len] = new_sos
    with _pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(bytes(body))


def test_flac_many_frames_and_short_tail():
    import numpy as np

    from sparkdon.flac import decode_flac, encode_flac

    # >2048 frames exercises the general UTF-8 frame-number form
    sine = (1000 * np.sin(np.arange(33600) / 7.0)).astype(np.int16)
    got, _ = decode_flac(encode_flac(sine, 8000, block_size=16))
    assert (got[:, 0] == sine).all()
    # tail block shorter than the predictor order
    x = np.concatenate([np.arange(4096), [5, 900]]).astype(np.int16)
    got, _ = decode_flac(encode_flac(x, 8000, block_size=4096, order=4))
    assert (got[:, 0] == x).all()


# --- metadata extraction (round 10: EXIF + FLAC tags) ----------------------

def _exif_jpeg():
    import struct

    def entry(tag, typ, cnt, val4):
        return struct.pack("<HHI", tag, typ, cnt) + val4

    make = b"ACME Corp\x00"
    tiff = bytearray(b"II" + struct.pack("<HI", 42, 8))
    n = 4
    ifd0 = struct.pack("<H", n)
    data_off = 8 + 2 + 12 * n + 4
    sub_off = data_off + len(make) + 8
    ifd0 += entry(0x010F, 2, len(make), struct.pack("<I", data_off))
    ifd0 += entry(0x0112, 3, 1, struct.pack("<HH", 6, 0))
    ifd0 += entry(0x829A, 5, 1, struct.pack("<I", data_off + len(make)))
    ifd0 += entry(0x8769, 4, 1, struct.pack("<I", sub_off))
    ifd0 += struct.pack("<I", 0)
    tiff += ifd0 + make + struct.pack("<II", 1, 250)
    tiff += (struct.pack("<H", 1)
             + entry(0xA002, 4, 1, struct.pack("<I", 4032))
             + struct.pack("<I", 0))
    app1 = b"Exif\x00\x00" + bytes(tiff)
    import struct as _s

    return (b"\xff\xd8\xff\xe1" + _s.pack(">H", len(app1) + 2) + app1
            + b"\xff\xd9")


def _tagged_flac():
    import struct

    import numpy as np

    from sparkdon.flac import encode_flac

    enc = bytearray(encode_flac(np.zeros(10, np.int16), 8000))
    vendor = b"sparkdon"
    comments = [b"TITLE=Test Song", b"ARTIST=Somebody"]
    body = struct.pack("<I", len(vendor)) + vendor
    body += struct.pack("<I", len(comments))
    for c in comments:
        body += struct.pack("<I", len(c)) + c
    enc[4] &= 0x7F  # STREAMINFO no longer last
    block = bytes([0x84]) + len(body).to_bytes(3, "big") + body
    si_len = int.from_bytes(enc[5:8], "big")
    enc[8 + si_len:8 + si_len] = block
    return bytes(enc)


def test_jpeg_exif_walk():
    from sparkdon.multimodal import jpeg_exif

    got = jpeg_exif(_exif_jpeg())
    assert got == {"make": "ACME Corp", "orientation": 6,
                   "exposure_time": "1/250", "pixel_x_dimension": 4032}
    assert jpeg_exif(b"\xff\xd8\xff\xd9") == {}


def test_flac_vorbis_comments():
    from sparkdon.flac import decode_flac, flac_tags

    payload = _tagged_flac()
    assert flac_tags(payload) == {"TITLE": "Test Song",
                                  "ARTIST": "Somebody"}
    got, _ = decode_flac(payload)  # extra metadata block doesn't break decode
    assert got.shape == (10, 1)


def test_extract_metadata_stage(spark):
    from sparkdon.multimodal import extract_metadata

    rows = [
        (1, "image", bytearray(_exif_jpeg()), ("image/jpeg", None, None, None)),
        (2, "audio", bytearray(_tagged_flac()), ("audio/flac", None, None, None)),
        (3, "image", bytearray(b"not media"), ("application/x", None, None, None)),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary, "
              "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    got = {r["media_id"]: r["metadata"]
           for r in extract_metadata(media).collect()}
    assert got[1]["make"] == "ACME Corp" and got[1]["orientation"] == "6"
    assert got[2] == {"TITLE": "Test Song", "ARTIST": "Somebody"}
    assert got[3] == {}


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 400),
    channels=st.integers(1, 2),
    order=st.integers(-1, 4),
    block=st.sampled_from([16, 192, 256, 4096]),
    mode=st.sampled_from(["independent", "left_side", "mid_side"]),
    seed=st.integers(0, 2**32 - 1),
)
def test_flac_roundtrip_property(n, channels, order, block, mode, seed):
    import numpy as np

    from sparkdon.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    kind = seed % 3
    if kind == 0:      # white noise, full range
        data = rng.integers(-32768, 32768, (n, channels)).astype(np.int16)
    elif kind == 1:    # smooth ramp + noise
        base = (np.linspace(-3000, 3000, n)[:, None]
                + rng.normal(0, 40, (n, channels)))
        data = np.clip(base, -32768, 32767).astype(np.int16)
    else:              # mostly-constant with spikes
        data = np.full((n, channels), 7, np.int16)
        idx = rng.integers(0, n, max(1, n // 20))
        data[idx] = rng.integers(-32768, 32768, (len(idx), channels))
    kw = {"stereo": mode} if channels == 2 else {}
    got, rate = decode_flac(
        encode_flac(data, 48000, block_size=block, order=order, **kw))
    assert rate == 48000
    assert got.shape == data.shape and (got == data).all()


def test_png_and_wav_metadata():
    import struct
    import zlib

    from sparkdon.multimodal import png_metadata, wav_info_tags

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 12, 7, 8, 2, 0, 0, 0))
           + chunk(b"tEXt", b"Author\x00somebody")
           + chunk(b"iTXt", b"Comment\x00\x00\x00\x00\x00hello utf8")
           + chunk(b"pHYs", struct.pack(">IIB", 2835, 2835, 1))
           + chunk(b"IEND", b""))
    got = png_metadata(png)
    assert got["width"] == 12 and got["height"] == 7
    assert got["Author"] == "somebody" and got["Comment"] == "hello utf8"
    assert got["pixels_per_unit_x"] == 2835

    info = (b"INFO"
            + b"INAM" + struct.pack("<I", 5) + b"Song\x00\x00"
            + b"IART" + struct.pack("<I", 2) + b"Me")
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(info)) + b"WAVE"
           + b"LIST" + struct.pack("<I", len(info)) + info)
    got = wav_info_tags(wav)
    assert got == {"title": "Song", "artist": "Me"}


def test_ogg_flac_roundtrip_and_long_packet():
    import numpy as np

    from sparkdon.flac import decode_ogg_flac, encode_ogg_flac

    sine = (2000 * np.sin(np.arange(9000) / 11.0)).astype(np.int16)
    got, rate = decode_ogg_flac(encode_ogg_flac(sine, 44100,
                                                block_size=1024))
    assert rate == 44100 and (got[:, 0] == sine).all()
    # verbatim noise makes the frame packet exceed one page (65 KB)
    rng = np.random.default_rng(1)
    noise = rng.integers(-32768, 32768, 40000).astype(np.int16)
    got, _ = decode_ogg_flac(encode_ogg_flac(noise, 16000, order=-1))
    assert (got[:, 0] == noise).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="OggS"):
        decode_ogg_flac(b"fLaCnotogg")


def test_metadata_corrupt_inputs_never_crash(spark):
    import struct

    from sparkdon.multimodal import extract_metadata, jpeg_exif

    # cyclic sub-IFD pointer, truncated TIFF, corrupt FLAC comment count
    tiff = bytearray(b"II" + struct.pack("<HI", 42, 8))
    tiff += (struct.pack("<H", 1)
             + struct.pack("<HHI", 0x8769, 4, 1) + struct.pack("<I", 8)
             + struct.pack("<I", 0))
    app1 = b"Exif\x00\x00" + bytes(tiff)
    cyclic = (b"\xff\xd8\xff\xe1" + struct.pack(">H", len(app1) + 2)
              + app1 + b"\xff\xd9")
    assert jpeg_exif(cyclic) == {}
    truncated = b"\xff\xd8\xff\xe1\x00\x0bExif\x00\x00II*"
    bad = [
        (1, "image", bytearray(cyclic), ("image/jpeg", None, None, None)),
        (2, "image", bytearray(truncated), ("image/jpeg", None, None, None)),
        (3, "image", bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x02"
                               + b"pHYs" + b"\x01\x02"),
         ("image/png", None, None, None)),
        (4, "audio", bytearray(b"RIFF\xff\xff\xff\xffWAVELIST\xff\xff\xff\xffINFO"),
         ("audio/wav", None, None, None)),
    ]
    media = spark.createDataFrame(
        bad, "media_id long, modality string, payload binary, "
             "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    got = {r["media_id"]: r["metadata"]
           for r in extract_metadata(media).collect()}
    assert all(v == {} for v in got.values())


def test_exif_survives_fill_bytes():
    from sparkdon.multimodal import jpeg_exif

    good = _exif_jpeg()
    filled = good[:2] + b"\xff\xff" + good[2:]
    assert jpeg_exif(filled)["make"] == "ACME Corp"


# --- TIFF (round 10: baseline strips, none/PackBits/LZW) -------------------

def test_tiff_roundtrip_matrix():
    import numpy as np

    from sparkdon.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (37, 23, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (19, 41), dtype=np.uint8)
    for arr in (rgb, gray):
        want = (np.repeat(arr[:, :, None], 3, 2)
                if arr.ndim == 2 else arr)
        for comp in ("none", "packbits", "lzw"):
            for bo in ("<", ">"):
                got = decode_tiff(encode_tiff(
                    arr, compression=comp, byte_order=bo,
                    rows_per_strip=8))
                assert (got == want).all(), (comp, bo)


def test_tiff_lzw_compresses_smooth():
    import numpy as np

    from sparkdon.tiff import encode_tiff

    smooth = np.tile(np.arange(64, dtype=np.uint8), (64, 1))
    assert len(encode_tiff(smooth, compression="lzw")) < \
        len(encode_tiff(smooth)) / 2


def test_tiff_via_decode_image_dispatch():
    import numpy as np

    from sparkdon.multimodal import decode_image
    from sparkdon.tiff import encode_tiff

    arr = np.full((5, 4, 3), 9, dtype=np.uint8)
    got = decode_image(encode_tiff(arr))
    assert (got == arr).all()


def test_tiff_boundaries():
    import pytest as _pytest

    from sparkdon.tiff import decode_tiff

    with _pytest.raises(ValueError, match="TIFF"):
        decode_tiff(b"PK\x03\x04zipfile")


def test_id3_tags_and_dispatch(spark):
    from sparkdon.multimodal import extract_metadata, id3_tags

    def syncsafe(n):
        return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                      (n >> 7) & 0x7F, n & 0x7F])

    frames = b""
    for fid, val in [(b"TIT2", b"\x03My Song"), (b"TPE1", b"\x00Artist"),
                     (b"TDRC", b"\x032024")]:
        frames += fid + len(val).to_bytes(4, "big") + b"\x00\x00" + val
    payload = (b"ID3\x03\x00\x00" + syncsafe(len(frames) + 20) + frames
               + b"\x00" * 20 + b"\xff\xfbAUDIO")
    assert id3_tags(payload) == {"title": "My Song", "artist": "Artist",
                                 "date": "2024"}
    media = spark.createDataFrame(
        [(9, "audio", bytearray(payload), ("audio/mpeg", None, None, None))],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    got = extract_metadata(media).collect()[0]["metadata"]
    assert got["title"] == "My Song"


# --- AVI (round 10: MJPEG + raw-DIB video container) ------------------------

def test_avi_mjpeg_roundtrip():
    import numpy as np

    from sparkdon.avi import decode_avi_frames, encode_avi_mjpeg

    frames = [np.full((16, 16, 3), c, dtype=np.uint8)
              for c in (10, 120, 240)]
    got = decode_avi_frames(encode_avi_mjpeg(frames, fps=10))
    assert len(got) == 3
    for (arr, delay), want in zip(got, frames):
        assert delay == 100.0
        assert arr.shape == (16, 16, 3)
        # flat frames through the JPEG twin: DC-only, near-exact
        assert int(np.abs(arr.astype(int) - want.astype(int)).max()) <= 2


def test_avi_dib_roundtrip_exact():
    import numpy as np

    from sparkdon.avi import decode_avi_frames, encode_avi_dib

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
              for _ in range(2)]
    got = decode_avi_frames(encode_avi_dib(frames, fps=25))
    assert len(got) == 2
    for (arr, delay), want in zip(got, frames):
        assert delay == 40.0
        assert (arr == want).all()


def test_avi_info_and_metadata_dispatch(spark):
    import numpy as np

    from sparkdon.avi import avi_info, encode_avi_mjpeg
    from sparkdon.multimodal import extract_metadata

    avi = encode_avi_mjpeg(
        [np.zeros((8, 12, 3), np.uint8)] * 4, fps=20)
    info = avi_info(avi)
    assert info == {"width": 12, "height": 8, "frames": 4, "fps": 20.0,
                    "duration_ms": 200, "codec": "MJPG"}
    media = spark.createDataFrame(
        [(3, "video", bytearray(avi), ("video/x-msvideo", 12, 8, 200))],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    md = extract_metadata(media).collect()[0]["metadata"]
    assert md["codec"] == "MJPG" and md["frames"] == "4"


def test_sample_frames_real_avi_decode(spark):
    import numpy as np

    from sparkdon.avi import encode_avi_mjpeg
    from sparkdon.multimodal import decode_image, sample_frames

    # 4 frames at 10 fps -> ts 0,100,200,300; every_ms=150 keeps 0,200
    frames = [np.full((4, 4, 3), c, dtype=np.uint8)
              for c in (20, 80, 160, 220)]
    media = spark.createDataFrame(
        [(5, "video", bytearray(encode_avi_mjpeg(frames, fps=10)),
          ("video/x-msvideo", 4, 4, 400))],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    rows = sample_frames(media, every_ms=150, decode_real=True).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in rows] == [
        (5, 0), (5, 200)]
    first = decode_image(bytes(rows[0]["frame_ppm"]))
    assert abs(int(first[0, 0, 0]) - 20) <= 2
    third = decode_image(bytes(rows[1]["frame_ppm"]))
    assert abs(int(third[0, 0, 0]) - 160) <= 2


def test_avi_boundaries():
    import numpy as np
    import pytest as _pytest

    from sparkdon.avi import decode_avi_frames, encode_avi_mjpeg
    from sparkdon.multimodal import decode_video_frames

    with _pytest.raises(ValueError, match="video container"):
        decode_video_frames(b"\x00\x01\x02\x03junk....")
    with _pytest.raises(ValueError, match="AVI"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    # an inter-frame codec: same container, handler is not MJPEG-family
    h264 = encode_avi_mjpeg([np.zeros((4, 4, 3), np.uint8)]) \
        .replace(b"MJPG", b"H264")
    with _pytest.raises(NotImplementedError, match="codec"):
        decode_avi_frames(h264)


def test_tiff_metadata_walker():
    import struct

    import numpy as np

    from sparkdon.multimodal import tiff_metadata
    from sparkdon.tiff import encode_tiff

    # encoder output: geometry + compression from the baseline tags
    md = tiff_metadata(encode_tiff(np.zeros((7, 9, 3), np.uint8),
                                   compression="lzw"))
    assert (md["width"], md["height"], md["compression"]) == (9, 7, 5)

    # hand-built IFD with an ASCII Make tag, big-endian: the EXIF
    # walker reads it straight off the file
    make = b"ACME Scan\x00"
    entries = [
        struct.pack(">HHI", 256, 3, 1) + struct.pack(">HH", 40, 0),
        struct.pack(">HHI", 257, 3, 1) + struct.pack(">HH", 30, 0),
        struct.pack(">HHII", 271, 2, len(make), 8 + 2 + 3 * 12 + 4),
    ]
    tif = (b"MM\x00*" + struct.pack(">I", 8)
           + struct.pack(">H", 3) + b"".join(entries)
           + struct.pack(">I", 0) + make)
    md = tiff_metadata(tif)
    assert md["make"] == "ACME Scan"
    assert (md["width"], md["height"]) == (40, 30)


def _mp3_frame_header(version=3, br_idx=9, sr_idx=0, mode=3):
    # sync(11) version(2) layer=01(2) noprot(1) | br(4) sr(2) pad(1)
    # priv(1) | mode(2) ...
    b1 = 0xE0 | (version << 3) | (1 << 1) | 1
    b2 = (br_idx << 4) | (sr_idx << 2)
    b3 = mode << 6
    return bytes([0xFF, b1, b2, b3])


def test_mpeg_audio_info_cbr_and_xing():
    from sparkdon.multimodal import mpeg_audio_info

    # MPEG-1 Layer III mono, 128 kbps, 44100 Hz, 16000 bytes ≈ 1000 ms
    cbr = _mp3_frame_header() + b"\x00" * 15996
    got = mpeg_audio_info(cbr)
    assert got["codec"] == "mp3" and got["bitrate_kbps"] == 128
    assert got["sample_rate"] == 44100 and got["channels"] == 1
    assert got["duration_ms"] == 1000

    # Xing VBR header: mono MPEG-1 side info is 17 bytes
    xing = (_mp3_frame_header() + b"\x00" * 17 + b"Xing"
            + (1).to_bytes(4, "big") + (383).to_bytes(4, "big")
            + b"\x00" * 200)
    got = mpeg_audio_info(xing)
    assert got["frames"] == 383 and got["vbr"] is True
    assert got["duration_ms"] == 383 * 1152 * 1000 // 44100

    assert mpeg_audio_info(b"\x00" * 100) == {}


def test_mp3_metadata_dispatch_merges_id3(spark):
    from sparkdon.multimodal import extract_metadata

    def syncsafe(n):
        return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                      (n >> 7) & 0x7F, n & 0x7F])

    frame = b"TIT2" + len(b"\x03Song").to_bytes(4, "big") + b"\x00\x00" \
        + b"\x03Song"
    payload = (b"ID3\x03\x00\x00" + syncsafe(len(frame)) + frame
               + _mp3_frame_header(sr_idx=1) + b"\x00" * 6000)
    media = spark.createDataFrame(
        [(2, "audio", bytearray(payload), ("audio/mpeg", None, None, None))],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    md = extract_metadata(media).collect()[0]["metadata"]
    assert md["title"] == "Song" and md["sample_rate"] == "48000"
    assert md["bitrate_kbps"] == "128"


def test_tiff_lzw_table_reset_roundtrip():
    import numpy as np

    from sparkdon.tiff import decode_tiff, encode_tiff

    # 60000 random bytes in one strip force the 4094-entry LZW table
    # reset mid-stream — encoder CLEAR and decoder re-init must agree
    rng = np.random.default_rng(99)
    arr = rng.integers(0, 256, (100, 200, 3), dtype=np.uint8)
    got = decode_tiff(encode_tiff(arr, compression="lzw",
                                  rows_per_strip=100))
    assert (got == arr).all()


def test_mpeg_audio_xing_behind_crc():
    from sparkdon.multimodal import mpeg_audio_info

    hdr = bytearray(_mp3_frame_header())
    hdr[1] &= 0xFE  # protection bit clear = CRC present
    payload = (bytes(hdr) + b"\xBE\xEF" + b"\x00" * 17 + b"Xing"
               + (1).to_bytes(4, "big") + (77).to_bytes(4, "big")
               + b"\x00" * 100)
    got = mpeg_audio_info(payload)
    assert got["frames"] == 77


def test_tiff_palette_roundtrip():
    import numpy as np

    from sparkdon.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (11, 7), dtype=np.uint8)
    for comp in ("none", "lzw"):
        got = decode_tiff(encode_tiff(idx, compression=comp, palette=pal))
        assert (got == pal[idx]).all(), comp


def test_tiff_tiled_roundtrip():
    import numpy as np

    from sparkdon.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(31)
    # 37x50 with 16x16 tiles: partial tiles on both edges
    arr = rng.integers(0, 256, (37, 50, 3), dtype=np.uint8)
    for comp in ("none", "packbits", "lzw"):
        got = decode_tiff(encode_tiff(arr, compression=comp,
                                      tile=(16, 16)))
        assert (got == arr).all(), comp
    gray = rng.integers(0, 256, (20, 33), dtype=np.uint8)
    got = decode_tiff(encode_tiff(gray, compression="lzw", tile=(8, 32),
                                  byte_order=">"))
    assert (got == np.repeat(gray[:, :, None], 3, axis=2)).all()


def _box(fourcc, body):
    import struct
    return struct.pack(">I", len(body) + 8) + fourcc + body


def test_mp4_info(spark):
    import struct

    from sparkdon.multimodal import extract_metadata, mp4_info

    mvhd = (b"\x00" + b"\x00" * 3 + b"\x00" * 8
            + struct.pack(">II", 1000, 5432) + b"\x00" * 80)
    tkhd = (b"\x00" + b"\x00" * 3 + b"\x00" * 72
            + struct.pack(">II", 640 << 16, 360 << 16))
    stsd = (b"\x00" * 4 + struct.pack(">I", 1)
            + struct.pack(">I", 16) + b"avc1" + b"\x00" * 8)
    stbl = _box(b"stsd", stsd)
    minf = _box(b"stbl", stbl)
    mdia = _box(b"minf", minf)
    trak = _box(b"tkhd", tkhd) + _box(b"mdia", mdia)
    moov = _box(b"mvhd", mvhd) + _box(b"trak", trak)
    mp4 = (_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
           + _box(b"moov", moov) + _box(b"mdat", b"\x00" * 32))
    info = mp4_info(mp4)
    assert info == {"brand": "isom", "duration_ms": 5432,
                    "width": 640, "height": 360, "codecs": "avc1"}

    media = spark.createDataFrame(
        [(8, "video", bytearray(mp4), ("video/mp4", None, None, None))],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    md = extract_metadata(media).collect()[0]["metadata"]
    assert md["codecs"] == "avc1" and md["duration_ms"] == "5432"

    assert mp4_info(b"\x00\x00\x00\x08free") == {}


def test_mkv_info(spark):
    import struct

    from sparkdon.multimodal import extract_metadata, mkv_info

    def el(eid_bytes, body):
        # size as a 2-byte vint (0x40xx form handles our sizes)
        assert len(body) < 0x3FFF
        return eid_bytes + struct.pack(">H", 0x4000 | len(body)) + body

    header = el(b"\x1aE\xdf\xa3", el(b"\x42\x82", b"webm"))
    info = el(b"\x15\x49\xa9\x66",
              el(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
              + el(b"\x44\x89", struct.pack(">d", 7500.0)))
    video = el(b"\xe0", el(b"\xb0", (1280).to_bytes(2, "big"))
               + el(b"\xba", (720).to_bytes(2, "big")))
    track = el(b"\xae", el(b"\x86", b"V_VP9") + video)
    tracks = el(b"\x16\x54\xae\x6b", track)
    mkv = header + el(b"\x18\x53\x80\x67", info + tracks)

    got = mkv_info(mkv)
    assert got == {"doctype": "webm", "duration_ms": 7500,
                   "codecs": "V_VP9", "width": 1280, "height": 720}

    media = spark.createDataFrame(
        [(9, "video", bytearray(mkv), ("video/webm", None, None, None))],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    md = extract_metadata(media).collect()[0]["metadata"]
    assert md["codecs"] == "V_VP9" and md["width"] == "1280"


def test_extract_text_skips_non_document_rows(spark):
    from sparkdon.multimodal import extract_text

    jpegish = b"\xff\xd8\xff\xe0" + bytes(range(256)) * 20
    rows = [(1, "document", bytearray(b"plain"), (None, None, None, None)),
            (2, "image", bytearray(jpegish), (None, None, None, None))]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary, "
              "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    got = extract_text(media).collect()
    # the image row must not surface as U+FFFD garbage text
    assert [(r["media_id"], r["text"]) for r in got] == [(1, "plain")]


def test_avi_dib_short_chunk_controlled_error():
    import struct

    import numpy as np
    import pytest as _pytest

    from sparkdon.avi import decode_avi_frames, encode_avi_dib

    # w=5 → stride 16 > w*3=15; truncate the frame to unpadded size
    avi = bytearray(encode_avi_dib([np.zeros((2, 5, 3), np.uint8)]))
    pos = bytes(avi).find(b"00db")
    struct.pack_into("<I", avi, pos + 4, 30)  # claim only 30 bytes
    with _pytest.raises(NotImplementedError):
        decode_avi_frames(bytes(avi))


def test_id3v22_frames():
    from sparkdon.multimodal import id3_tags

    frames = (b"TT2" + (7).to_bytes(3, "big") + b"\x00Song22"
              + b"TP1" + (4).to_bytes(3, "big") + b"\x00Art")
    size = len(frames) + 10
    payload = (b"ID3\x02\x00\x00"
               + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                        (size >> 7) & 0x7F, size & 0x7F])
               + frames + b"\x00" * 10)
    assert id3_tags(payload) == {"title": "Song22", "artist": "Art"}
    # compressed v2.2 tags are unreadable by spec
    assert id3_tags(b"ID3\x02\x00\x40" + b"\x00" * 20) == {}


def test_mkv_duration_bad_size_skipped():
    import struct

    from sparkdon.multimodal import mkv_info

    def el(eid_bytes, body):
        return eid_bytes + struct.pack(">H", 0x4000 | len(body)) + body

    header = el(b"\x1aE\xdf\xa3", el(b"\x42\x82", b"webm"))
    info = el(b"\x15\x49\xa9\x66", el(b"\x44\x89", b"\x01\x02"))  # size 2
    mkv = header + el(b"\x18\x53\x80\x67", info)
    got = mkv_info(mkv)
    assert "duration_ms" not in got and got["doctype"] == "webm"


def test_tiff_predictor2_roundtrip():
    import numpy as np

    from sparkdon.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(41)
    # smooth gradient: predictor 2 should also shrink the LZW output
    grad = (np.arange(64)[None, :] * 3 % 256).astype(np.uint8) \
        + np.arange(48)[:, None].astype(np.uint8)
    rgb = np.repeat(grad[:, :, None], 3, axis=2)
    noisy = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    for arr in (rgb, noisy):
        got = decode_tiff(encode_tiff(arr, compression="lzw", predictor=2))
        assert (got == arr).all()
        got = decode_tiff(encode_tiff(arr, compression="lzw", predictor=2,
                                      tile=(16, 16)))
        assert (got == arr).all()
    assert len(encode_tiff(rgb, compression="lzw", predictor=2)) < \
        len(encode_tiff(rgb, compression="lzw"))


def test_tiff_deflate_roundtrip():
    import numpy as np

    from sparkdon.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(51)
    arr = rng.integers(0, 256, (21, 34, 3), dtype=np.uint8)
    for pred in (1, 2):
        for tile in (None, (16, 16)):
            got = decode_tiff(encode_tiff(arr, compression="deflate",
                                          predictor=pred, tile=tile))
            assert (got == arr).all(), (pred, tile)


def test_id3_v23_tag_level_unsync():
    from sparkdon.multimodal import id3_tags

    frame = b"TIT2" + (6).to_bytes(4, "big") + b"\x00\x00" + b"\x00Hi\xff!"
    body = frame.replace(b"\xff", b"\xff\x00")  # tag-level unsync
    size = len(body)
    payload = (b"ID3\x03\x00\x80"
               + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                        (size >> 7) & 0x7F, size & 0x7F]) + body)
    assert id3_tags(payload) == {"title": "Hi\xff!"}


def test_mkv_truncated_element_stops_cleanly():
    import struct

    from sparkdon.multimodal import mkv_info

    def el(eid_bytes, body):
        return eid_bytes + struct.pack(">H", 0x4000 | len(body)) + body

    header = el(b"\x1aE\xdf\xa3", el(b"\x42\x82", b"webm"))
    dur = b"\x44\x89" + struct.pack(">H", 0x4000 | 8) + b"\x01" * 4
    info = el(b"\x15\x49\xa9\x66", dur)  # Duration claims 8, has 4
    mkv = header + el(b"\x18\x53\x80\x67", info)
    # truncation inside Info: walk stops, no garbage duration
    got = mkv_info(mkv[:len(mkv) - 1])
    assert "duration_ms" not in got and got["doctype"] == "webm"


def _ogg_page(serial, seq, granule, packets, header_type=0):
    import struct

    segs, data = [], b""
    for pk in packets:
        segs += [255] * (len(pk) // 255) + [len(pk) % 255]
        data += pk
    return (b"OggS\x00" + bytes([header_type])
            + struct.pack("<qIIi", granule, serial, seq, 0)
            + bytes([len(segs)]) + bytes(segs) + data)


def _vorbis_comment_block(tags):
    body = (4).to_bytes(4, "little") + b"test"
    body += len(tags).to_bytes(4, "little")
    for k, v in tags.items():
        item = f"{k}={v}".encode()
        body += len(item).to_bytes(4, "little") + item
    return body


def test_ogg_vorbis_and_opus_info(spark):
    import struct

    from sparkdon.flac import ogg_info
    from sparkdon.multimodal import extract_metadata

    # Vorbis: id header (packet 1) + comments (packet 2)
    ident = (b"\x01vorbis" + b"\x00" * 4 + bytes([2])
             + struct.pack("<I", 44100) + b"\x00" * 13)
    comments = b"\x03vorbis" + _vorbis_comment_block(
        {"TITLE": "Oggy", "ARTIST": "Band"}) + b"\x01"
    vorbis = (_ogg_page(7, 0, 0, [ident], header_type=2)
              + _ogg_page(7, 1, 0, [comments])
              + _ogg_page(7, 2, 88200, [b"\x00audio"], header_type=4))
    got = ogg_info(vorbis)
    assert got["codec"] == "vorbis" and got["channels"] == 2
    assert got["sample_rate"] == 44100 and got["duration_ms"] == 2000
    assert got["TITLE"] == "Oggy"

    # Opus: OpusHead + OpusTags; 48kHz granule minus pre-skip
    head = (b"OpusHead\x01" + bytes([1]) + struct.pack("<H", 312)
            + struct.pack("<I", 16000) + b"\x00\x00\x00")
    tags = b"OpusTags" + _vorbis_comment_block({"TITLE": "Opusy"})
    opus = (_ogg_page(9, 0, 0, [head], header_type=2)
            + _ogg_page(9, 1, 0, [tags])
            + _ogg_page(9, 2, 48000 + 312, [b"\x00a"], header_type=4))
    got = ogg_info(opus)
    assert got["codec"] == "opus" and got["channels"] == 1
    assert got["duration_ms"] == 1000 and got["TITLE"] == "Opusy"

    # the metadata stage routes OggS through ogg_info now
    media = spark.createDataFrame(
        [(30, "audio", bytearray(vorbis), ("audio/ogg", None, None, None))],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    md = extract_metadata(media).collect()[0]["metadata"]
    assert md["codec"] == "vorbis" and md["TITLE"] == "Oggy"


def test_ogg_flac_info_still_tagged():
    from sparkdon.flac import encode_ogg_flac, ogg_info

    import numpy as np

    samples = np.zeros((512, 1), dtype=np.int16)
    got = ogg_info(encode_ogg_flac(samples, 8000))
    assert got["codec"] == "flac"


def test_ogg_info_robustness_and_flac_duration():
    import numpy as np

    from sparkdon.flac import encode_ogg_flac, ogg_info

    # truncated id headers degrade to just the codec key
    assert ogg_info(_ogg_page(3, 0, 0, [b"\x01vorbis\x00\x00"],
                              header_type=2)) == {"codec": "vorbis"}
    assert ogg_info(_ogg_page(3, 0, 0, [b"OpusHead\x01"],
                              header_type=2)) == {"codec": "opus"}

    # a corrupt negative granule must not emit a negative duration
    import struct
    ident = (b"\x01vorbis" + b"\x00" * 4 + bytes([1])
             + struct.pack("<I", 8000) + b"\x00" * 13)
    bad = (_ogg_page(4, 0, 0, [ident], header_type=2)
           + _ogg_page(4, 1, -5, [b"x"], header_type=4))
    got = ogg_info(bad)
    assert "duration_ms" not in got and got["sample_rate"] == 8000

    # FLAC-in-Ogg now reports rate/channels/duration from STREAMINFO
    samples = np.zeros((4000, 1), dtype=np.int16)
    got = ogg_info(encode_ogg_flac(samples, 8000))
    assert got["codec"] == "flac" and got["sample_rate"] == 8000
    assert got["channels"] == 1 and got["duration_ms"] == 500


# --- EXIF orientation honored in decode (round 11, VERDICT r10 #7) ---------

def _asym():
    import numpy as np

    # 2x3 asymmetric so every orientation transform is distinguishable
    return np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)


def test_apply_exif_orientation_table():
    import numpy as np

    from sparkdon.multimodal import apply_exif_orientation as ap

    a = _asym()
    assert np.array_equal(ap(a, 1), a)
    assert np.array_equal(ap(a, 2), a[:, ::-1])
    assert np.array_equal(ap(a, 3), a[::-1, ::-1])
    assert np.array_equal(ap(a, 4), a[::-1])
    assert ap(a, 5).shape == (3, 2, 3)
    assert np.array_equal(ap(a, 5), np.swapaxes(a, 0, 1))
    # 6: stored rotated; displaying rotates 90 CW — top-left of the
    # display is the stored bottom-left pixel
    assert ap(a, 6).shape == (3, 2, 3)
    assert np.array_equal(ap(a, 6)[0, 0], a[-1, 0])
    assert np.array_equal(ap(a, 6), np.rot90(a, -1))
    assert np.array_equal(ap(a, 7), np.swapaxes(a, 0, 1)[::-1, ::-1])
    assert np.array_equal(ap(a, 8), np.rot90(a, 1))
    assert np.array_equal(ap(a, 0), a)   # out-of-range → normal
    assert np.array_equal(ap(a, 9), a)
    # round-trip sanity: 6 then 8 content-inverse
    assert np.array_equal(ap(ap(a, 6), 8), a)


def test_decode_image_honors_orientation_6():
    import numpy as np

    from sparkdon.jpeg import encode_jpeg_lossless
    from sparkdon.multimodal import (decode_image, exif_orientation_segment,
                                     jpeg_exif)

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    plain = encode_jpeg_lossless(arr)   # lossless → exact pixel compare
    tagged = plain[:2] + exif_orientation_segment(6) + plain[2:]
    assert jpeg_exif(tagged)["orientation"] == 6
    out_plain = decode_image(plain)
    out_tagged = decode_image(tagged)
    assert np.array_equal(out_plain, arr)          # no tag → unchanged
    assert out_tagged.shape == (24, 16, 3)         # rotated to display
    assert np.array_equal(out_tagged, np.rot90(arr, -1))


def test_decode_image_orientation_1_and_missing_exif_noop():
    import numpy as np

    from sparkdon.jpeg import encode_jpeg_lossless
    from sparkdon.multimodal import decode_image, exif_orientation_segment

    arr = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    plain = encode_jpeg_lossless(arr)
    tagged = plain[:2] + exif_orientation_segment(1) + plain[2:]
    assert np.array_equal(decode_image(tagged), arr)


def test_tiff_orientation_tag_honored():
    import numpy as np

    from sparkdon.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 255, (10, 14, 3), dtype=np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(arr)), arr)
    rot = decode_tiff(encode_tiff(arr, orientation=6))
    assert rot.shape == (14, 10, 3)
    assert np.array_equal(rot, np.rot90(arr, -1))
    assert np.array_equal(
        decode_tiff(encode_tiff(arr, orientation=3)), arr[::-1, ::-1])


def test_tiff_16bit_samples_roundtrip():
    import numpy as np

    from sparkdon.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(3)
    a16 = rng.integers(0, 65535, (9, 13, 3), dtype=np.uint16)
    want = (a16 >> 8).astype(np.uint8)   # high-byte reduction contract
    for bo in ("<", ">"):
        for comp in ("none", "deflate"):
            got = decode_tiff(encode_tiff(
                a16, bits=16, byte_order=bo, compression=comp))
            assert np.array_equal(got, want), (bo, comp)
    # predictor runs at native 16-bit width
    got = decode_tiff(encode_tiff(a16, bits=16, predictor=2,
                                  compression="lzw"))
    assert np.array_equal(got, want)
    # 16-bit grayscale
    g16 = rng.integers(0, 65535, (7, 5), dtype=np.uint16)
    got = decode_tiff(encode_tiff(g16, bits=16))
    assert np.array_equal(got, np.repeat((g16 >> 8)[..., None], 3, axis=2)
                          .astype(np.uint8))


def test_tiff_planar_layout_roundtrip():
    import numpy as np

    from sparkdon.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, (11, 7, 3), dtype=np.uint8)
    for comp in ("none", "packbits", "lzw", "deflate"):
        got = decode_tiff(encode_tiff(arr, planar=True, compression=comp,
                                      rows_per_strip=4))
        assert np.array_equal(got, arr), comp
    # planar + predictor (per-plane differencing)
    got = decode_tiff(encode_tiff(arr, planar=True, predictor=2,
                                  compression="deflate", rows_per_strip=3))
    assert np.array_equal(got, arr)
    # planar 16-bit
    a16 = rng.integers(0, 65535, (6, 4, 3), dtype=np.uint16)
    got = decode_tiff(encode_tiff(a16, planar=True, bits=16))
    assert np.array_equal(got, (a16 >> 8).astype(np.uint8))
    # tiled planar stays an honest boundary
    import pytest as _pytest
    with _pytest.raises(ValueError):
        encode_tiff(arr, planar=True, tile=(4, 4))


def test_truncated_exif_does_not_break_decode():
    # r11 review: struct.error from a truncated EXIF TIFF header must
    # not fail a JPEG whose pixels decode fine
    import struct

    import numpy as np

    from sparkdon.jpeg import encode_jpeg_lossless
    from sparkdon.multimodal import decode_image

    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    plain = encode_jpeg_lossless(arr)
    bad_exif = b"Exif\x00\x00II"  # TIFF header cut after byte order
    seg = b"\xff\xe1" + struct.pack(">H", len(bad_exif) + 2) + bad_exif
    tagged = plain[:2] + seg + plain[2:]
    assert np.array_equal(decode_image(tagged), arr)

"""MJPEG-in-AVI video container — pure stdlib/numpy from the public
RIFF/AVI format (Microsoft "AVI RIFF File Reference") and T.81.

Video corpora the size this engine targets carry real containers, not
just animated GIFs.  MJPEG is the one mainstream video codec whose
frames are plain JPEG — and :mod:`sparkdon.jpeg` is a full
baseline/progressive JPEG codec — so an AVI parser turns
``sample_frames(decode_real=True)`` into a REAL decode path on a real
video container.  Inter-frame codecs (H.264 &c.) stay an honest
``NotImplementedError`` boundary, same policy as the image decoders.

Surface:

- :func:`decode_avi_frames` — AVI bytes → list of ``(HxWx3 uint8,
  delay_ms)``, same contract as ``decode_gif_frames`` so the frame
  sampler composes over both.
- :func:`encode_avi_mjpeg` — encoder twin: frames → spec-correct AVI
  (hdrl with avih/strh/strf, movi with ``00dc`` chunks, idx1 index).
- :func:`avi_info` — header metadata (geometry, fps, duration) for the
  ``extract_metadata`` stage; never decodes frame data.
"""

from __future__ import annotations

import struct

#: stream-header fccHandler values we can decode (all mean "frames are
#: JPEG bytes"); raw DIB handled separately via the strf compression.
_MJPEG_HANDLERS = {b"MJPG", b"mjpg", b"dmb1", b"jpeg", b"JPEG"}


def _chunks(payload: bytes, pos: int, end: int):
    """Yield ``(fourcc, body_start, body_len)`` for RIFF chunks in
    ``payload[pos:end]``, honoring word alignment."""
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        ln = struct.unpack_from("<I", payload, pos + 4)[0]
        yield cid, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def _parse_headers(payload: bytes) -> dict:
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    riff_end = min(8 + struct.unpack_from("<I", payload, 4)[0],
                   len(payload))
    info: dict = {"movi": None, "handler": None, "compression": None,
                  "bitcount": 24}
    for cid, body, ln in _chunks(payload, 12, riff_end):
        if cid != b"LIST":
            continue
        ltype = payload[body:body + 4]
        if ltype == b"movi":
            info["movi"] = (body + 4, min(body + ln, len(payload)))
        elif ltype == b"hdrl":
            _parse_hdrl(payload, body + 4, body + ln, info)
    if "width" not in info:
        raise ValueError("AVI missing avih main header")
    return info


def _parse_hdrl(payload: bytes, pos: int, end: int, info: dict) -> None:
    for cid, body, ln in _chunks(payload, pos, end):
        if cid == b"avih" and ln >= 40:
            (usec, _maxbps, _pad, _flags, total, _init, _streams,
             _bufsz, w, h) = struct.unpack_from("<10I", payload, body)
            info.update(usec_per_frame=usec, total_frames=total,
                        width=w, height=h)
        elif cid == b"LIST" and payload[body:body + 4] == b"strl":
            _parse_strl(payload, body + 4, body + ln, info)


def _parse_strl(payload: bytes, pos: int, end: int, info: dict) -> None:
    is_video = False
    for cid, body, ln in _chunks(payload, pos, end):
        if cid == b"strh" and ln >= 32:
            fcc_type = payload[body:body + 4]
            is_video = fcc_type == b"vids"
            if is_video:
                info["handler"] = payload[body + 4:body + 8]
                scale, rate = struct.unpack_from("<II", payload, body + 20)
                if scale and rate:
                    info["fps"] = rate / scale
        elif cid == b"strf" and is_video and ln >= 40:
            # BITMAPINFOHEADER: biCompression at +16, biBitCount at +14
            info["bitcount"] = struct.unpack_from("<H", payload,
                                                  body + 14)[0]
            info["compression"] = payload[body + 16:body + 20]


def avi_info(payload: bytes) -> dict:
    """AVI main-header metadata → dict (width, height, fps, frame and
    duration accounting, codec handler).  Headers only — O(header
    bytes), never touches frame data, safe for the metadata stage."""
    info = _parse_headers(payload)
    usec = info.get("usec_per_frame") or 0
    total = info.get("total_frames") or 0
    out = {"width": info["width"], "height": info["height"],
           "frames": total}
    if usec:
        out["fps"] = round(1e6 / usec, 3)
        out["duration_ms"] = total * usec // 1000
    handler = info.get("handler") or info.get("compression")
    if handler:
        out["codec"] = handler.decode("latin-1").strip("\x00 ")
    return out


def decode_avi_frames(payload: bytes):
    """AVI bytes → list of ``(HxWx3 uint8 canvas, delay_ms)``.

    MJPEG streams (handler/compression MJPG-family) decode through
    :func:`sparkdon.jpeg.decode_jpeg`; uncompressed DIB streams
    (``00db`` / BI_RGB, 24-bit) decode as bottom-up BGR rasters.  Other
    codecs raise ``NotImplementedError`` — inter-frame codecs are not
    decodable from first principles in this container."""
    import numpy as np

    from sparkdon.jpeg import decode_jpeg

    info = _parse_headers(payload)
    if info["movi"] is None:
        raise ValueError("AVI missing movi list")
    handler = info.get("handler") or b""
    compression = info.get("compression") or b""
    mjpeg = (handler in _MJPEG_HANDLERS
             or compression in _MJPEG_HANDLERS)
    raw_dib = compression == b"\x00\x00\x00\x00"  # BI_RGB
    delay_ms = (info.get("usec_per_frame") or 40000) / 1000.0
    w, h = info["width"], info["height"]

    frames = []
    pos, end = info["movi"]
    for cid, body, ln in _chunks(payload, pos, end):
        if cid == b"LIST":  # 'rec ' grouping — recurse into it
            for cid2, body2, ln2 in _chunks(payload, body + 4, body + ln):
                _decode_one(payload, cid2, body2, ln2, frames, mjpeg,
                            raw_dib, w, h, decode_jpeg, np)
            continue
        _decode_one(payload, cid, body, ln, frames, mjpeg, raw_dib,
                    w, h, decode_jpeg, np)
    return [(f, delay_ms) for f in frames]


def _decode_one(payload, cid, body, ln, frames, mjpeg, raw_dib, w, h,
                decode_jpeg, np) -> None:
    kind = cid[2:4]
    if kind not in (b"dc", b"db"):
        return
    chunk = payload[body:body + ln]
    if not chunk:
        return  # dropped frame (zero-length chunks are legal padding)
    stride = (w * 3 + 3) & ~3  # bottom-up BGR rows padded to 4 bytes
    if chunk[:2] == b"\xff\xd8" and mjpeg:
        frames.append(decode_jpeg(chunk))
    elif raw_dib and ln >= stride * h:
        arr = np.frombuffer(chunk[:stride * h], np.uint8) \
            .reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
        frames.append(np.ascontiguousarray(arr[::-1, :, ::-1]))
    else:
        codec = (cid[:4] if not mjpeg else b"?").decode("latin-1")
        raise NotImplementedError(
            f"AVI frame codec not decodable here (chunk {codec!r}); "
            "only MJPEG and uncompressed BI_RGB are supported")


def encode_avi_mjpeg(frames, fps: float = 10.0,
                     quality_div: int = 8) -> bytes:
    """Encoder twin: list of HxWx3 uint8 arrays → MJPEG AVI bytes
    (AVIF_HASINDEX set, idx1 written, chunks word-aligned)."""
    import numpy as np

    from sparkdon.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    first = np.asarray(frames[0])
    h, w = first.shape[0], first.shape[1]
    usec = max(1, int(round(1e6 / fps)))
    jpegs = [encode_jpeg(np.asarray(f, dtype=np.uint8),
                         quality_div=quality_div) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + \
            (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    maxsz = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I", usec, int(maxsz * fps), 0, 0x10,  # AVIF_HASINDEX
        len(jpegs), 0, 1, maxsz, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, int(round(fps)), 0, len(jpegs),
        maxsz, 0xFFFFFFFF, 0, 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b""
    idx = b""
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00dc" + struct.pack("<III", 0x10,  # AVIIF_KEYFRAME
                                     4 + len(movi_body), len(j))
        movi_body += chunk(b"00dc", j)
    movi = lst(b"movi", movi_body)
    idx1 = chunk(b"idx1", idx)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi_dib(frames, fps: float = 10.0) -> bytes:
    """Encoder twin for the uncompressed path: frames → BI_RGB AVI
    (``00db`` chunks, bottom-up BGR rows padded to 4 bytes) — exact
    round-trip, unlike the lossy MJPEG twin."""
    import numpy as np

    if not frames:
        raise ValueError("need at least one frame")
    first = np.asarray(frames[0])
    h, w = first.shape[0], first.shape[1]
    usec = max(1, int(round(1e6 / fps)))
    stride = (w * 3 + 3) & ~3

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + \
            (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    dibs = []
    for f in frames:
        a = np.asarray(f, dtype=np.uint8)
        padded = np.zeros((h, stride), np.uint8)
        padded[:, :w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)
        dibs.append(padded.tobytes())

    framesz = stride * h
    avih = struct.pack("<14I", usec, int(framesz * fps), 0, 0x10,
                       len(dibs), 0, 1, framesz, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, int(round(fps)), 0, len(dibs),
        framesz, 0xFFFFFFFF, 0, 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24,
                       b"\x00\x00\x00\x00", framesz, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body

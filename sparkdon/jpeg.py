"""JPEG (ITU-T T.81, 8/12-bit) decode — pure Python + numpy, no codec
library (reference exposure is ``show_image``,
gastrodon/__init__.py:836-846; everything here is built from the public
JPEG spec).

Supported: SOF0/SOF1 (baseline + extended sequential, Huffman), SOF3
(lossless, Annex H prediction — round 10) and
SOF2 (progressive: spectral selection + successive approximation,
annex G — the majority layout of real web JPEGs, round 10), 1-, 3- or
4-component scans (4 = Adobe CMYK/YCCK via the APP14 transform marker,
inverted-ink convention, round 10 late), H/V sampling factors up to 2
(4:4:4, 4:2:2, 4:2:0), restart markers, FF-stuffing, JFIF/EXIF APPn
segments, and 12-bit precision on SOF1/SOF2 (round 10 late; samples
reduce to the uint8 contract via ``>> 4``, the 16-bit-PNG high-byte
convention).  Arithmetic coding and lossless/hierarchical raise
``NotImplementedError`` — a real boundary statement, not a stub.

Encoder twins (:func:`encode_jpeg` baseline, Annex K tables;
:func:`encode_jpeg_progressive`, libjpeg-style scan script with
per-scan Huffman tables) exist so both decode paths are testable by
round-trip against known pixels without any external fixture or
library — and the two paths cross-check each other: the progressive
stream's accumulated coefficients must decode to EXACTLY the pixels
of the baseline stream built from the same quantized blocks.
"""

from __future__ import annotations

import struct

#: zigzag scan order: index i of the stream maps to _ZIGZAG[i] in
#: row-major 8x8 order
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    import numpy as np

    c = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = (1 / (2 ** 0.5)) if u == 0 else 1.0
            c[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF-stuffing:
    0xFF00 is a literal 0xFF; 0xFFD0-D7 (RST) resets the bit buffer and
    signals the caller; 0xFFD9 (EOI) ends the stream."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.restart_hit = False
        self.ended = False
        self.pad_bytes = 0

    def _pad(self):
        # a decoder legitimately over-reads only the final byte's
        # padding bits; needing whole extra bytes means the scan was cut
        self.pad_bytes += 1
        if self.pad_bytes > 2:
            raise ValueError("truncated JPEG scan")
        self.acc = (self.acc << 8) & 0xFFFFFFFF
        self.nbits += 8

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            self.ended = True
            self._pad()
            return
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                self.restart_hit = True
                # pad until the caller consumes the restart
                self._pad()
                return
            else:  # EOI or next marker: pad out
                self.ended = True
                self._pad()
                return
        else:
            self.pos += 1
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Consume the pending RST marker and realign to the byte after
        it; resets bit state."""
        # drop padding bits; the truncation budget is per restart segment,
        # so a valid multi-restart stream that over-reads padding in many
        # segments never trips the cumulative cap
        self.acc = 0
        self.nbits = 0
        self.restart_hit = False
        self.pad_bytes = 0
        self.ended = False
        d = self.data
        # self.pos points AT the 0xFF of the RST marker
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("corrupt JPEG: expected restart marker")


def _build_huffman(counts: list, symbols: bytes) -> dict:
    """Canonical Huffman per T.81 Annex C: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension: t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes):
    """Baseline or progressive JPEG → HxWx3 uint8 numpy (gray replicated
    to 3 channels).  See module docstring for the supported envelope.

    Baseline (SOF0/1) decodes in one pass through :func:`_decode_scan`;
    progressive (SOF2, round 10) accumulates every SOS's
    spectral-selection / successive-approximation scan into per-component
    coefficient arrays and reconstructs after EOI (T.81 annex G)."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    adobe = None  # APP14 color-transform code (0 CMYK/RGB, 1 YCbCr, 2 YCCK)
    prog_coeffs = None  # progressive: per-component zigzag coeff arrays
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI: normal end for progressive
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG")
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq not in (0, 1):
                    raise ValueError(f"invalid DQT precision {pq}")
                tbl = np.zeros(64)
                for k in range(64):  # pq=1: 16-bit big-endian entries
                    tbl[_ZIGZAG[k]] = (
                        seg[i + 1 + k] if pq == 0 else
                        struct.unpack_from(">H", seg, i + 1 + 2 * k)[0])
                qt[tq] = tbl.reshape(8, 8)
                i += 65 if pq == 0 else 129
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            # T.81: baseline (SOF0) is 8-bit only; extended sequential
            # (SOF1) and progressive (SOF2) also allow 12-bit (round
            # 10; samples reduce to the uint8 contract via >> 4, the
            # 16-bit-PNG high-byte convention)
            if prec not in (8, 12) or (prec == 12 and marker == 0xC0):
                raise NotImplementedError(f"{prec}-bit JPEG")
            if ncomp not in (1, 3, 4):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            sof = {"h": h, "w": w, "comps": comps, "prec": prec,
                   "progressive": marker == 0xC2}
        elif marker == 0xC3:  # SOF3: lossless (T.81 Annex H, round 10)
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF3 segment")
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if not 2 <= prec <= 16:
                raise ValueError(f"invalid lossless precision {prec}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            sof = {"h": h, "w": w, "comps": comps, "prec": prec,
                   "progressive": False, "lossless": True}
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}: "
                "arithmetic/hierarchical)")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1:i + 17])
                n = sum(counts)
                symbols = seg[i + 17:i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    counts, symbols)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            adobe = seg[11] if len(seg) >= 12 else 0
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if sof.get("lossless"):
                if ns != len(sof["comps"]):
                    # a partial (non-interleaved) lossless scan would
                    # silently drop components — honesty beats wrong pixels
                    raise NotImplementedError(
                        "multi-scan (non-interleaved) lossless JPEG")
                scan = []
                for c in range(ns):
                    cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                    comp = next(x for x in sof["comps"] if x["id"] == cs)
                    scan.append({**comp, "dc": huff_dc[tdta >> 4]})
                predictor = seg[1 + 2 * ns]          # Ss
                pt = seg[3 + 2 * ns] & 0x0F          # Al
                return _decode_lossless_scan(payload, pos + seglen, sof,
                                             scan, predictor, pt,
                                             restart_interval)
            if not sof["progressive"]:
                scan = []
                for c in range(ns):
                    cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                    comp = next(x for x in sof["comps"] if x["id"] == cs)
                    scan.append({**comp, "dc": huff_dc[tdta >> 4],
                                 "ac": huff_ac[tdta & 0x0F]})
                return _decode_scan(payload, pos + seglen, sof, scan, qt,
                                    restart_interval, adobe)
            if prog_coeffs is None:
                prog_coeffs = _progressive_init(sof)
            scomps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next(i for i, x in enumerate(sof["comps"])
                           if x["id"] == cs)
                scomps.append((idx, tdta >> 4, tdta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_progressive_scan(
                payload, pos + seglen, sof, prog_coeffs, scomps,
                huff_dc, huff_ac, ss, se, ahal >> 4, ahal & 0x0F,
                restart_interval)
            continue
        # APPn (E0-EF), COM (FE), others: skip
        pos += seglen
    if prog_coeffs is not None:
        return _progressive_finish(sof, prog_coeffs, qt, adobe)
    raise ValueError("JPEG contains no scan data")


def _shift(sof) -> float:
    """DC level shift for the frame's sample precision (T.81 A.3.1)."""
    return float(1 << (sof.get("prec", 8) - 1))


def _scale(sof) -> float:
    """Reduction factor from the frame's precision into 8-bit space."""
    return float(1 << (sof.get("prec", 8) - 8))


def _decode_scan(payload, pos, sof, scan, qt, restart_interval, adobe=None):
    import numpy as np

    h, w = sof["h"], sof["w"]
    if len(scan) == 1:
        # T.81 §A.2.2: a single-component scan is non-interleaved — the
        # MCU is one 8x8 block and the declared sampling factors are
        # ignored (a grayscale JPEG declaring 2x2 still lays out 1x1)
        scan = [{**scan[0], "h": 1, "v": 1}]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax > 2 or vmax > 2 or any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                                   for c in scan):
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    C = _dct_matrix()
    planes = []
    for c in scan:
        planes.append(np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)))
    br = _BitReader(payload, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                if not br.restart_hit:
                    # tolerate encoders that omit a final RST; but a
                    # missing mid-stream marker is corruption
                    if br.ended:
                        raise ValueError("truncated JPEG scan")
                br.sync_restart()
                pred = [0] * len(scan)
            for ci, c in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64)
                        t = _decode_symbol(br, c["dc"])
                        diff = _extend(br.read_bits(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, c["ac"])
                            r, s = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC run past block")
                            coeffs[k] = _extend(br.read_bits(s), s)
                            k += 1
                        block = np.zeros(64)
                        block[_ZIGZAG] = coeffs[np.arange(64)]
                        dq = block.reshape(8, 8) * qt[c["tq"]]
                        # level shift at the source precision, then
                        # reduce into 8-bit space so every downstream
                        # stage (upsample, YCbCr, CMYK) is unchanged
                        px = (C.T @ dq @ C + _shift(sof)) / _scale(sof)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # upsample each plane to full MCU-grid resolution, crop, transform
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    return _planes_to_rgb(full, adobe)


def _predict(plane, x: int, y: int, sel: int, default: int) -> int:
    """T.81 H.1.2.1 sample prediction: first sample → default, rest of
    the first line → left, first column → above, otherwise the selected
    predictor over (a=left, b=above, c=above-left)."""
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    c = int(plane[y - 1, x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def _decode_lossless_scan(payload, pos, sof, scan, predictor: int,
                          pt: int, restart_interval: int):
    """Lossless JPEG (SOF3, T.81 Annex H): Huffman-coded prediction
    residuals, no DCT/quantization.  Interleaved 1×1-sampled components
    — the layout essentially all lossless JPEGs use.  Per-sample Python
    loop: this is the correctness path for an archival format, not a
    throughput path (bulk image decode at scale stays on the DCT modes).
    3-component lossless carries the components as stored (RGB — the
    JFIF YCbCr convention applies to the DCT processes)."""
    import numpy as np

    if any(c["h"] != 1 or c["v"] != 1 for c in scan):
        raise NotImplementedError("lossless JPEG with subsampling")
    if restart_interval:
        raise NotImplementedError("lossless JPEG with restart intervals")
    h, w, prec = sof["h"], sof["w"], sof["prec"]
    n = len(scan)
    br = _BitReader(payload, pos)
    planes = [np.zeros((h, w), np.int32) for _ in range(n)]
    default = 1 << (prec - pt - 1)
    for y in range(h):
        for x in range(w):
            for ci in range(n):
                t = _decode_symbol(br, scan[ci]["dc"])
                if t == 16:
                    diff = 32768
                elif t:
                    diff = _extend(br.read_bits(t), t)
                else:
                    diff = 0
                pred = _predict(planes[ci], x, y, predictor, default)
                planes[ci][y, x] = (pred + diff) & 0xFFFF
    shift = prec - 8  # reduce to the uint8 contract after point transform
    out = []
    for p in planes:
        v = p << pt
        v = (v >> shift) if shift >= 0 else (v << -shift)
        out.append(np.clip(v, 0, 255).astype(np.uint8))
    if n == 1:
        return np.repeat(out[0][:, :, None], 3, axis=2)
    if n == 3:
        return np.dstack(out)
    raise NotImplementedError(f"{n}-component lossless JPEG")


#: uniform 5-bit table over every lossless residual category 0-16 —
#: the K.3 DC table stops at 11, which 16-bit differences exceed
_LOSSLESS16_TABLE = ([0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                     bytes(range(17)))


def encode_jpeg_lossless(arr, predictor: int = 1,
                         point_transform: int = 0,
                         precision: int = 8) -> bytes:
    """Lossless JPEG (SOF3) encoder twin — byte-exact round-trip with
    :func:`decode_jpeg` for every predictor 1-7.  Grayscale (HxW) or
    RGB (HxWx3).  ``precision`` 8 uses the K.3 DC luma table (covers
    every 8-bit residual category); 16 uses a uniform 5-bit table over
    categories 0-16 and encodes differences modulo 2^16 per H.1.2.1,
    including the special all-16-bit category (decode then reduces to
    the uint8 contract by taking the high byte)."""
    import struct

    import numpy as np

    if precision not in (8, 16):
        raise ValueError("precision must be 8 or 16")
    a2 = arr if arr.ndim == 3 else arr[:, :, None]
    h, w, ncomp = a2.shape
    pt = point_transform
    planes = a2.astype(np.int64) >> pt
    counts, symbols = (_K_DC_LUMA if precision == 8
                       else _LOSSLESS16_TABLE)
    table = _encode_table(counts, symbols)
    bw = _BitWriter()
    default = 1 << (precision - pt - 1)
    for y in range(h):
        for x in range(w):
            for ci in range(ncomp):
                plane = planes[:, :, ci]
                diff = int(plane[y, x]) - _predict(plane, x, y, predictor,
                                                   default)
                # H.1.2.1: differences are taken modulo 2^16; pick the
                # representative in [-32768, 32767]
                diff = ((diff + 32768) & 0xFFFF) - 32768
                if diff == -32768:
                    code, ln = table[16]
                    bw.write(code, ln)  # category 16: no extra bits
                    continue
                t = abs(diff).bit_length()
                code, ln = table[t]
                bw.write(code, ln)
                if t:
                    v = diff if diff >= 0 else diff + (1 << t) - 1
                    bw.write(v & ((1 << t) - 1), t)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xC3, struct.pack(">BHHB", precision, h, w, ncomp)
               + b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp)))
    out += seg(0xC4, bytes([0x00]) + bytes(counts) + symbols)
    out += seg(0xDA, bytes([ncomp])
               + b"".join(bytes([i + 1, 0x00]) for i in range(ncomp))
               + bytes([predictor, 0, pt]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _planes_to_rgb(full, adobe):
    """Upsampled component planes → HxWx3 uint8.

    1 plane = grayscale; 3 planes = YCbCr (JFIF default — Adobe
    transform 0 means the components are plain RGB); 4 planes = CMYK.
    T.81 itself says nothing about 4-component color: the de-facto
    convention (Adobe TN 5116, followed by libjpeg) is that Adobe
    encoders store CMYK *inverted* (0 = full ink), and transform 2
    (YCCK) additionally runs YCbCr over the inverted-CMY channels; a
    4-component file with no APP14 is taken as direct CMYK ink."""
    import numpy as np

    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)

    def ycc(Y, Cb, Cr):
        r = Y + 1.402 * (Cr - 128.0)
        g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
        b = Y + 1.772 * (Cb - 128.0)
        return r, g, b

    if len(full) == 3:
        r, g, b = full if adobe == 0 else ycc(*full)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(rgb.round(), 0, 255).astype(np.uint8)
    c, m, y, k = full
    if adobe == 2:  # YCCK: undo the YCbCr pass over the stored channels
        rp, gp, bp = ycc(c, m, y)
        c, m, y = 255.0 - rp, 255.0 - gp, 255.0 - bp
    stored = [np.clip(p, 0.0, 255.0) for p in (c, m, y, k)]
    # Adobe files store inverted ink; bare CMYK is taken at face value
    ink = [255.0 - p for p in stored] if adobe is not None else stored
    ck, mk, yk, kk = ink
    r = (255.0 - ck) * (255.0 - kk) / 255.0
    g = (255.0 - mk) * (255.0 - kk) / 255.0
    b = (255.0 - yk) * (255.0 - kk) / 255.0
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) scan accumulation — T.81 Annex G (round 10)
# ---------------------------------------------------------------------------


def _progressive_init(sof):
    """Per-component zigzag coefficient arrays + block-grid geometry.

    Arrays are sized to the MCU-padded grid (interleaved DC scans visit
    every padded block); non-interleaved scans visit only the
    component's own ceil grid (``bh``/``bw``), per T.81 §A.2.2."""
    import numpy as np

    comps = sof["comps"]
    h, w = sof["h"], sof["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    sof["mcus_x"], sof["mcus_y"] = mcus_x, mcus_y
    sof["hmax"], sof["vmax"] = hmax, vmax
    coeffs = []
    for c in comps:
        c["bw_full"], c["bh_full"] = mcus_x * c["h"], mcus_y * c["v"]
        c["bw"] = (-(-(w * c["h"]) // hmax) + 7) // 8
        c["bh"] = (-(-(h * c["v"]) // vmax) + 7) // 8
        coeffs.append(np.zeros((c["bh_full"], c["bw_full"], 64),
                               dtype=np.int32))
    return coeffs


def _ac_first(br, block, table, ss, se, al, eobrun):
    """One block of an AC first scan (Ah=0): spectral band [ss, se],
    values shifted up by the point transform; EOB-run bookkeeping per
    G.1.2.2."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(br, table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC run past band")
        block[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, block, table, ss, se, al, eobrun):
    """One block of an AC refinement scan (Ah=Al+1): newly significant
    coefficients arrive as ±(1<<Al); every already-nonzero coefficient
    crossed (and, under an EOB run, to the end of the band) consumes one
    correction bit (G.1.2.3; the libjpeg/stb two's-complement idiom —
    ``block[k] & p1`` tests the Al bit, ``+= p1/m1`` grows the
    magnitude sign-correctly)."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(br, table)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError("corrupt JPEG: refinement s != 1")
                val = p1 if br.read_bit() else m1
            while k <= se:
                if block[k] != 0:
                    if br.read_bit() and (block[k] & p1) == 0:
                        block[k] += p1 if block[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s:
                if k > se:
                    raise ValueError("corrupt JPEG: refinement past band")
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if block[k] != 0:
                if br.read_bit() and (block[k] & p1) == 0:
                    block[k] += p1 if block[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker(payload, pos):
    """First position ≥ pos holding a non-RST, non-stuffing marker."""
    n = len(payload)
    while pos < n:
        if payload[pos] == 0xFF and pos + 1 < n:
            nxt = payload[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:  # T.81 B.1.1.2: optional fill byte
                pos += 1
                continue
            return pos
        pos += 1
    return n


def _decode_progressive_scan(payload, pos, sof, coeffs, scomps,
                             huff_dc, huff_ac, ss, se, ah, al, ri):
    """Decode one progressive SOS's entropy data into ``coeffs``;
    returns the position of the next marker."""
    comps = sof["comps"]
    br = _BitReader(payload, pos)
    interleaved = len(scomps) > 1
    if ss == 0 and se != 0:
        raise ValueError("corrupt JPEG: DC scan with Se != 0")
    if ss != 0 and interleaved:
        raise ValueError("corrupt JPEG: interleaved AC scan")

    if interleaved:
        units = sof["mcus_x"] * sof["mcus_y"]
    else:
        ci = scomps[0][0]
        units = comps[ci]["bh"] * comps[ci]["bw"]

    pred = [0] * len(scomps)
    eobrun = 0
    for u in range(units):
        if ri and u and u % ri == 0:
            if not br.restart_hit and br.ended:
                raise ValueError("truncated JPEG scan")
            br.sync_restart()
            pred = [0] * len(scomps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, sof["mcus_x"])
            for si, (ci, td, _ta) in enumerate(scomps):
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = coeffs[ci][my * c["v"] + by,
                                           mx * c["h"] + bx]
                        if ah == 0:
                            t = _decode_symbol(br, huff_dc[td])
                            pred[si] += _extend(br.read_bits(t), t)
                            block[0] = pred[si] << al
                        elif br.read_bit():
                            block[0] |= (1 << al)
        else:
            ci, td, ta = scomps[0]
            c = comps[ci]
            by, bx = divmod(u, c["bw"])
            block = coeffs[ci][by, bx]
            if ss == 0:
                if ah == 0:
                    t = _decode_symbol(br, huff_dc[td])
                    pred[0] += _extend(br.read_bits(t), t)
                    block[0] = pred[0] << al
                elif br.read_bit():
                    block[0] |= (1 << al)
            elif ah == 0:
                eobrun = _ac_first(br, block, huff_ac[ta], ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(br, block, huff_ac[ta], ss, se, al, eobrun)
    return _next_marker(payload, br.pos)


def _progressive_finish(sof, coeffs, qt, adobe=None):
    """All scans accumulated → dequantize, IDCT (vectorized over the
    whole block grid), upsample, color-transform — the same math as the
    baseline tail."""
    import numpy as np

    h, w = sof["h"], sof["w"]
    hmax, vmax = sof["hmax"], sof["vmax"]
    C = _dct_matrix()
    full = []
    for ci, c in enumerate(sof["comps"]):
        zz = coeffs[ci]
        bh, bw = zz.shape[0], zz.shape[1]
        nat = np.zeros((bh, bw, 64))
        nat[:, :, _ZIGZAG] = zz
        nat = nat.reshape(bh, bw, 8, 8) * qt[c["tq"]][None, None]
        px = (np.einsum("ij,abjk,kl->abil", C.T, nat, C)
              + _shift(sof)) / _scale(sof)
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(plane[:h, :w])
    return _planes_to_rgb(full, adobe)


# ---------------------------------------------------------------------------
# encoder twin (tests only): 4:4:4 or 4:2:0, Annex K tables
# ---------------------------------------------------------------------------

#: T.81 Annex K.1/K.2 example quantization tables (luminance,
#: chrominance), row-major
_K_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_K_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 typical Huffman tables: (counts[16], symbols)
_K_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              bytes(range(12)))
_K_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                bytes(range(12)))
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]))
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc <<= (8 - self.nbits)
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _encode_table(counts, symbols) -> dict:
    """symbol -> (code, length) from the canonical table."""
    t = _build_huffman(counts, symbols)
    return {sym: (code, length) for (length, code), sym in t.items()}


def _mag(v: int):
    """(category, magnitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _emit_baseline_block(bw, pred, ci, blk, q8, C, dct, act,
                         center: float = 128.0):
    """FDCT + quantize + Huffman-emit one 8x8 block (shared by the
    3-component and CMYK encoder twins)."""
    import numpy as np

    coef = C @ (blk - center) @ C.T
    qz = np.round(coef / q8).astype(np.int64)
    zz = qz.reshape(-1)[_ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t, bits = _mag(diff)
    code, ln = dct[t]
    bw.write(code, ln)
    if t:
        bw.write(bits, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act[0xF0]
            bw.write(code, ln)
            run -= 16
        t, bits = _mag(v)
        code, ln = act[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits, t)
        run = 0
    if last < 63:
        code, ln = act[0x00]
        bw.write(code, ln)


def encode_jpeg_cmyk(arr, quality_div: int = 8, transform: int = 0) -> bytes:
    """HxWx4 stored-sample CMYK (Adobe-inverted convention) → baseline
    4-component JPEG with an Adobe APP14 marker; test twin of the
    4-component decode path.

    ``transform`` 0 writes the planes as-is (APP14 transform 0 = CMYK);
    2 runs the YCCK forward pass — YCbCr over (255 - stored CMY) — so
    the decoder's inverse (:func:`_planes_to_rgb`) round-trips.  All
    components are 1x1-sampled and share the Annex K luma tables."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape[0], a.shape[1]
    planes = [a[:, :, i] for i in range(4)]
    if transform == 2:
        rp, gp, bp = (255.0 - planes[0], 255.0 - planes[1],
                      255.0 - planes[2])
        planes = [
            0.299 * rp + 0.587 * gp + 0.114 * bp,
            128.0 - 0.168736 * rp - 0.331264 * gp + 0.5 * bp,
            128.0 + 0.5 * rp - 0.418688 * gp - 0.081312 * bp,
            planes[3],
        ]
    elif transform != 0:
        raise ValueError("CMYK transform must be 0 or 2")
    ql = np.maximum(1, np.array(_K_LUMA, dtype=np.int64) // quality_div)
    q8 = ql.reshape(8, 8).astype(float)
    C = _dct_matrix()
    mcus_x, mcus_y = (w + 7) // 8, (h + 7) // 8
    H, W = mcus_y * 8, mcus_x * 8

    def pad(p):
        out = np.empty((H, W))
        out[:h, :w] = p
        out[h:, :w] = p[h - 1:h, :]
        out[:, w:] = out[:, w - 1:w]
        return out

    planes = [pad(p) for p in planes]
    dct = _encode_table(*_K_DC_LUMA)
    act = _encode_table(*_K_AC_LUMA)
    bw = _BitWriter()
    pred = [0, 0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, p in enumerate(planes):
                _emit_baseline_block(bw, pred, ci,
                                     p[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8],
                                     q8, C, dct, act)
    bw.flush()

    head = bytearray(b"\xff\xd8")
    head += _seg(0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, transform))
    head += _seg(0xDB, bytes([0]) + bytes(int(ql[_ZIGZAG[k]])
                                          for k in range(64)))
    head += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 4)
                 + b"".join(bytes([i + 1, 0x11, 0]) for i in range(4)))
    head += _seg(0xC4, bytes([0x00]) + bytes(_K_DC_LUMA[0]) + _K_DC_LUMA[1])
    head += _seg(0xC4, bytes([0x10]) + bytes(_K_AC_LUMA[0]) + _K_AC_LUMA[1])
    head += _seg(0xDA, bytes([4]) + b"".join(bytes([i + 1, 0x00])
                                             for i in range(4))
                 + bytes([0, 63, 0]))
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"


def encode_jpeg(arr, quality_div: int = 8, subsample: bool = False,
                restart_interval: int = 0, bits: int = 8) -> bytes:
    """HxWx3 uint8 → baseline JFIF bytes (test twin of
    :func:`decode_jpeg`).  ``quality_div`` divides the Annex K tables
    (higher = finer quantization = closer round-trip); ``subsample``
    switches chroma to 4:2:0.  ``bits=12`` (round 10) takes uint16
    samples in [0, 4095] and emits an extended-sequential (SOF1) frame
    with the Annex K tables scaled ×16 (written as 16-bit DQT entries),
    so quantized coefficients stay inside the standard Huffman tables'
    categories; quality_div ≤ 16 keeps that bound."""
    import numpy as np

    if bits not in (8, 12):
        raise ValueError("bits must be 8 or 12")
    if bits == 12 and quality_div > 16:
        raise ValueError("quality_div > 16 overflows the Annex K Huffman "
                         "categories at 12-bit precision")
    center = float(1 << (bits - 1))
    qscale = 1 << (bits - 8)
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape[0], a.shape[1]
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = center - 0.168736 * r - 0.331264 * g + 0.5 * b
    Cr = center + 0.5 * r - 0.418688 * g - 0.081312 * b

    ql = np.maximum(1, np.array(_K_LUMA, dtype=np.int64) * qscale
                    // quality_div)
    qc = np.maximum(1, np.array(_K_CHROMA, dtype=np.int64) * qscale
                    // quality_div)
    ql8, qc8 = ql.reshape(8, 8).astype(float), qc.reshape(8, 8).astype(float)
    C = _dct_matrix()

    hs = vs = 2 if subsample else 1
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcus_x, mcus_y = (w + mcu_w - 1) // mcu_w, (h + mcu_h - 1) // mcu_h

    def pad(p, H, W):
        out = np.empty((H, W))
        ph, pw = p.shape
        out[:ph, :pw] = p
        out[ph:, :pw] = p[ph - 1:ph, :]
        out[:, pw:] = out[:, pw - 1:pw]
        return out

    Yp = pad(Y, mcus_y * mcu_h, mcus_x * mcu_w)
    if subsample:
        Cbs = Cb[:mcus_y * mcu_h, :mcus_x * mcu_w]
        Cbp = pad(Cb, mcus_y * mcu_h, mcus_x * mcu_w)
        Crp = pad(Cr, mcus_y * mcu_h, mcus_x * mcu_w)
        Cbp = Cbp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
        Crp = Crp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
        del Cbs
    else:
        Cbp = pad(Cb, mcus_y * 8, mcus_x * 8)
        Crp = pad(Cr, mcus_y * 8, mcus_x * 8)

    dc_l = _encode_table(*_K_DC_LUMA)
    dc_c = _encode_table(*_K_DC_CHROMA)
    ac_l = _encode_table(*_K_AC_LUMA)
    ac_c = _encode_table(*_K_AC_CHROMA)

    bw = _BitWriter()
    pred = [0, 0, 0]
    out = bytearray()

    def emit_block(plane, y0, x0, q8, dct, act, ci):
        _emit_baseline_block(bw, pred, ci, plane[y0:y0 + 8, x0:x0 + 8],
                             q8, C, dct, act, center)

    rst = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw.out = bytearray()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred[:] = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    emit_block(Yp, (my * vs + by) * 8, (mx * hs + bx) * 8,
                               ql8, dc_l, ac_l, 0)
            emit_block(Cbp, my * 8, mx * 8, qc8, dc_c, ac_c, 1)
            emit_block(Crp, my * 8, mx * 8, qc8, dc_c, ac_c, 2)
            mcu_count += 1
    bw.flush()
    out += bw.out

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq, q):
        if int(q.max()) > 255:  # pq=1: 16-bit big-endian entries
            zz = b"".join(struct.pack(">H", int(q[_ZIGZAG[k]]))
                          for k in range(64))
            return seg(0xDB, bytes([0x10 | tq]) + zz)
        zz = bytes(int(q[_ZIGZAG[k]]) for k in range(64))
        return seg(0xDB, bytes([tq]) + zz)

    def dht(tc, th, counts, symbols):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + symbols)

    head = bytearray(b"\xff\xd8")
    head += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += dqt(0, ql) + dqt(1, qc)
    head += seg(0xC0 if bits == 8 else 0xC1,
                struct.pack(">BHHB", bits, h, w, 3)
                + bytes([1, (hs << 4) | vs, 0])
                + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    head += dht(0, 0, *_K_DC_LUMA) + dht(1, 0, *_K_AC_LUMA)
    head += dht(0, 1, *_K_DC_CHROMA) + dht(1, 1, *_K_AC_CHROMA)
    if restart_interval:
        head += seg(0xDD, struct.pack(">H", restart_interval))
    head += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return bytes(head) + bytes(out) + b"\xff\xd9"


# ---------------------------------------------------------------------------
# progressive encoder twin (tests only): spectral selection + successive
# approximation scan script, per-scan uniform-length Huffman tables
# ---------------------------------------------------------------------------


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _uniform_table(symbols):
    """Canonical Huffman with every symbol at one length L (2^L > n, so
    the reserved all-ones code stays unassigned).  Optimality is
    irrelevant for fixtures; validity and decodability are not."""
    syms = sorted(set(symbols))
    n = len(syms)
    L = max(1, n.bit_length())
    counts = [0] * 16
    counts[L - 1] = n
    return counts, bytes(syms)


def _coeff_grids(arr, quality_div, subsample, bits: int = 8):
    """HxWx3 → per-component zigzag quantized coefficient grids
    (bh_full, bw_full, 64) on the MCU-padded layout, plus geometry —
    the shared front half of both encoders' math.  ``bits=12`` shifts
    at 2048 and scales the Annex K tables ×16 (same convention as
    :func:`encode_jpeg`)."""
    import numpy as np

    center = float(1 << (bits - 1))
    qscale = 1 << (bits - 8)
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape[0], a.shape[1]
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = center - 0.168736 * r - 0.331264 * g + 0.5 * b
    Cr = center + 0.5 * r - 0.418688 * g - 0.081312 * b
    ql = np.maximum(1, np.array(_K_LUMA, dtype=np.int64) * qscale
                    // quality_div)
    qc = np.maximum(1, np.array(_K_CHROMA, dtype=np.int64) * qscale
                    // quality_div)
    ql8, qc8 = ql.reshape(8, 8).astype(float), qc.reshape(8, 8).astype(float)
    hs = vs = 2 if subsample else 1
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcus_x, mcus_y = (w + mcu_w - 1) // mcu_w, (h + mcu_h - 1) // mcu_h

    def pad(p, H, W):
        out = np.empty((H, W))
        ph, pw = p.shape
        out[:ph, :pw] = p
        out[ph:, :pw] = p[ph - 1:ph, :]
        out[:, pw:] = out[:, pw - 1:pw]
        return out

    Yp = pad(Y, mcus_y * mcu_h, mcus_x * mcu_w)
    if subsample:
        Cbp = pad(Cb, mcus_y * mcu_h, mcus_x * mcu_w)
        Crp = pad(Cr, mcus_y * mcu_h, mcus_x * mcu_w)
        Cbp = Cbp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
        Crp = Crp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
    else:
        Cbp = pad(Cb, mcus_y * 8, mcus_x * 8)
        Crp = pad(Cr, mcus_y * 8, mcus_x * 8)

    C = _dct_matrix()

    def grid(plane, q8):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blk = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - center)
        import numpy as _np

        coef = _np.einsum("ij,abjk,kl->abil", C, blk, C.T)
        qz = _np.round(coef / q8[None, None]).astype(_np.int64)
        return qz.reshape(bh, bw, 64)[:, :, _ZIGZAG]

    grids = [grid(Yp, ql8), grid(Cbp, qc8), grid(Crp, qc8)]
    geom = {"h": h, "w": w, "hs": hs, "vs": vs,
            "mcus_x": mcus_x, "mcus_y": mcus_y, "ql": ql, "qc": qc}
    return grids, geom


def encode_jpeg_progressive(arr, quality_div: int = 8, subsample: bool = False,
                            restart_interval: int = 0,
                            bits: int = 8) -> bytes:
    """HxWx3 uint8 → progressive (SOF2) JFIF bytes — the fixture twin of
    the SOF2 path in :func:`decode_jpeg` (T.81 annex G).  The scan
    script mirrors the classic libjpeg default: an interleaved DC first
    scan at Al=1, two spectral AC bands for luma plus full-band chroma
    firsts (all Al=1), then DC and AC refinements to Al=0 — exercising
    spectral selection, successive approximation, EOB runs, and (with
    ``restart_interval``) per-scan restart resets."""
    grids, ge = _coeff_grids(arr, quality_div, subsample, bits)
    h, w, hs, vs = ge["h"], ge["w"], ge["hs"], ge["vs"]
    mcus_x, mcus_y = ge["mcus_x"], ge["mcus_y"]
    # non-interleaved block grids (T.81 §A.2.2: the component's own dims)
    comp_bw = [(-(-(w * cs) // hs) + 7) // 8 for cs in (hs, 1, 1)]
    comp_bh = [(-(-(h * cv) // vs) + 7) // 8 for cv in (vs, 1, 1)]

    def dc_first_ops(al):
        ops, syms = [], set()
        pred = [0, 0, 0]
        u = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and u and u % restart_interval == 0:
                    ops.append(("rst",))
                    pred = [0, 0, 0]
                for ci, nb in ((0, (vs, hs)), (1, (1, 1)), (2, (1, 1))):
                    for by in range(nb[0]):
                        for bx in range(nb[1]):
                            if ci == 0:
                                dc = int(grids[0][my * vs + by, mx * hs + bx, 0])
                            else:
                                dc = int(grids[ci][my, mx, 0])
                            v = dc >> al
                            diff = v - pred[ci]
                            pred[ci] = v
                            t, bits = _mag(diff)
                            ops.append(("sym", "dc", t))
                            syms.add(t)
                            ops.append(("bits", bits, t))
                u += 1
        return ops, {"dc": syms, "ac": set()}

    def dc_refine_ops(al):
        ops = []
        u = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and u and u % restart_interval == 0:
                    ops.append(("rst",))
                for ci, nb in ((0, (vs, hs)), (1, (1, 1)), (2, (1, 1))):
                    for by in range(nb[0]):
                        for bx in range(nb[1]):
                            if ci == 0:
                                dc = int(grids[0][my * vs + by, mx * hs + bx, 0])
                            else:
                                dc = int(grids[ci][my, mx, 0])
                            ops.append(("bits", (dc >> al) & 1, 1))
                u += 1
        return ops, {"dc": set(), "ac": set()}

    def ac_first_ops(ci, ss, se, al):
        ops, syms = [], set()
        eobrun = 0

        def flush():
            nonlocal eobrun
            if eobrun:
                cat = eobrun.bit_length() - 1
                ops.append(("sym", "ac", cat << 4))
                syms.add(cat << 4)
                ops.append(("bits", eobrun - (1 << cat), cat))
                eobrun = 0

        u = 0
        for by in range(comp_bh[ci]):
            for bx in range(comp_bw[ci]):
                if restart_interval and u and u % restart_interval == 0:
                    flush()
                    ops.append(("rst",))
                u += 1
                zz = grids[ci][by, bx]
                vals = []
                for k in range(ss, se + 1):
                    c = int(zz[k])
                    av = abs(c) >> al
                    vals.append(av if c >= 0 else -av)
                last = -1
                for i, v in enumerate(vals):
                    if v:
                        last = i
                if last < 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush()
                    continue
                flush()
                r = 0
                for i in range(last + 1):
                    v = vals[i]
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        ops.append(("sym", "ac", 0xF0))
                        syms.add(0xF0)
                        r -= 16
                    t, bits = _mag(v)
                    ops.append(("sym", "ac", (r << 4) | t))
                    syms.add((r << 4) | t)
                    ops.append(("bits", bits, t))
                    r = 0
                if last < se - ss:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush()
        flush()
        return ops, {"dc": set(), "ac": syms}

    def ac_refine_ops(ci, ss, se, al):
        ops, syms = [], set()
        eobrun = 0
        pend: list[int] = []

        def flush():
            nonlocal eobrun, pend
            if eobrun:
                cat = eobrun.bit_length() - 1
                ops.append(("sym", "ac", cat << 4))
                syms.add(cat << 4)
                ops.append(("bits", eobrun - (1 << cat), cat))
                for b in pend:
                    ops.append(("bits", b, 1))
                pend = []
                eobrun = 0

        u = 0
        for by in range(comp_bh[ci]):
            for bx in range(comp_bw[ci]):
                if restart_interval and u and u % restart_interval == 0:
                    flush()
                    ops.append(("rst",))
                u += 1
                zz = grids[ci][by, bx]
                band = list(range(ss, se + 1))
                absv = [abs(int(zz[k])) >> al for k in band]
                eobpos = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        eobpos = i
                r = 0
                br_bits: list[int] = []
                for i, k in enumerate(band):
                    t = absv[i]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eobpos:
                        flush()
                        ops.append(("sym", "ac", 0xF0))
                        syms.add(0xF0)
                        r -= 16
                        for b in br_bits:
                            ops.append(("bits", b, 1))
                        br_bits = []
                    if t > 1:
                        br_bits.append(t & 1)
                        continue
                    flush()
                    ops.append(("sym", "ac", (r << 4) | 1))
                    syms.add((r << 4) | 1)
                    ops.append(("bits", 1 if int(zz[k]) >= 0 else 0, 1))
                    for b in br_bits:
                        ops.append(("bits", b, 1))
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    eobrun += 1
                    pend += br_bits
                    if eobrun == 0x7FFF:
                        flush()
        flush()
        return ops, {"dc": set(), "ac": syms}

    def serialize(ops, tables):
        bw_ = _BitWriter()
        out = bytearray()
        rst = 0
        for op in ops:
            if op[0] == "sym":
                code, ln = tables[op[1]][op[2]]
                bw_.write(code, ln)
            elif op[0] == "bits":
                if op[2]:
                    bw_.write(op[1], op[2])
            else:
                bw_.flush()
                out += bw_.out
                bw_.out = bytearray()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
        bw_.flush()
        out += bw_.out
        return bytes(out)

    # scan script: (comp_ids, Ss, Se, Ah, Al, op builder)
    scans = [
        ([1, 2, 3], 0, 0, 0, 1, lambda: dc_first_ops(1)),
        ([1], 1, 5, 0, 1, lambda: ac_first_ops(0, 1, 5, 1)),
        ([1], 6, 63, 0, 1, lambda: ac_first_ops(0, 6, 63, 1)),
        ([2], 1, 63, 0, 1, lambda: ac_first_ops(1, 1, 63, 1)),
        ([3], 1, 63, 0, 1, lambda: ac_first_ops(2, 1, 63, 1)),
        ([1, 2, 3], 0, 0, 1, 0, lambda: dc_refine_ops(0)),
        ([1], 1, 63, 1, 0, lambda: ac_refine_ops(0, 1, 63, 0)),
        ([2], 1, 63, 1, 0, lambda: ac_refine_ops(1, 1, 63, 0)),
        ([3], 1, 63, 1, 0, lambda: ac_refine_ops(2, 1, 63, 0)),
    ]

    head = bytearray(b"\xff\xd8")
    head += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    def _dqt(tq, q):
        if int(max(q)) > 255:  # pq=1: 16-bit big-endian entries
            zz = b"".join(struct.pack(">H", int(q[_ZIGZAG[k]]))
                          for k in range(64))
            return _seg(0xDB, bytes([0x10 | tq]) + zz)
        return _seg(0xDB, bytes([tq]) + bytes(int(q[_ZIGZAG[k]])
                                              for k in range(64)))

    head += _dqt(0, ge["ql"]) + _dqt(1, ge["qc"])
    head += _seg(0xC2, struct.pack(">BHHB", bits, h, w, 3)
                 + bytes([1, (hs << 4) | vs, 0])
                 + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    if restart_interval:
        head += _seg(0xDD, struct.pack(">H", restart_interval))

    body = bytearray()
    for comp_ids, ss, se, ah, al, build in scans:
        ops, symsets = build()
        tables = {}
        for kind in ("dc", "ac"):
            if symsets[kind]:
                counts, symbols = _uniform_table(symsets[kind])
                body += _seg(0xC4, bytes([(0 if kind == "dc" else 0x10)])
                             + bytes(counts) + symbols)
                tables[kind] = _encode_table(counts, symbols)
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        body += _seg(0xDA, sos)
        body += serialize(ops, tables)
    return bytes(head) + bytes(body) + b"\xff\xd9"

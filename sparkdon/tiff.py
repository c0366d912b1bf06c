"""Baseline TIFF decode (+ encoder twins) — pure stdlib/numpy from the
public TIFF 6.0 spec.

Scanned-document corpora ship TIFF; this covers the baseline shapes:
both byte orders, chunky planar config, 8-bit grayscale (both
photometric polarities), RGB and palette-color (ColorMap), strip
layout with any RowsPerStrip or the tiled layout (§15), and
compressions 1 (none), 32773 (PackBits), 5 (LZW — the TIFF
variant: MSB-first codes, EarlyChange) and 8/32946 (Deflate), each
with or without the horizontal-differencing predictor (317=2).
Round 11 adds 16-bit samples (standard high-byte reduction, predictor
at native width) and PlanarConfiguration=2 strip layout.
CCITT/JPEG-in-TIFF, tiled-planar and >16-bit layouts raise
``NotImplementedError`` — honest boundaries, same policy as the other
decoders.

Output contract matches decode_image: HxWx3 uint8.
"""

from __future__ import annotations

import struct

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _read_ifd(data: bytes, bo: str, offset: int) -> dict:
    n = struct.unpack_from(bo + "H", data, offset)[0]
    tags: dict = {}
    for i in range(n):
        base = offset + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        vpos = base + 8 if total <= 4 else \
            struct.unpack_from(bo + "I", data, base + 8)[0]
        if typ in (3, 4):
            fmt = "H" if typ == 3 else "I"
            vals = list(struct.unpack_from(bo + fmt * cnt, data, vpos))
        else:
            vals = [data[vpos:vpos + total]]
        tags[tag] = vals
    return tags


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i:i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expect])


def _packbits_encode(data: bytes) -> bytes:
    """Simple PackBits: runs of ≥3 as replicate, else literal spans."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while run < 128 and i + run < n and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        while (j < n and j - i < 128
               and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF LZW (spec §13): MSB-first variable-width codes, CLEAR=256,
    EOI=257, EarlyChange (width grows one code early)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out[:expect])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt TIFF LZW stream")
            out += entry
            prev = entry
            # EarlyChange: grow when the NEXT code would not fit
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expect:
                return bytes(out[:expect])
    return bytes(out[:expect])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encoder twin (MSB-first, EarlyChange)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = bits = 0

    def put(code: int, width: int):
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(CLEAR, width)
    run = b""
    for b in bytes(data):
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        table[cand] = next_code
        next_code += 1
        # EarlyChange: the DECODER grows when len(table)+1 hits 2^width,
        # which is one code earlier than the encoder's next_code needs
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([b])
    if run:
        put(table[run], width)
    put(EOI, width)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes):
    """TIFF bytes → HxWx3 uint8 (baseline strip- or tile-organized)."""
    import numpy as np

    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    if struct.unpack_from(bo + "H", payload, 2)[0] != 42:
        raise ValueError("bad TIFF magic")
    ifd0 = struct.unpack_from(bo + "I", payload, 4)[0]
    tags = _read_ifd(payload, bo, ifd0)

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    w, h = one(256), one(257)
    if not w or not h:
        raise ValueError("TIFF missing geometry tags")
    comp = one(259, 1)
    photo = one(262, 1)
    spp = one(277, 1)
    bits = [b for b in tags.get(258, [8]) if isinstance(b, int)]
    sampbits = bits[0] if bits else 8
    if any(b != sampbits for b in bits) or sampbits not in (8, 16):
        raise NotImplementedError(f"TIFF samples of {bits} bits")
    bps = sampbits // 8
    planar = one(284, 1)
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF planar configuration {planar}")
    if planar == 2 and (322 in tags or 323 in tags):
        raise NotImplementedError("tiled planar TIFF")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photo}")
    palette = None
    if photo == 3:  # palette-color: ColorMap is 3×2^bits 16-bit ramps
        if sampbits != 8:
            raise NotImplementedError("palette TIFF with 16-bit indices")
        cmap = tags.get(320)  # _read_ifd unpacks SHORTs to an int list
        if not cmap or spp != 1:
            raise ValueError("palette TIFF missing/invalid ColorMap")
        if len(cmap) != 3 * 256:
            raise NotImplementedError(
                f"ColorMap with {len(cmap)} entries (want 768)")
        # 16-bit color ramps → 8-bit channels (high byte)
        palette = (np.array(cmap, np.uint16).reshape(3, 256).T
                   >> 8).astype(np.uint8)

    def _decompress(chunk: bytes, expect: int) -> bytes:
        if comp == 1:
            return chunk[:expect]
        if comp == 32773:
            return _packbits_decode(chunk, expect)
        if comp == 5:
            return _tiff_lzw_decode(chunk, expect)
        if comp in (8, 32946):  # Deflate (official + legacy code)
            import zlib

            return zlib.decompress(chunk)[:expect]
        raise NotImplementedError(f"TIFF compression {comp}")

    dt = np.uint8 if sampbits == 8 else np.dtype(bo + "u2")

    def _predict(a16):
        """Undo horizontal differencing at the sample's native width
        (the predictor operates on 16-bit values for 16-bit files)."""
        acc_t = np.uint8 if sampbits == 8 else np.uint16
        return np.cumsum(a16, axis=1, dtype=acc_t)

    if 322 in tags or 323 in tags:  # tiled layout (TIFF 6.0 §15)
        tw, th = one(322), one(323)
        offsets = tags.get(324)
        counts = tags.get(325)
        if not tw or not th or not offsets or not counts:
            raise ValueError("tiled TIFF missing tile tags")
        cols = (w + tw - 1) // tw
        arr = np.zeros((h, w, spp), dt)
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            ty, tx = (i // cols) * th, (i % cols) * tw
            # every tile is padded to full tw×th in the file
            tile = np.frombuffer(
                _decompress(payload[off:off + cnt], tw * th * spp * bps),
                dt)
            if len(tile) < tw * th * spp:
                raise ValueError("truncated TIFF tile")
            tile = tile.reshape(th, tw, spp)
            if predictor == 2:  # horizontal differencing, per TILE row
                tile = _predict(tile)
            ch, cw = min(th, h - ty), min(tw, w - tx)
            arr[ty:ty + ch, tx:tx + cw] = tile[:ch, :cw]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts:
            raise ValueError("TIFF missing strip tags")
        rows_per_strip = one(278, h)
        if planar == 2:
            # plane-interleaved: all of plane 0's strips, then plane 1's…
            # (TIFF 6.0 PlanarConfiguration=2); each strip carries ONE
            # sample per pixel, predictor runs within the plane
            strips_per_plane = (h + rows_per_strip - 1) // rows_per_strip
            if len(offsets) < spp * strips_per_plane \
                    or len(counts) < spp * strips_per_plane:
                raise ValueError("planar TIFF missing strips")
            planes = []
            for s in range(spp):
                raster = bytearray()
                remaining = h
                for j in range(strips_per_plane):
                    k = s * strips_per_plane + j
                    rows = min(rows_per_strip, remaining)
                    raster += _decompress(
                        payload[offsets[k]:offsets[k] + counts[k]],
                        rows * w * bps)
                    remaining -= rows
                if len(raster) < h * w * bps:
                    raise ValueError("truncated planar TIFF raster")
                plane = np.frombuffer(bytes(raster[:h * w * bps]), dt) \
                    .reshape(h, w, 1)
                planes.append(_predict(plane) if predictor == 2 else plane)
            arr = np.concatenate(planes, axis=2)
        else:
            raster = bytearray()
            remaining_rows = h
            for off, cnt in zip(offsets, counts):
                rows = min(rows_per_strip, remaining_rows)
                raster += _decompress(payload[off:off + cnt],
                                      rows * w * spp * bps)
                remaining_rows -= rows
            if len(raster) < h * w * spp * bps:
                raise ValueError("truncated TIFF raster")
            arr = np.frombuffer(bytes(raster[:h * w * spp * bps]), dt) \
                .reshape(h, w, spp)
            if predictor == 2:  # strip rows span the image width
                arr = _predict(arr)
    if sampbits == 16:  # standard high-byte reduction to the 8-bit contract
        arr = (arr >> 8).astype(np.uint8)
    if spp == 1:
        if palette is not None:
            out = palette[arr[:, :, 0]]
        else:
            if photo == 0:  # WhiteIsZero
                arr = 255 - arr
            out = np.repeat(arr, 3, axis=2)
    elif spp >= 3:
        out = np.ascontiguousarray(arr[:, :, :3])
    else:
        raise NotImplementedError(f"{spp}-sample TIFF")
    orient = one(274, 1)
    if orient != 1:
        # r11: honor the TIFF/EXIF Orientation tag, same table as the
        # JPEG path (scanner output commonly carries 3/6/8)
        from sparkdon.multimodal import apply_exif_orientation

        out = apply_exif_orientation(out, orient)
    return out


def encode_tiff(arr, compression: str = "none",
                byte_order: str = "<", rows_per_strip: int = 64,
                palette=None, tile=None, predictor: int = 1,
                orientation: int = 1, planar: bool = False,
                bits: int = 8) -> bytes:
    """TIFF encoder twin: HxW (gray) or HxWx3 uint8 → baseline TIFF.
    ``compression`` ∈ none | packbits | lzw | deflate;
    ``predictor=2`` applies horizontal differencing per segment row.  ``palette`` (256×3
    uint8, requires 2-D index input) emits a photometric-3
    palette-color file with a 16-bit ColorMap.  ``tile=(tw, th)``
    emits the tiled layout (TIFF 6.0 §15: every tile padded to full
    size) instead of strips.  ``orientation`` writes tag 274 (pixels
    stored as given; decode_tiff applies the rotation).  ``planar=True``
    writes PlanarConfiguration=2 (each plane's strips contiguous);
    ``bits=16`` takes a uint16 array and writes 16-bit samples in the
    file's byte order (r11 twins for the matching decode paths)."""
    import numpy as np

    if bits not in (8, 16):
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    a = np.asarray(arr, dtype=np.uint8 if bits == 8 else np.uint16)
    gray = a.ndim == 2
    if palette is not None and not gray:
        raise ValueError("palette TIFF needs a 2-D index array")
    if palette is not None and bits != 8:
        raise ValueError("palette TIFF needs 8-bit indices")
    if predictor not in (1, 2):
        raise ValueError(f"predictor must be 1 or 2, got {predictor}")
    if compression not in ("none", "packbits", "lzw", "deflate"):
        raise ValueError(f"unknown compression {compression!r}")
    if planar and tile is not None:
        raise ValueError("planar + tiled layout unsupported (decode twin)")
    if gray:
        a = a[:, :, None]
    h, w, spp = a.shape
    bo = byte_order
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5,
               "deflate": 8}[compression]

    def _hdiff(block):
        out = block.copy()
        out[:, 1:] = block[:, 1:] - block[:, :-1]  # uint8 wraps mod 256
        return out

    def _raw(block) -> bytes:
        # samples leave in the FILE's byte order at their native width
        if bits == 16:
            return block.astype(np.dtype(bo + "u2")).tobytes()
        return block.tobytes()

    def _compress(raw: bytes) -> bytes:
        if compression == "packbits":
            return _packbits_encode(raw)
        if compression == "lzw":
            return _tiff_lzw_encode(raw)
        if compression == "deflate":
            import zlib

            return zlib.compress(raw)
        return raw

    strips = []
    if tile is not None:
        tw_, th_ = tile
        for ty in range(0, h, th_):
            for tx in range(0, w, tw_):
                block = np.zeros((th_, tw_, spp), np.uint8)
                sub = a[ty:ty + th_, tx:tx + tw_]
                block[:sub.shape[0], :sub.shape[1]] = sub
                if predictor == 2:
                    block = _hdiff(block)
                strips.append(_compress(_raw(block)))
    elif planar:
        for s_ in range(spp):
            for y0 in range(0, h, rows_per_strip):
                seg = a[y0:y0 + rows_per_strip, :, s_:s_ + 1]
                if predictor == 2:
                    seg = _hdiff(seg)
                strips.append(_compress(_raw(seg)))
    else:
        for y0 in range(0, h, rows_per_strip):
            seg = a[y0:y0 + rows_per_strip]
            if predictor == 2:
                seg = _hdiff(seg)
            strips.append(_compress(_raw(seg)))

    nstrips = len(strips)
    photo = 3 if palette is not None else (1 if gray else 2)
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (259, 3, 1, comp_id),
        (262, 3, 1, photo), (277, 3, 1, spp),
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))
    if orientation != 1:
        # writer twin for the decode-side Orientation handling (r11):
        # pixels are stored as given; the tag tells readers to rotate
        entries.append((274, 3, 1, orientation))
    if planar:
        entries.append((284, 3, 1, 2))
    if tile is not None:
        off_tag, cnt_tag = 324, 325
        entries += [(322, 4, 1, tile[0]), (323, 4, 1, tile[1])]
    else:
        off_tag, cnt_tag = 273, 279
        entries.append((278, 4, 1, rows_per_strip))
    # BitsPerSample: inline for ≤2 samples, else external array
    ext = bytearray()
    header_size = 8
    # compute layout: header, IFD, external arrays, strip data
    n_entries = len(entries) + 3  # + bits + offsets + counts
    if palette is not None:
        n_entries += 1  # + ColorMap
    ifd_size = 2 + 12 * n_entries + 4
    ext_base = header_size + ifd_size

    def ext_put(fmt: str, vals) -> int:
        off = ext_base + len(ext)
        for v in vals:
            ext.extend(struct.pack(bo + fmt, v))
        return off

    if spp <= 2:
        bits_entry = (258, 3, spp, None)  # inline below
        bits_inline = True
    else:
        bits_entry = (258, 3, spp, ext_put("H", [bits] * spp))
        bits_inline = False
    if palette is not None:
        pal = np.asarray(palette, np.uint8)
        if pal.shape != (256, 3):
            raise ValueError("palette must be 256x3 uint8")
        # ColorMap: all red, all green, all blue — 16-bit ramps whose
        # high byte is the 8-bit channel (exact round-trip)
        ramp = (pal.T.astype(np.uint16) << 8).ravel()
        entries.append((320, 3, 768, ext_put("H", [int(v) for v in ramp])))
    if nstrips == 1:
        off_entry = (off_tag, 4, 1, None)  # patched after layout
        cnt_entry = (cnt_tag, 4, 1, len(strips[0]))
        off_ext = cnt_ext = None
    else:
        off_ext = ext_put("I", [0] * nstrips)  # patched later
        cnt_ext = ext_put("I", [len(s) for s in strips])
        off_entry = (off_tag, 4, nstrips, off_ext)
        cnt_entry = (cnt_tag, 4, nstrips, cnt_ext)

    data_base = ext_base + len(ext)
    strip_offsets = []
    p = data_base
    for s in strips:
        strip_offsets.append(p)
        p += len(s)
    if nstrips > 1:
        for i, so in enumerate(strip_offsets):
            struct.pack_into(bo + "I", ext, off_ext - ext_base + 4 * i, so)

    all_entries = sorted(
        entries + [bits_entry, off_entry, cnt_entry], key=lambda e: e[0])
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, 8)
    out += struct.pack(bo + "H", n_entries)
    for tag, typ, cnt, val in all_entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt)
        if tag == 258 and bits_inline:
            out += struct.pack(bo + "HH", bits, bits if spp == 2 else 0)
        elif tag == off_tag and nstrips == 1:
            out += struct.pack(bo + "I", strip_offsets[0])
        elif typ == 3 and cnt == 1:
            out += struct.pack(bo + "HH", val, 0)
        else:
            out += struct.pack(bo + "I", val)
    out += struct.pack(bo + "I", 0)  # next-IFD pointer
    out += ext
    for s in strips:
        out += s
    return bytes(out)

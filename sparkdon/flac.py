"""FLAC decode (+ encoder twin) — pure stdlib/numpy, from the public
format spec (xiph.org / RFC 9639).

Audio corpora ship FLAC at least as often as WAV; this closes the
"lossless audio" half of the audio boundary (MP3-class *lossy* codecs
remain honestly unimplemented).  Same contract as
:func:`sparkdon.multimodal.decode_wav`: ``(int16 samples [n, channels],
rate)``.

Coverage: STREAMINFO + skipped metadata blocks; frames with all
blocksize/rate/sample-size codes; UTF-8-coded frame numbers; subframe
types CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (any order);
Rice residual methods 0 and 1 incl. escape partitions; wasted bits;
stereo decorrelation (left/side, right/side, mid/side).  CRCs are
computed by the encoder and skipped (not verified) by the decoder —
the decode contract is content recovery, not integrity checking.

The per-sample loops are plain Python: this is the correctness path
for bounded test media (the distributed story is the Arrow-batched
``mapInPandas`` stage around it, same as every other decoder here).
"""

from __future__ import annotations

#: fixed-predictor coefficients by order (spec §9.2.1)
_FIXED = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                    **{n: 256 << (n - 8) for n in range(8, 16)}}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC stream")
            out = (out << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _utf8_number(br: _Bits) -> int:
    """UTF-8-style coded frame/sample number (up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


def _rice_residuals(br: _Bits, n: int, order: int) -> list:
    """Coded residual (spec §9.2.7): 2-bit method, 4-bit partition
    order, Rice-coded partitions with escape codes."""
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    parts = 1 << porder
    out: list = []
    for p in range(parts):
        cnt = (n >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(cnt):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(cnt):
                q = br.unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _subframe(br: _Bits, n: int, bps: int) -> list:
    """One subframe → n ints (spec §9.2.2-9.2.6)."""
    if br.read(1):
        raise ValueError("invalid subframe padding bit")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count - 1
        wasted = br.unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = [v] * n
    elif ftype == 1:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(n)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        out = [br.read_signed(bps) for _ in range(order)]
        res = _rice_residuals(br, n, order)
        coef = _FIXED[order]
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coef))
            out.append(pred + r)
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        out = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read_signed(5)
        coef = [br.read_signed(prec) for _ in range(order)]
        res = _rice_residuals(br, n, order)
        for r in res:
            acc = sum(c * out[-1 - j] for j, c in enumerate(coef))
            out.append((acc >> shift) + r)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _walk_metadata(payload: bytes):
    """(blocks list, first-frame offset)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC marker)")
    pos = 4
    blocks = []
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        ln = int.from_bytes(payload[pos + 1:pos + 4], "big")
        blocks.append((btype, payload[pos + 4:pos + 4 + ln]))
        pos += 4 + ln
        if last:
            break
    return blocks, pos


def decode_flac(payload: bytes):
    """FLAC bytes → ``(int16 samples [n, channels], rate)`` — the
    decode_wav contract; samples at other bit depths scale to 16."""
    import numpy as np

    info = None
    blocks, pos = _walk_metadata(payload)
    for btype, body in blocks:
        if btype == 0:  # STREAMINFO
            br = _Bits(body)
            br.read(16 + 16 + 24 + 24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, channels, bps, total)
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO")
    rate, channels, bps, total = info

    chans: list = [[] for _ in range(channels)]
    got = 0
    while (total == 0 or got < total) and pos < len(payload) - 1:
        br = _Bits(payload, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync at byte {pos}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        sz_code = br.read(3)
        br.read(1)  # reserved
        _utf8_number(br)
        if bs_code == 6:
            bsize = br.read(8) + 1
        elif bs_code == 7:
            bsize = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODES:
            bsize = _BLOCKSIZE_CODES[bs_code]
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code != 0 and sr_code not in _RATE_CODES:
            raise ValueError(f"invalid sample rate code {sr_code}")
        fbps = bps if sz_code == 0 else _SIZE_CODES.get(sz_code)
        if fbps is None:
            raise ValueError(f"reserved sample size code {sz_code}")
        br.read(8)  # header CRC-8 (not verified)

        if total == 0:
            remaining = bsize
        else:
            remaining = min(bsize, total - got)
        if ch_code < 8:
            if ch_code + 1 != channels:
                raise ValueError("frame/STREAMINFO channel mismatch")
            subs = [_subframe(br, bsize, fbps) for _ in range(channels)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            # the side channel carries one extra bit
            if ch_code == 8:    # left/side
                left = _subframe(br, bsize, fbps)
                side = _subframe(br, bsize, fbps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _subframe(br, bsize, fbps + 1)
                right = _subframe(br, bsize, fbps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:               # mid/side: m2 = (mid<<1)|(side&1)
                mid = _subframe(br, bsize, fbps)
                side = _subframe(br, bsize, fbps + 1)
                left = [(((m << 1) | (s & 1)) + s) >> 1
                        for m, s in zip(mid, side)]
                subs = [left, [l - s for l, s in zip(left, side)]]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        br.align()
        br.read(16)  # frame CRC-16 (not verified)
        pos = br.pos
        for c in range(channels):
            chans[c].extend(subs[c][:remaining])
        got += remaining

    arr = np.array(chans, dtype=np.int64).T  # [n, channels]
    shift = bps - 16
    arr = (arr >> shift) if shift >= 0 else (arr << -shift)
    return np.clip(arr, -32768, 32767).astype(np.int16), rate


# ---------------------------------------------------------------------------
# encoder twin
# ---------------------------------------------------------------------------

class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def align(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_encode(n: int) -> bytes:
    """UTF-8-style coded number, general form (up to 36 bits / 7 bytes
    per the FLAC spec; the 2-byte-only shortcut desynced the stream at
    frame 2048)."""
    if n < 0x80:
        return bytes([n])
    cont: list = []
    while True:
        cont.insert(0, 0x80 | (n & 0x3F))
        n >>= 6
        nbytes = len(cont) + 1
        lead_bits = 7 - nbytes
        if n < (1 << lead_bits):
            lead = ((0xFF << (8 - nbytes)) & 0xFF) | n
            return bytes([lead] + cont)


def _write_rice(bw: _BitW, res: list, pbits: int = 4) -> None:
    """Single-partition Rice coding with parameter search + escape."""
    escape = (1 << pbits) - 1
    folded = [(r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
              for r in (int(x) for x in res)]
    best_p, best_cost = 0, None
    for p in range(escape):
        cost = 0
        for v in folded:
            cost += (v >> p) + 1 + p
            if best_cost is not None and cost >= best_cost:
                break
        else:
            if best_cost is None or cost < best_cost:
                best_p, best_cost = p, cost
    raw = max((abs(int(r)).bit_length() + 1 for r in res), default=1)
    if best_cost is None or best_cost > raw * len(res) + 5:
        bw.write(escape, pbits)
        bw.write(raw, 5)
        for r in res:
            bw.write_signed(int(r), raw)
        return
    bw.write(best_p, pbits)
    for v in folded:
        q = v >> best_p
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        if best_p:
            bw.write(v & ((1 << best_p) - 1), best_p)


def _encode_subframe(bw: _BitW, samples, bps: int, order: int) -> None:
    """CONSTANT when flat, else FIXED at the given order (VERBATIM for
    order < 0)."""
    vals = [int(v) for v in samples]
    bw.write(0, 1)
    if len(set(vals)) == 1:
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write_signed(vals[0], bps)
        return
    if order < 0 or len(vals) <= order:
        # a tail block shorter than the predictor order cannot carry
        # `order` warm-up samples — VERBATIM is always legal
        bw.write(1, 6)
        bw.write(0, 1)
        for v in vals:
            bw.write_signed(v, bps)
        return
    bw.write(8 + order, 6)
    bw.write(0, 1)  # no wasted bits
    for v in vals[:order]:
        bw.write_signed(v, bps)
    coef = _FIXED[order]
    res = [vals[i] - sum(c * vals[i - 1 - j] for j, c in enumerate(coef))
           for i in range(order, len(vals))]
    bw.write(0, 2)   # residual method 0
    bw.write(0, 4)   # partition order 0
    _write_rice(bw, res)


def encode_flac(samples, rate: int, block_size: int = 4096,
                order: int = 2, stereo: str = "independent") -> bytes:
    """FLAC encoder twin: int16 ``[n, channels]`` → FLAC bytes that
    :func:`decode_flac` recovers exactly.  ``order`` picks the FIXED
    predictor (−1 = VERBATIM subframes); ``stereo`` one of
    ``independent`` | ``left_side`` | ``mid_side`` (2-channel input)."""
    header, frames = _encode_flac_parts(samples, rate, block_size, order,
                                        stereo)
    return header + b"".join(f for f, _ in frames)


def _encode_flac_parts(samples, rate: int, block_size: int,
                       order: int, stereo: str):
    """(header bytes, [(frame bytes, last-sample position)]) — the
    frame boundaries feed the Ogg mapping's one-frame-per-packet rule."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, channels = a.shape
    bps = 16

    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si_bytes = bytes(si.out) + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    frames: list = []
    frame_no = 0
    for start in range(0, n, block_size):
        blk = a[start:start + block_size]
        bn = blk.shape[0]
        bw = _BitW()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed-blocksize strategy
        bw.write(7, 4)  # blocksize: 16-bit value follows
        bw.write(0, 4)  # rate: from STREAMINFO
        if channels == 2 and stereo == "left_side":
            bw.write(8, 4)
        elif channels == 2 and stereo == "mid_side":
            bw.write(10, 4)
        else:
            bw.write(channels - 1, 4)
        bw.write(4, 3)  # 16-bit samples
        bw.write(0, 1)
        for b in _utf8_encode(frame_no):
            bw.write(b, 8)
        bw.write(bn - 1, 16)
        bw.write(_crc8(bytes(bw.out)), 8)
        if channels == 2 and stereo == "left_side":
            left = blk[:, 0]
            side = blk[:, 0] - blk[:, 1]
            _encode_subframe(bw, left, bps, order)
            _encode_subframe(bw, side, bps + 1, order)
        elif channels == 2 and stereo == "mid_side":
            l, r = blk[:, 0], blk[:, 1]
            mid = (l + r) >> 1
            side = l - r
            _encode_subframe(bw, mid, bps, order)
            _encode_subframe(bw, side, bps + 1, order)
        else:
            for c in range(channels):
                _encode_subframe(bw, blk[:, c], bps, order)
        bw.align()
        body = bytes(bw.out)
        frames.append((body + struct.pack(">H", _crc16(body)),
                       start + bn))
        frame_no += 1
    return bytes(out), frames


def flac_tags(payload: bytes) -> dict:
    """VORBIS_COMMENT metadata (block type 4) → dict of upper-cased
    ``KEY`` → value (first occurrence wins; the spec allows repeats).
    Returns ``{}`` when the stream carries no comment block.  The
    comment count is untrusted input: the loop is bounded by the block
    body, so a corrupt count cannot hang the metadata pass."""
    blocks, _ = _walk_metadata(payload)
    for btype, body in blocks:
        if btype == 4:
            return _vorbis_comments(body)
    return {}


def _vorbis_comments(body: bytes) -> dict:
    """The Vorbis comment structure (vendor string + KEY=value list) —
    shared verbatim by FLAC, Ogg Vorbis and Opus tags.  The count is
    untrusted: the loop is bounded by the body, so a corrupt count
    cannot hang the metadata pass."""
    out: dict = {}
    vlen = int.from_bytes(body[0:4], "little")
    p = 4 + vlen
    n = int.from_bytes(body[p:p + 4], "little")
    p += 4
    for _ in range(n):
        if p + 4 > len(body):
            break  # corrupt count — stop at the block boundary
        clen = int.from_bytes(body[p:p + 4], "little")
        p += 4
        item = body[p:p + clen].decode("utf-8", "replace")
        p += clen
        k, _, v = item.partition("=")
        out.setdefault(k.upper(), v)
    return out


def decode_ogg_flac(payload: bytes):
    """FLAC-in-Ogg (.oga / .ogg lossless, per the public Ogg mapping):
    reassemble the logical FLAC stream from Ogg page segments and hand
    it to :func:`decode_flac`.

    The first packet is ``0x7F 'FLAC' major minor nheaders`` followed by
    the native ``fLaC`` signature and STREAMINFO; every later packet is
    a native metadata block or frame, so stripping the Ogg framing and
    the 9-byte mapping preamble yields a byte-exact native stream.
    CRCs and page sequence numbers are not verified (same contract as
    the native decoder)."""
    return decode_flac(ogg_to_native(payload))


def ogg_to_native(payload: bytes) -> bytes:
    """Ogg-FLAC → byte-exact native FLAC stream (page reassembly)."""
    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg container (missing OggS)")
    stream = bytearray()
    pos = 0
    while pos + 27 <= len(payload):
        if payload[pos:pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg page boundary at byte {pos}")
        nsegs = payload[pos + 26]
        table = payload[pos + 27:pos + 27 + nsegs]
        body = pos + 27 + nsegs
        size = sum(table)
        stream += payload[body:body + size]
        pos = body + size
    if stream[:5] != b"\x7fFLAC":
        raise ValueError("Ogg stream is not FLAC-mapped")
    # 0x7F 'FLAC' major(1) minor(1) nheaders(2be) then native fLaC...
    return bytes(stream[9:])


def encode_ogg_flac(samples, rate: int, **kw) -> bytes:
    """Ogg-FLAC twin, per the public Ogg mapping + RFC 3533 framing:
    the first page carries ONLY the mapping packet (preamble + fLaC +
    STREAMINFO, BOS flag, zero following header packets); each FLAC
    frame is its own packet; packets pack into pages up to the
    255-entry lacing capacity, spilling across pages with the
    continued-packet flag when a single frame exceeds a page; each
    audio page's granule position is the last sample completed on that
    page.  Page CRCs are left zero (the in-repo decoder skips them)."""
    import struct

    header, frames = _encode_flac_parts(
        samples, rate, kw.pop("block_size", 4096), kw.pop("order", 2),
        kw.pop("stereo", "independent"))
    if kw:
        raise TypeError(f"unknown encode_ogg_flac options {sorted(kw)}")
    first = b"\x7fFLAC\x01\x00" + struct.pack(">H", 0) + header

    out = bytearray()
    seq = 0

    def emit(header_type: int, granule: int, segs: list, data: bytes):
        nonlocal seq
        out.extend(b"OggS\x00" + bytes([header_type])
                   + struct.pack("<qIIi", granule, 0x5350, seq, 0)
                   + bytes([len(segs)]) + bytes(segs) + data)
        seq += 1

    # BOS page: the lone mapping/header packet
    segs = [255] * (len(first) // 255) + [len(first) % 255]
    emit(0x02, 0, segs, first)

    # audio pages: greedy packet packing, spec-correct continuation
    segs, data = [], bytearray()
    granule = 0
    continued = False
    for i, (frame, last_pos) in enumerate(frames):
        fsegs = [255] * (len(frame) // 255) + [len(frame) % 255]
        fpos = 0
        for si, s in enumerate(fsegs):
            if len(segs) == 255:
                # page full mid-packet: flush WITHOUT a terminator —
                # per RFC 3533 a lacing table ending at 255 continues
                # the packet on the next page
                emit(0x01 if continued else 0x00, granule, segs,
                     bytes(data))
                segs, data = [], bytearray()
                continued = True
            segs.append(s)
            data += frame[fpos:fpos + s]
            fpos += s
        granule = last_pos
        if i == len(frames) - 1:
            emit((0x01 if continued else 0x00) | 0x04, granule, segs,
                 bytes(data))
        continued = False
    return bytes(out)


def _ogg_packets(payload: bytes, limit: int = 3):
    """First ``limit`` packets of the FIRST logical Ogg bitstream,
    plus the stream's final granule position (RFC 3533 lacing: a
    packet ends at a lacing value < 255)."""
    import struct

    packets: list[bytes] = []
    current = bytearray()
    serial = None
    last_granule = 0
    pos = 0
    while pos + 27 <= len(payload):
        if payload[pos:pos + 4] != b"OggS":
            break
        granule, ser = struct.unpack_from("<qI", payload, pos + 6)
        nsegs = payload[pos + 26]
        table = payload[pos + 27:pos + 27 + nsegs]
        body = pos + 27 + nsegs
        if serial is None:
            serial = ser
        if ser == serial:
            if granule not in (-1, 0):
                last_granule = granule
            off = body
            for lace in table:
                if len(packets) < limit:
                    current += payload[off:off + lace]
                    if lace < 255:
                        packets.append(bytes(current))
                        current = bytearray()
                off += lace
        pos = body + sum(table)
    return packets, last_granule


def ogg_info(payload: bytes) -> dict:
    """Ogg container metadata for the codecs a corpus actually holds:
    Vorbis (``\\x01vorbis`` id header → channels/rate, ``\\x03vorbis``
    comments), Opus (``OpusHead``/``OpusTags``), and FLAC-in-Ogg
    (native tag walk + STREAMINFO rate/channels/duration).  Duration
    derives from the final granule position (PCM samples for
    Vorbis/FLAC, 48 kHz ticks minus pre-skip for Opus), emitted only
    when positive — corrupt granules stay out of the corpus.
    Truncated header packets degrade to whatever fields fit; unknown
    mappings (Theora, Speex, …) return ``{}`` — best-effort, per the
    metadata-stage contract."""
    import struct

    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg container (missing OggS)")
    packets, last_granule = _ogg_packets(payload)
    if not packets:
        return {}
    p0 = packets[0]
    out: dict = {}
    if p0[:7] == b"\x01vorbis":
        out["codec"] = "vorbis"
        if len(p0) >= 16:  # truncated id headers degrade gracefully
            out["channels"] = p0[11]
            rate = struct.unpack_from("<I", p0, 12)[0]
            out["sample_rate"] = rate
            if rate and last_granule > 0:
                out["duration_ms"] = last_granule * 1000 // rate
        if len(packets) > 1 and packets[1][:7] == b"\x03vorbis":
            out.update(_vorbis_comments(packets[1][7:]))
    elif p0[:8] == b"OpusHead":
        out["codec"] = "opus"
        if len(p0) >= 16:
            out["channels"] = p0[9]
            preskip = struct.unpack_from("<H", p0, 10)[0]
            out["sample_rate"] = struct.unpack_from("<I", p0, 12)[0]
            if last_granule > 0:
                out["duration_ms"] = max(0, last_granule - preskip) \
                    * 1000 // 48000
        if len(packets) > 1 and packets[1][:8] == b"OpusTags":
            out.update(_vorbis_comments(packets[1][8:]))
    elif p0[:5] == b"\x7fFLAC":
        out["codec"] = "flac"
        native = ogg_to_native(payload)
        out.update(flac_tags(native))
        for btype, body in _walk_metadata(native)[0]:
            if btype == 0:  # STREAMINFO: rate/channels/duration
                br = _Bits(body)
                br.read(16 + 16 + 24 + 24)
                rate = br.read(20)
                out["channels"] = br.read(3) + 1
                br.read(5)
                total = br.read(36)
                out["sample_rate"] = rate
                samples = total or max(0, last_granule)
                if rate and samples:
                    out["duration_ms"] = samples * 1000 // rate
                break
    return out

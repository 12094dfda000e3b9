"""Pure-numpy media codecs: WAV (PCM-16) and BMP (24-bit).

The container has no PIL/librosa, but these two formats are simple
enough to decode with struct + numpy alone — which turns one image and
one audio path in operators.multimodal into REAL decoders (bytes in,
pixels/samples out) instead of hash-derived stand-ins. Formats:

* WAV: RIFF container, ``fmt `` chunk (PCM, mono/stereo, 16-bit),
  ``data`` chunk of little-endian int16 samples.
* BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (40 bytes), 24 bpp,
  uncompressed, BGR byte order, rows bottom-up and padded to 4 bytes.

Both encoders exist so tests can synthesize valid bytes without any
external fixture; decode(encode(x)) == x exactly.
"""

from __future__ import annotations

import struct

import numpy as np


# -- WAV (RIFF / PCM-16) ---------------------------------------------------

def encode_wav_pcm16(samples, sample_rate: int,
                     n_channels: int = 1) -> bytes:
    """Encode int16 samples (flat, channel-interleaved) as a WAV blob."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        s = np.clip(np.round(s), -32768, 32767).astype(np.int16)
    data = s.astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_channels,
                                sample_rate, byte_rate, block_align, 16)
    body = fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav_pcm16(raw: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a PCM-16 WAV blob → (samples int16 [n, channels],
    sample_rate, n_channels). Walks RIFF chunks; raises ValueError on
    anything that is not uncompressed 16-bit PCM."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, n = 12, len(raw)
    sample_rate = n_channels = None
    data = None
    while pos + 8 <= n:
        cid = raw[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate, _, _, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV encoding (fmt={audio_fmt}, "
                    f"bits={bits}); only PCM-16 is implemented")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)   # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if n_channels > 1:
        samples = samples[:len(samples) - len(samples) % n_channels] \
            .reshape(-1, n_channels)
    else:
        samples = samples.reshape(-1, 1)
    return samples, sample_rate, n_channels


# -- BMP (24-bit uncompressed) --------------------------------------------

def encode_bmp24(px) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BMP blob."""
    px = np.asarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_bmp24 expects (h, w, 3) RGB")
    pad = (4 - (w * 3) % 4) % 4
    rows = []
    for y in range(h - 1, -1, -1):          # bottom-up
        rows.append(px[y, :, ::-1].tobytes() + b"\x00" * pad)
    body = b"".join(rows)
    file_header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0,
                                      14 + 40)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              len(body), 2835, 2835, 0, 0)
    return file_header + info_header + body


def decode_bmp24(raw: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP blob → (h, w, 3) uint8 RGB."""
    if len(raw) < 54 or raw[:2] != b"BM":
        raise ValueError("not a BMP blob")
    (offset,) = struct.unpack_from("<I", raw, 10)
    hdr_size, w, h_signed, _planes, bpp, compression = \
        struct.unpack_from("<IiiHHI", raw, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={compression}); "
            f"only 24-bit uncompressed is implemented")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    body = np.frombuffer(raw, dtype=np.uint8,
                         count=stride * h, offset=offset)
    rows = body.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]                   # bottom-up → top-down
    return rows[:, :, ::-1].copy()          # BGR → RGB


# -- G.711 μ-law (WAV format code 7) ---------------------------------------

_MU_BIAS = 0x84
_MU_CLIP = 32635


def encode_mulaw(samples) -> np.ndarray:
    """Compress int16 samples → uint8 G.711 μ-law codes (the standard
    bias-0x84 segmented encoder)."""
    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.clip(np.abs(x), 0, _MU_CLIP) + _MU_BIAS
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def decode_mulaw(codes) -> np.ndarray:
    """Expand uint8 G.711 μ-law codes → int16 samples (exact inverse of
    the standard segmented table: magnitude = ((2m+33) << e) - 33,
    scaled by 4)."""
    u = (~np.asarray(codes, dtype=np.uint8)) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((((mant.astype(np.int32) << 1) + 33) << exp) - 33) << 2
    return np.where(sign, -mag, mag).astype(np.int16)


def encode_wav_mulaw(samples, sample_rate: int,
                     n_channels: int = 1) -> bytes:
    """Encode int16 samples as a WAV blob with format code 7 (μ-law)."""
    codes = encode_mulaw(samples)
    data = codes.tobytes()
    byte_rate = sample_rate * n_channels
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 7, n_channels,
                                sample_rate, byte_rate, n_channels, 8)
    body = fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav_any(raw: bytes) -> tuple[np.ndarray, int, int]:
    """Decode PCM-16 (fmt 1) or μ-law (fmt 7) WAV → (int16 samples
    [n, channels], rate, channels). The multimodal audio path routes
    here so both encodings share one entry point."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, n = 12, len(raw)
    sample_rate = n_channels = audio_fmt = None
    data = None
    while pos + 8 <= n:
        cid = raw[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate, _, _, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
            if (audio_fmt, bits) not in ((1, 16), (7, 8)):
                raise ValueError(
                    f"unsupported WAV encoding (fmt={audio_fmt}, "
                    f"bits={bits}); PCM-16 and G.711 mu-law implemented")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if audio_fmt == 7:
        samples = decode_mulaw(np.frombuffer(data, dtype=np.uint8))
    else:
        samples = np.frombuffer(data, dtype="<i2")
    if n_channels > 1:
        samples = samples[:len(samples) - len(samples) % n_channels] \
            .reshape(-1, n_channels)
    else:
        samples = samples.reshape(-1, 1)
    return samples, sample_rate, n_channels


# -- netpbm (PPM P6 / PGM P5, binary, maxval 255) --------------------------

def encode_ppm(px) -> bytes:
    """Encode (h, w, 3) uint8 RGB → binary PPM (P6)."""
    px = np.asarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_ppm expects (h, w, 3) RGB")
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def encode_pgm(px) -> bytes:
    """Encode (h, w) uint8 grayscale → binary PGM (P5)."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_netpbm(raw: bytes) -> np.ndarray:
    """Decode binary PPM (P6) → (h, w, 3) RGB or PGM (P5) → (h, w)
    grayscale, uint8, maxval 255. Handles whitespace + '#' comments in
    the header (the format's only wrinkle)."""
    if raw[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM blob")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(raw) and raw[pos:pos + 1].isspace():
            pos += 1
        if raw[pos:pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1                                   # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 netpbm is implemented")
    ch = 3 if raw[:2] == b"P6" else 1
    body = np.frombuffer(raw, dtype=np.uint8, count=w * h * ch, offset=pos)
    return body.reshape(h, w, 3) if ch == 3 else body.reshape(h, w)


# -- QOI (Quite OK Image format, qoiformat.org spec) -----------------------

_QOI_MAGIC = b"qoif"


def _qoi_hash(px) -> int:
    r, g, b, a = int(px[0]), int(px[1]), int(px[2]), int(px[3])
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(px) -> bytes:
    """Encode (h, w, 3) RGB or (h, w, 4) RGBA uint8 → QOI bytes.
    Emits the full op set (RUN / INDEX / DIFF / LUMA / RGB / RGBA)."""
    px = np.asarray(px, dtype=np.uint8)
    h, w, ch = px.shape
    if ch not in (3, 4):
        raise ValueError("encode_qoi expects (h, w, 3|4)")
    flat = px.reshape(-1, ch)
    if ch == 3:
        flat = np.concatenate(
            [flat, np.full((flat.shape[0], 1), 255, np.uint8)], axis=1)
    out = bytearray(_QOI_MAGIC)
    out += struct.pack(">IIBB", w, h, ch, 0)
    index = np.zeros((64, 4), dtype=np.uint8)
    prev = np.array([0, 0, 0, 255], dtype=np.uint8)
    run = 0
    for p in flat:
        if (p == prev).all():
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        i = _qoi_hash(p)
        if (index[i] == p).all():
            out.append(i)
        else:
            index[i] = p
            if p[3] == prev[3]:
                dr = (int(p[0]) - int(prev[0]) + 128) % 256 - 128
                dg = (int(p[1]) - int(prev[1]) + 128) % 256 - 128
                db = (int(p[2]) - int(prev[2]) + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2)
                               | (db + 2))
                elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                        and -8 <= db - dg <= 7):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((0xFE, p[0], p[1], p[2]))
            else:
                out += bytes((0xFF, p[0], p[1], p[2], p[3]))
        prev = p.copy()
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi(raw: bytes) -> np.ndarray:
    """Decode QOI bytes → (h, w, 3) or (h, w, 4) uint8 per the header's
    channel count. Full op set. (Sequential chunk walk by spec design —
    fine for the Arrow-batched per-row decode path where each row is
    one modest image; it is not a bulk-pixel vector op like BMP.)"""
    if raw[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI blob")
    w, h, ch, _cs = struct.unpack(">IIBB", raw[4:14])
    if ch not in (3, 4):
        raise ValueError(f"bad QOI channel count {ch}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = np.zeros((64, 4), dtype=np.uint8)
    px = np.array([0, 0, 0, 255], dtype=np.uint8)
    pos, i = 14, 0
    while i < n:
        b0 = raw[pos]; pos += 1
        if b0 == 0xFE:
            px = np.array([raw[pos], raw[pos + 1], raw[pos + 2], px[3]],
                          dtype=np.uint8)
            pos += 3
        elif b0 == 0xFF:
            px = np.frombuffer(raw[pos:pos + 4], np.uint8).copy()
            pos += 4
        elif b0 >> 6 == 0:                      # INDEX
            px = index[b0 & 0x3F].copy()
        elif b0 >> 6 == 1:                      # DIFF
            px = px.copy()
            px[0] += ((b0 >> 4) & 3) - 2
            px[1] += ((b0 >> 2) & 3) - 2
            px[2] += (b0 & 3) - 2
        elif b0 >> 6 == 2:                      # LUMA
            b1 = raw[pos]; pos += 1
            dg = (b0 & 0x3F) - 32
            px = px.copy()
            px[0] += dg + ((b1 >> 4) & 0x0F) - 8
            px[1] += dg
            px[2] += dg + (b1 & 0x0F) - 8
        else:                                   # RUN
            run = (b0 & 0x3F) + 1
            out[i:i + run] = px
            i += run
            continue
        index[_qoi_hash(px)] = px
        out[i] = px
        i += 1
    return out.reshape(h, w, 4)[:, :, :ch] if ch == 3 \
        else out.reshape(h, w, 4)


# -- PNG (RFC 2083): real zlib DEFLATE + the full filter set --------------

def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG §6.6): nearest of left/up/up-left to
    a + b − c, ties preferring left, then up."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(px, filters=None) -> bytes:
    """Minimal REAL PNG writer: 8-bit RGB (color type 2) or grayscale
    (type 0), one zlib-compressed IDAT, CRC-checked chunks. ``filters``
    picks the per-row filter type; the default cycles 0→4 so a decoder
    exercising this output walks None/Sub/Up/Average/Paeth — the whole
    unfilter matrix, not just the easy path."""
    import zlib

    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    bpp = 1 if gray else px.shape[2]
    if bpp not in (1, 3):
        raise ValueError("encode_png: RGB or grayscale only")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
    stride = w * bpp
    flat = px.reshape(h, stride).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        f = (filters[y] if filters is not None else y % 5)
        raw.append(f)
        left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - (left + prev) // 2
        elif f == 4:
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, prev, upleft)),
                dtype=np.int16, count=stride)
            enc = row - pred
        else:
            raise ValueError(f"bad filter {f}")
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = row
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def decode_png(raw: bytes) -> np.ndarray:
    """REAL PNG decode: chunk walk with CRC verification, multi-IDAT
    zlib inflate, and the full unfilter matrix (None/Sub/Up/Average/
    Paeth). Supports the writer's profile — 8-bit RGB / grayscale,
    non-interlaced — and raises on anything else (palette, 16-bit,
    Adam7), never silently misreads."""
    import zlib

    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        tag = raw[pos + 4:pos + 8]
        data = raw[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", raw, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in (0, 2) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG profile (depth={depth}, color={ctype}, "
            f"interlace={interlace})")
    bpp = 3 if ctype == 2 else 1
    stride = w * bpp
    data = zlib.decompress(bytes(idat))
    if len(data) != h * (stride + 1):
        raise ValueError("PNG: IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = data[y * (stride + 1)]
        row = np.frombuffer(
            data, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            cur = row
        elif f == 2:
            cur = (row + prev) & 0xFF
        elif f in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pred = (a if f == 1
                        else (a + b) // 2 if f == 3
                        else _paeth(int(a), int(b), int(c)))
                cur[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w) if bpp == 1 else out.reshape(h, w, 3)


# -- GIF87a/89a: real LZW decompression ------------------------------------

def encode_gif(indices, palette) -> bytes:
    """Minimal REAL GIF writer: one frame, global color table, LZW
    image data emitted as <clear> <literal...> with the per-symbol
    code width growing exactly as a conforming decoder expects (the
    encoder never emits dictionary codes, which is legal LZW — but the
    DECODER must still grow its dictionary and code width in lockstep
    to read it, so decode exercises the real LZW machinery)."""
    px = np.asarray(indices, dtype=np.uint8)
    h, w = px.shape
    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    bits = max(2, int(np.ceil(np.log2(max(n, 2)))))
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[:n] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = bits
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes = []
    next_code, width = eoi + 1, min_code + 1
    codes.append((clear, width))
    first = True
    for v in px.reshape(-1):
        codes.append((int(v), width))
        # a conforming decoder adds one dictionary entry per code
        # AFTER the first following a clear; mirror its width growth
        if first:
            first = False
        else:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        if next_code >= 4094:
            codes.append((clear, width))
            next_code, width, first = eoi + 1, min_code + 1, True
    codes.append((eoi, width))
    buf, nbits, stream = 0, 0, bytearray()
    for code, cw in codes:
        buf |= code << nbits
        nbits += cw
        while nbits >= 8:
            stream.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        stream.append(buf & 0xFF)
    out.append(min_code)
    for i in range(0, len(stream), 255):
        block = stream[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"
    return bytes(out)


def decode_gif(raw: bytes) -> np.ndarray:
    """REAL GIF decode: header + global color table parse, sub-block
    reassembly, and a full LZW decompressor (dictionary build, code
    width growth, clear-code reset, <prev>+first-symbol rule) — the
    dictionary-coding counterpart of the PNG/QOI decoders. Returns the
    (h, w, 3) RGB frame; raises on interlace/local tables/multi-frame
    (outside the writer's profile) instead of misreading."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _, _ = struct.unpack_from("<HHBBB", raw, 6)
    if not flags & 0x80:
        raise ValueError("GIF without global color table")
    gct_n = 2 << (flags & 0x07)
    pos = 13
    table = np.frombuffer(raw, np.uint8, gct_n * 3,
                          pos).reshape(gct_n, 3)
    pos += gct_n * 3
    while raw[pos] == 0x21:                      # skip extensions
        pos += 2
        while raw[pos]:
            pos += raw[pos] + 1
        pos += 1
    if raw[pos] != 0x2C:
        raise ValueError("GIF: expected image descriptor")
    x0, y0, iw, ih, iflags = struct.unpack_from("<HHHHB", raw, pos + 1)
    if iflags & 0xC0:
        raise ValueError("GIF: interlace/local color table unsupported")
    pos += 10
    min_code = raw[pos]
    pos += 1
    data = bytearray()
    while raw[pos]:
        ln = raw[pos]
        data += raw[pos + 1:pos + 1 + ln]
        pos += ln + 1
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    dict_base = [(i,) for i in range(1 << min_code)] + [None, None]
    table_lzw = list(dict_base)
    width = min_code + 1
    buf = nbits = bit_pos = 0
    out: list[int] = []
    prev: tuple | None = None
    data = bytes(data)
    while True:
        while nbits < width:
            if bit_pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            buf |= data[bit_pos] << nbits
            bit_pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table_lzw = list(dict_base)
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table_lzw) and table_lzw[code] is not None:
            entry = table_lzw[code]
        elif code == len(table_lzw) and prev is not None:
            entry = prev + (prev[0],)           # the KwKwK case
        else:
            raise ValueError("GIF: bad LZW code")
        out.extend(entry)
        if prev is not None:
            table_lzw.append(prev + (entry[0],))
            if len(table_lzw) == (1 << width) and width < 12:
                width += 1
        prev = entry
    px = np.array(out, dtype=np.uint8)
    if px.size != iw * ih:
        raise ValueError("GIF: pixel count mismatch")
    return table[px.reshape(ih, iw)]

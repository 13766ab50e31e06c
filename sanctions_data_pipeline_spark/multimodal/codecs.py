"""Vendored minimal codecs for the real multimodal paths, pure
stdlib + numpy — used when PIL/pyav are absent from the image.

Formats implemented from their public specifications:

- PNG (W3C PNG spec / RFC 2083): 8-bit depth, color types 0 (gray),
  2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced; all five scanline
  filters (None/Sub/Up/Average/Paeth). Decode to a grayscale raster
  (ITU-R 601-2 integer luma, the same formula PIL's convert("L") uses)
  and encode gray rasters back (filter 0 + zlib).
- WAV (RIFF/WAVE): chunk walk to ``fmt `` + ``data``, 16-bit PCM,
  first channel.
- YUV4MPEG2 (.y4m, the mjpegtools uncompressed video interchange
  format): ASCII header ``YUV4MPEG2 W.. H..``, then ``FRAME\\n`` +
  planar 4:2:0 payloads; frames decode to their luma plane.

These are real, spec-conformant decoders for real files of their
formats — not byte-deterministic fakes; fixtures in the tests are
produced independently (encode side or hand-assembled containers) and
round-tripped.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(buf: bytes) -> str | None:
    """Best-effort container detection by magic."""
    b = bytes(buf[:16])
    if b.startswith(PNG_SIG):
        return "png"
    if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
        return "wav"
    if b.startswith(b"YUV4MPEG2 "):
        return "y4m"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(buf: bytes) -> tuple[int, int, np.ndarray]:
    """PNG bytes -> (width, height, uint8 grayscale array h*w).

    Raises ValueError on malformed/unsupported streams (16-bit,
    palette, interlaced)."""
    buf = bytes(buf)
    if not buf.startswith(PNG_SIG):
        raise ValueError("not a PNG stream")
    pos, idat, ihdr = len(PNG_SIG), [], None
    while pos + 8 <= len(buf):
        (length,), ctype = struct.unpack(">I", buf[pos:pos + 4]), buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_v, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype_v not in _CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth}, color={ctype_v}, "
                         f"interlace={interlace})")
    ch = _CHANNELS[ctype_v]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=row_start + 1).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - ch]) if i >= ch else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = int(line[i - ch]) if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                line[i] = (line[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    px = out.reshape(h, w, ch)
    if ctype_v == 0:
        gray = px[:, :, 0]
    elif ctype_v == 4:
        gray = px[:, :, 0]  # gray + alpha: luma is the gray channel
    else:  # RGB / RGBA -> ITU-R 601-2 integer luma (PIL convert("L"))
        r = px[:, :, 0].astype(np.uint32)
        g = px[:, :, 1].astype(np.uint32)
        b = px[:, :, 2].astype(np.uint32)
        gray = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
    return w, h, gray


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png_gray(gray: np.ndarray) -> bytes:
    """uint8 grayscale array (h, w) -> PNG bytes (color type 0,
    filter 0 scanlines)."""
    a = np.asarray(gray, dtype=np.uint8)
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def decode_wav_pcm(buf: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, int16 mono samples: first channel)."""
    buf = bytes(buf)
    if sniff(buf) != "wav":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (clen,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body = buf[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            _fmt, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH",
                                                             body[:16])
        elif cid == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    pcm = np.frombuffer(data[:(len(data) // (2 * n_ch)) * 2 * n_ch],
                        dtype="<i2").reshape(-1, n_ch)
    return rate, pcm[:, 0].copy()


def parse_y4m(buf: bytes) -> tuple[int, int, list[int]]:
    """Y4M bytes -> (width, height, frame offsets of each luma plane)."""
    buf = bytes(buf)
    if sniff(buf) != "y4m":
        raise ValueError("not a YUV4MPEG2 stream")
    nl = buf.index(b"\n")
    w = h = None
    cspace = b"420"  # Y4M default when no C token present
    for tok in buf[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cspace = tok[1:]
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    # size the chroma planes from the colorspace token — assuming 4:2:0
    # for a C422/C444 stream would land the frame walk mid-payload
    if cspace.startswith(b"420"):
        frame_len = w * h + 2 * ((w // 2) * (h // 2))
    elif cspace.startswith(b"422"):
        frame_len = w * h + 2 * ((w // 2) * h)
    elif cspace.startswith(b"444"):
        frame_len = 3 * w * h
    elif cspace.startswith(b"mono"):
        frame_len = w * h
    else:
        raise ValueError(f"unsupported Y4M colorspace {cspace!r}")
    offsets, pos = [], nl + 1
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if buf[pos:pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        offsets.append(fnl + 1)
        pos = fnl + 1 + frame_len
    return w, h, offsets


def y4m_luma(buf: bytes, offset: int, w: int, h: int) -> np.ndarray:
    return np.frombuffer(bytes(buf), dtype=np.uint8, count=w * h,
                         offset=offset).reshape(h, w).copy()


def encode_y4m(frames: list[np.ndarray]) -> bytes:
    """Gray frames (h, w) -> Y4M bytes (U/V planes neutral 128)."""
    h, w = frames[0].shape
    uv = np.full(((h // 2) * (w // 2)), 128, dtype=np.uint8).tobytes()
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
    for f in frames:
        out.append(b"FRAME\n" + np.asarray(f, np.uint8).tobytes() + uv + uv)
    return b"".join(out)

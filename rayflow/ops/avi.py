"""Motion-JPEG AVI container codec, pure stdlib, from the public
RIFF/AVI spec (Microsoft "AVI RIFF File Reference").

Retires the last stubbed media format in the multimodal plane: video.
An AVI file is a RIFF tree — ``LIST hdrl`` (``avih`` main header +
one ``LIST strl`` per stream with ``strh``/``strf``) followed by
``LIST movi`` whose ``00dc``/``00db`` chunks each hold one frame.
Five public-spec codecs, all decoded in numpy/stdlib: MJPG (per-frame
baseline/progressive T.81 JPEG via :mod:`rayflow.ops.jpeg`),
uncompressed DIB (BI_RGB 8/24/32-bit), BI_RLE8 (the BMP/AVI RLE8
spec), and raw YUV — packed 4:2:2 ``YUY2`` and planar 4:2:0
``I420``/``IYUV``, BT.601 limited-range.  Scope: single video stream,
no interleaved audio, optional ``idx1`` index (written, and ignored on
read — frames are recovered by walking ``movi`` directly, which also
survives a truncated index).  Compressed inter-frame codecs (h264
etc.) raise ``NotImplementedError`` at the same per-payload plug point
as the other codecs (``fallback_pseudo`` keeps pipelines flowing).

All RIFF values are little-endian; chunks are word-aligned (one pad
byte after odd-sized bodies).
"""

from __future__ import annotations

import struct

import numpy as np

from rayflow.ops.jpeg import decode_jpeg, synth_jpeg


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run."""
    while pos + 8 <= end:
        fcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _decode_dib_frame(data: bytes, w: int, h: int,
                      bits: int) -> np.ndarray:
    """One uncompressed BI_RGB frame (``00db``) → (h, w, 3) uint8 RGB.
    DIB rows are bottom-up, BGR(X), padded to 4-byte boundaries —
    identical to BMP pixel data without the file header."""
    bpp = bits // 8
    row_bytes = (w * bpp + 3) // 4 * 4
    rows = np.frombuffer(data, np.uint8)
    if len(rows) < row_bytes * h:
        raise ValueError("avi: short DIB frame")
    rows = rows[: row_bytes * h].reshape(h, row_bytes)[::-1]
    if bits == 8:                         # grayscale palette convention
        g = rows[:, :w]
        return np.repeat(g[:, :, None], 3, axis=2)
    px = rows[:, : w * bpp].reshape(h, w, bpp)
    return px[:, :, 2::-1]                # BGR(X) → RGB, alpha dropped


def _decode_rle8_frame(data: bytes, w: int, h: int) -> np.ndarray:
    """One BI_RLE8 frame (``biCompression == 1``, public BMP/AVI RLE8
    spec) → (h, w, 3) uint8.  Encoded bottom-up like all DIBs; pairs
    are (count, value); count 0 escapes: 0=end-of-line, 1=end-of-
    bitmap, 2=delta(dx,dy), n≥3 = n absolute bytes (word-padded).
    8-bit palette = grayscale convention, same as the DIB path."""
    img = np.zeros((h, w), np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 2 <= n and y < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:
            run = min(cnt, w - x)
            img[y, x:x + run] = val
            x += cnt
        elif val == 0:                      # end of line
            y += 1
            x = 0
        elif val == 1:                      # end of bitmap
            break
        elif val == 2:                      # delta jump
            if i + 2 > n:
                break
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                               # absolute mode: val literals
            k = min(val, n - i, w - x)
            img[y, x:x + k] = np.frombuffer(data[i:i + k], np.uint8)
            x += val
            i += val + (val & 1)
    g = img[::-1]                           # bottom-up → top-down
    return np.repeat(g[:, :, None], 3, axis=2)


def _encode_rle8_frame(g: np.ndarray) -> bytes:
    """Grayscale (h, w) uint8 → BI_RLE8 bytes (run pairs + EOL/EOD),
    bottom-up; exact inverse of :func:`_decode_rle8_frame`."""
    out = bytearray()
    for row in g[::-1]:
        # run-length boundaries, vectorized
        idx = np.flatnonzero(np.diff(row)) + 1
        starts = np.concatenate(([0], idx))
        ends = np.concatenate((idx, [len(row)]))
        for s, e in zip(starts.tolist(), ends.tolist()):
            v = int(row[s])
            left = e - s
            while left > 0:
                run = min(left, 255)
                out += bytes((run, v))
                left -= run
        out += b"\x00\x00"                  # end of line
    out += b"\x00\x01"                      # end of bitmap
    return bytes(out)


# BT.601 limited-range YCbCr <-> RGB (the public YUY2/I420 convention)
def _ycbcr_to_rgb(yp: np.ndarray, cb: np.ndarray,
                  cr: np.ndarray) -> np.ndarray:
    c = (yp.astype(np.float32) - 16.0) * (255.0 / 219.0)
    d = cb.astype(np.float32) - 128.0
    e = cr.astype(np.float32) - 128.0
    r = c + 1.596027 * e
    g = c - 0.391762 * d - 0.812968 * e
    b = c + 2.017232 * d
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255) \
        .round().astype(np.uint8)


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                           np.ndarray]:
    f = px.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    yp = 16.0 + (65.481 * r + 128.553 * g + 24.966 * b) / 255.0
    cb = 128.0 + (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0
    cr = 128.0 + (112.0 * r - 93.786 * g - 18.214 * b) / 255.0
    clip = lambda a: np.clip(a, 0, 255).round().astype(np.uint8)  # noqa: E731
    return clip(yp), clip(cb), clip(cr)


def _decode_yuy2_frame(data: bytes, w: int, h: int) -> np.ndarray:
    """One packed-4:2:2 YUY2 frame (Y0 U Y1 V per pixel pair, stored
    top-down by convention) → (h, w, 3) uint8 RGB, BT.601."""
    buf = np.frombuffer(data, np.uint8)
    if len(buf) < w * h * 2:
        raise ValueError("avi: short YUY2 frame")
    buf = buf[: w * h * 2].reshape(h, w * 2)
    yp = buf[:, 0::2]
    cb = np.repeat(buf[:, 1::4], 2, axis=1)[:, :w]
    cr = np.repeat(buf[:, 3::4], 2, axis=1)[:, :w]
    return _ycbcr_to_rgb(yp, cb, cr)


def _encode_yuy2_frame(px: np.ndarray) -> bytes:
    yp, cb, cr = _rgb_to_ycbcr(px)
    h, w = yp.shape
    # chroma: average each horizontal pair (4:2:2)
    cb2 = ((cb[:, 0::2].astype(np.uint16) + cb[:, 1::2]) // 2).astype(np.uint8)
    cr2 = ((cr[:, 0::2].astype(np.uint16) + cr[:, 1::2]) // 2).astype(np.uint8)
    out = np.empty((h, w * 2), np.uint8)
    out[:, 0::2] = yp
    out[:, 1::4] = cb2
    out[:, 3::4] = cr2
    return out.tobytes()


def _decode_i420_frame(data: bytes, w: int, h: int) -> np.ndarray:
    """One planar 4:2:0 I420/IYUV frame (Y plane, then w/2×h/2 U and V
    planes, top-down) → (h, w, 3) uint8 RGB, BT.601."""
    buf = np.frombuffer(data, np.uint8)
    need = w * h + 2 * ((w // 2) * (h // 2))
    if len(buf) < need:
        raise ValueError("avi: short I420 frame")
    yp = buf[: w * h].reshape(h, w)
    half = (w // 2) * (h // 2)
    up = buf[w * h: w * h + half].reshape(h // 2, w // 2)
    vp = buf[w * h + half: need].reshape(h // 2, w // 2)
    cb = np.repeat(np.repeat(up, 2, axis=0), 2, axis=1)[:h, :w]
    cr = np.repeat(np.repeat(vp, 2, axis=0), 2, axis=1)[:h, :w]
    return _ycbcr_to_rgb(yp, cb, cr)


def _encode_i420_frame(px: np.ndarray) -> bytes:
    yp, cb, cr = _rgb_to_ycbcr(px)
    h, w = yp.shape
    # 2×2 box-average chroma
    sub = lambda c: ((c[0::2, 0::2].astype(np.uint16) + c[0::2, 1::2]  # noqa: E731
                      + c[1::2, 0::2] + c[1::2, 1::2]) // 4).astype(np.uint8)
    return yp.tobytes() + sub(cb).tobytes() + sub(cr).tobytes()


_YUV_FOURCC = {b"YUY2": _decode_yuy2_frame, b"yuy2": _decode_yuy2_frame,
               b"I420": _decode_i420_frame, b"IYUV": _decode_i420_frame,
               b"i420": _decode_i420_frame}


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    """AVI bytes → (frames, fps): each frame an (H, W, C) uint8 array.

    Walks the RIFF tree for the ``avih`` header (frame timing), the
    video stream's ``strh``/``strf`` (codec dispatch), and the
    ``movi`` list.  Five real codecs: MJPG (per-frame T.81 JPEG),
    uncompressed DIB (``biCompression == 0``, 8/24/32-bit), BI_RLE8
    (``biCompression == 1``), and raw packed/planar YUV
    (``YUY2``/``I420``/``IYUV`` fourcc, BT.601).  Anything else raises
    ``NotImplementedError`` at the library plug point.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("avi: missing RIFF/AVI signature")
    usec_per_frame = 0
    handler = b""
    strf: tuple[int, int, int, int] | None = None   # (w, h, bits, compr)
    frames: list[np.ndarray] = []
    for fcc, body, size in _chunks(payload, 12, len(payload)):
        if fcc != b"LIST":
            continue
        kind = payload[body:body + 4]
        if kind == b"hdrl":
            for f2, b2, s2 in _chunks(payload, body + 4, body + size):
                if f2 == b"avih":
                    (usec_per_frame,) = struct.unpack_from(
                        "<I", payload, b2)
                elif f2 == b"LIST" and payload[b2:b2 + 4] == b"strl":
                    in_vids = False
                    for f3, b3, s3 in _chunks(payload, b2 + 4, b2 + s2):
                        if f3 == b"strh" and \
                                payload[b3:b3 + 4] == b"vids":
                            handler = payload[b3 + 4:b3 + 8]
                            in_vids = True
                        elif f3 == b"strf" and in_vids and s3 >= 20:
                            _sz, fw, fh = struct.unpack_from(
                                "<Iii", payload, b3)
                            fbits, = struct.unpack_from("<H", payload,
                                                        b3 + 14)
                            compr, = struct.unpack_from("<I", payload,
                                                        b3 + 16)
                            strf = (fw, abs(fh), fbits, compr)
        elif kind == b"movi":
            mjpg = handler in (b"MJPG", b"mjpg") or \
                (strf is not None
                 and strf[3] == struct.unpack("<I", b"MJPG")[0]) or \
                (strf is None
                 and handler in (b"\x00\x00\x00\x00", b""))   # headerless
            dib = strf is not None and strf[3] == 0 \
                and strf[2] in (8, 24, 32)
            rle8 = strf is not None and strf[3] == 1
            compr_fcc = struct.pack("<I", strf[3]) if strf else b""
            yuv = _YUV_FOURCC.get(compr_fcc) or _YUV_FOURCC.get(handler)
            if not mjpg and not dib and not rle8 and yuv is None:
                raise NotImplementedError(
                    f"avi: MJPG / DIB / RLE8 / YUY2 / I420 decode "
                    f"without a codec library (stream handler "
                    f"{handler!r}, strf {strf!r})")
            for f2, b2, s2 in _chunks(payload, body + 4, body + size):
                if f2[2:4] in (b"dc", b"db"):
                    data = payload[b2:b2 + s2]
                    if mjpg:
                        frames.append(decode_jpeg(data))
                    elif rle8:
                        w, h, _bits, _c = strf
                        frames.append(_decode_rle8_frame(data, w, h))
                    elif yuv is not None:
                        w, h, _bits, _c = strf
                        frames.append(yuv(data, w, h))
                    else:
                        w, h, bits, _c = strf
                        frames.append(_decode_dib_frame(data, w, h, bits))
    if not frames:
        raise ValueError("avi: no video frames found")
    fps = 1e6 / usec_per_frame if usec_per_frame else 25.0
    return frames, fps


def probe_avi(payload: bytes) -> tuple[int, int, int] | None:
    """Header-only probe → (width, height, n_frames) from ``avih``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        return None
    for fcc, body, size in _chunks(payload, 12, len(payload)):
        if fcc == b"LIST" and payload[body:body + 4] == b"hdrl":
            for f2, b2, s2 in _chunks(payload, body + 4, body + size):
                if f2 == b"avih" and s2 >= 40:
                    vals = struct.unpack_from("<10I", payload, b2)
                    return (vals[8], vals[9], vals[4])
    return (0, 0, 0)


def synth_avi(frames: list[np.ndarray], fps: float = 10.0,
              quality: int = 90, codec: str = "MJPG") -> bytes:
    """Encode uint8 RGB/gray frames as an AVI (the exact inverse of
    :func:`decode_avi`) — header tree, ``movi`` chunks, ``idx1``.
    ``codec="MJPG"`` writes per-frame JPEG payloads; ``codec="DIB"``
    writes uncompressed BI_RGB 24-bit frames (bottom-up padded BGR),
    which round-trip bit-exactly; ``codec="RLE8"`` writes BI_RLE8
    grayscale runs (bit-exact for gray frames; RGB is channel-averaged
    first); ``codec="YUY2"`` / ``codec="I420"`` write raw BT.601
    packed-4:2:2 / planar-4:2:0 YUV (lossy by chroma subsampling,
    like every real YUV pipeline)."""
    if not frames:
        raise ValueError("synth_avi: need at least one frame")
    if codec not in ("MJPG", "DIB", "RLE8", "YUY2", "I420"):
        raise ValueError("synth_avi: codec must be MJPG, DIB, RLE8, "
                         "YUY2 or I420")
    h, w = frames[0].shape[:2]

    def as_rgb(f: np.ndarray) -> np.ndarray:
        return np.repeat(f[:, :, None], 3, axis=2) if f.ndim == 2 else f

    if codec == "DIB":
        row_bytes = (w * 3 + 3) // 4 * 4
        jpegs = []
        for f in frames:
            f = as_rgb(f)
            rows = np.zeros((h, row_bytes), np.uint8)
            rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
            jpegs.append(rows.tobytes())
    elif codec == "RLE8":
        jpegs = [_encode_rle8_frame(
            f if f.ndim == 2
            else (f.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8))
            for f in frames]
    elif codec == "YUY2":
        jpegs = [_encode_yuy2_frame(as_rgb(f)) for f in frames]
    elif codec == "I420":
        jpegs = [_encode_i420_frame(as_rgb(f)) for f in frames]
    else:
        jpegs = [synth_jpeg(f, quality=quality) for f in frames]

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = int(round(1e6 / fps))
    maxbuf = max(len(j) for j in jpegs)
    avih = struct.pack("<14I", usec, maxbuf * int(fps), 0, 0x10,
                       len(frames), 0, 1, maxbuf, w, h, 0, 0, 0, 0)
    # dwFlags wPrio wLang dwInitialFrames dwScale dwRate dwStart
    # dwLength dwSuggestedBufferSize dwQuality dwSampleSize + rcFrame
    _meta = {                       # codec → (handler, biCompression,
        "MJPG": (b"MJPG", struct.unpack("<I", b"MJPG")[0], b"00dc", 24),
        "DIB": (b"DIB ", 0, b"00db", 24),          # chunk id, biBitCount)
        "RLE8": (b"MRLE", 1, b"00dc", 8),
        "YUY2": (b"YUY2", struct.unpack("<I", b"YUY2")[0], b"00db", 16),
        "I420": (b"I420", struct.unpack("<I", b"I420")[0], b"00db", 12),
    }
    fourcc, compr, ckid, bits = _meta[codec]
    strh = (b"vids" + fourcc
            + struct.pack("<I2H8I", 0, 0, 0, 0, 1, int(round(fps)),
                          0, len(frames), maxbuf, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, bits, compr,
                       w * h * bits // 8, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(ckid, j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame — offset is relative to the 'movi' fourcc
    idx = bytearray()
    off = 4
    for j in jpegs:
        idx += ckid + struct.pack("<3I", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body

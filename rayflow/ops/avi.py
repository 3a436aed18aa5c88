"""Motion-JPEG AVI container codec, pure stdlib, from the public
RIFF/AVI spec (Microsoft "AVI RIFF File Reference").

Retires the last stubbed media format in the multimodal plane: video.
An AVI file is a RIFF tree — ``LIST hdrl`` (``avih`` main header +
one ``LIST strl`` per stream with ``strh``/``strf``) followed by
``LIST movi`` whose ``00dc`` chunks each hold one complete baseline
JPEG, decoded by :mod:`rayflow.ops.jpeg`.  Scope: single MJPG video
stream, no interleaved audio, optional ``idx1`` index (written, and
ignored on read — frames are recovered by walking ``movi`` directly,
which also survives a truncated index).  Anything not MJPG raises
``NotImplementedError`` at the same per-payload plug point as the
other codecs (``fallback_pseudo`` keeps pipelines flowing).

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


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    """AVI bytes → (frames, fps): each frame an (H, W, C) uint8 array.

    Walks the RIFF tree for the ``avih`` header (frame timing), the
    video stream's ``strh``/``strf`` (codec dispatch), and the
    ``movi`` list.  Two real codecs: MJPG (per-frame T.81 JPEG) and
    uncompressed DIB (``biCompression == 0``, 8/24/32-bit).  Anything
    else raises ``NotImplementedError`` at the library plug point.
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
            if not mjpg and not dib:
                raise NotImplementedError(
                    f"avi: MJPG and uncompressed DIB decode without a "
                    f"codec library (stream handler {handler!r}, "
                    f"strf {strf!r})")
            for f2, b2, s2 in _chunks(payload, body + 4, body + size):
                if f2[2:4] in (b"dc", b"db"):
                    data = payload[b2:b2 + s2]
                    if mjpg:
                        frames.append(decode_jpeg(data))
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
    which round-trip bit-exactly."""
    if not frames:
        raise ValueError("synth_avi: need at least one frame")
    if codec not in ("MJPG", "DIB"):
        raise ValueError("synth_avi: codec must be MJPG or DIB")
    h, w = frames[0].shape[:2]
    if codec == "DIB":
        row_bytes = (w * 3 + 3) // 4 * 4
        jpegs = []
        for f in frames:
            if f.ndim == 2:
                f = np.repeat(f[:, :, None], 3, axis=2)
            rows = np.zeros((h, row_bytes), np.uint8)
            rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
            jpegs.append(rows.tobytes())
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
    fourcc = b"MJPG" if codec == "MJPG" else b"DIB "
    compr = struct.unpack("<I", b"MJPG")[0] if codec == "MJPG" else 0
    ckid = b"00dc" if codec == "MJPG" else b"00db"
    strh = (b"vids" + fourcc
            + struct.pack("<I2H8I", 0, 0, 0, 0, 1, int(round(fps)),
                          0, len(frames), maxbuf, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, compr,
                       w * h * 3, 0, 0, 0, 0)
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

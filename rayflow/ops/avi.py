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


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    """AVI bytes → (frames, fps): each frame an (H, W, C) uint8 array.

    Walks the RIFF tree for the ``avih`` header (frame timing) and the
    ``movi`` list, decoding every ``00dc``/``00db`` chunk as a JPEG.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("avi: missing RIFF/AVI signature")
    usec_per_frame = 0
    handler = b""
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
                    for f3, b3, s3 in _chunks(payload, b2 + 4, b2 + s2):
                        if f3 == b"strh" and \
                                payload[b3:b3 + 4] == b"vids":
                            handler = payload[b3 + 4:b3 + 8]
        elif kind == b"movi":
            if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00", b""):
                raise NotImplementedError(
                    f"avi: only MJPG video decodes without a codec "
                    f"library (stream handler {handler!r})")
            for f2, b2, s2 in _chunks(payload, body + 4, body + size):
                if f2[2:4] in (b"dc", b"db"):
                    frames.append(decode_jpeg(payload[b2:b2 + s2]))
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
              quality: int = 90) -> bytes:
    """Encode uint8 RGB/gray frames as an MJPEG AVI (the exact inverse
    of :func:`decode_avi`) — header tree, ``movi`` chunks of
    :func:`rayflow.ops.jpeg.synth_jpeg` payloads, and an ``idx1``."""
    if not frames:
        raise ValueError("synth_avi: need at least one frame")
    h, w = frames[0].shape[:2]
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
    strh = (b"vids" + b"MJPG"
            + struct.pack("<I2H8I", 0, 0, 0, 0, 1, int(round(fps)),
                          0, len(frames), maxbuf, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24,
                       struct.unpack("<I", b"MJPG")[0],
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame — offset is relative to the 'movi' fourcc
    idx = bytearray()
    off = 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<3I", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body

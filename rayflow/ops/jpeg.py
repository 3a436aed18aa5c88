"""JPEG codec, pure numpy/stdlib, from the public ITU-T T.81 spec.

Closes the last stubbed image format in the multimodal plane
(``rayflow/ops/multimodal.py`` — the reference treats media as opaque
payloads; our `media_decode` featurizes real pixels).  Scope: baseline
sequential DCT (SOF0/SOF1) AND progressive DCT (SOF2 — spectral
selection, successive approximation, interleaved DC scans,
non-interleaved AC scans, EOB runs, refinement passes per T.81 §G),
8-bit, grayscale or YCbCr with any h/v sampling factors (4:4:4 /
4:2:2 / 4:2:0 …), restart markers, JFIF YCbCr↔RGB.  Arithmetic
coding, lossless and 12-bit raise ``NotImplementedError`` at the plug
point, matching the other codecs.

The entropy decode walks bits in Python — this is per-payload boundary
code (same as PNG's filter loop); the DCT/color math over all blocks of
an image is one vectorized einsum.  The encoder (``synth_jpeg``) exists
so tests can round-trip without any image library: it builds optimal
canonical Huffman tables per image (length-limited to 16 bits via the
Annex K.3 adjustment) rather than embedding the spec's typical tables.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: diagonal s = i+j; odd diagonals run i-ascending,
# even run j-ascending (T.81 figure 5)
ZIGZAG = sorted(
    ((i, j) for i in range(8) for j in range(8)),
    key=lambda t: (t[0] + t[1],
                   t[0] if (t[0] + t[1]) % 2 else t[1]))
_ZZ_ROWS = np.array([i for i, _ in ZIGZAG])
_ZZ_COLS = np.array([j for _, j in ZIGZAG])

# orthonormal 8-point DCT-II basis: spatial = A.T @ coeff @ A
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8))

# Annex K typical quantization tables (quality 50 reference)
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a reference table (public
    convention: 50 → as-is, 100 → all ones)."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255)


# ---------------------------------------------------------------------------
# Bit I/O + Huffman
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0          # bit position

    def bit(self) -> int:
        byte = self.d[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_map(counts: list[int], symbols: list[int]) -> dict:
    """DHT (counts per length 1..16, symbols in canonical order) →
    {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_read(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: t-bit magnitude → signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, C) uint8 pixels (C=1 grayscale, C=3 RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI marker")
    p = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    prog_state = None
    while p < len(payload):
        if payload[p] != 0xFF:
            raise ValueError(f"jpeg: expected marker at byte {p}")
        marker = payload[p + 1]
        p += 2
        if marker == 0xD9:                          # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue                                # bare markers
        (seglen,) = struct.unpack_from(">H", payload, p)
        body = payload[p + 2:p + seglen]
        p += seglen
        if marker == 0xDB:                          # DQT
            q = 0
            while q < len(body):
                pq, tq = body[q] >> 4, body[q] & 0x0F
                q += 1
                if pq:
                    vals = np.frombuffer(
                        body[q:q + 128], dtype=">u2").astype(np.int64)
                    q += 128
                else:
                    vals = np.frombuffer(
                        body[q:q + 64], dtype=np.uint8).astype(np.int64)
                    q += 64
                tbl = np.zeros((8, 8), np.int64)
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                qtables[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):          # SOF0/1 + progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "prog": marker == 0xC2}
            if frame["prog"]:
                prog_state = _prog_init(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only Huffman sequential (SOF0/SOF1) and "
                "progressive (SOF2) are implemented — arithmetic/"
                "lossless payloads need a codec library "
                "(fallback_pseudo keeps pipelines flowing)")
        elif marker == 0xC4:                        # DHT
            q = 0
            while q < len(body):
                tc, th = body[q] >> 4, body[q] & 0x0F
                counts = list(body[q + 1:q + 17])
                n = sum(counts)
                symbols = list(body[q + 17:q + 17 + n])
                htables[(tc, th)] = _huff_decode_map(counts, symbols)
                q += 17 + n
        elif marker == 0xDD:                        # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                        # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = struct.unpack_from(">BB", body, 1 + 2 * i)
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            ss, se, ahal = struct.unpack_from(">BBB", body, 1 + 2 * ns)
            data, p = _entropy_segments(payload, p)
            if not frame["prog"]:
                return _decode_scan(frame, scan, qtables, htables,
                                    restart_interval, data)
            _prog_scan(frame, prog_state, scan, htables,
                       ss, se, ahal >> 4, ahal & 0x0F,
                       restart_interval, data)
        # else: APPn / COM — skipped
    if frame is not None and frame.get("prog"):
        return _prog_finish(frame, prog_state, qtables)
    raise ValueError("jpeg: no scan data found")


def _entropy_segments(payload: bytes, p: int) -> tuple[list[bytes], int]:
    """Destuff the entropy-coded stream from ``p``; split at restart
    markers.  Returns (segments, position after the stream)."""
    segs: list[bytes] = []
    cur = bytearray()
    while p < len(payload):
        b = payload[p]
        if b != 0xFF:
            cur.append(b)
            p += 1
            continue
        m = payload[p + 1]
        if m == 0x00:                               # stuffed FF
            cur.append(0xFF)
            p += 2
        elif 0xD0 <= m <= 0xD7:                     # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            p += 2
        else:                                       # next real marker
            break
    segs.append(bytes(cur))
    return segs, p


def _decode_scan(frame, scan, qtables, htables, restart_interval,
                 segments) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if len(scan) == 1:
        hmax = vmax = scan[0][0]["h"] = scan[0][0]["v"] = 1
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    # per-component coefficient planes in block units
    planes = {}
    for comp, _, _ in scan:
        bw, bh = mcus_x * comp["h"], mcus_y * comp["v"]
        planes[comp["id"]] = np.zeros((bh * bw, 64), np.int64)
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    mcu = 0
    for seg in segments:
        if not seg:
            continue
        r = _BitReader(seg)
        for c in pred:
            pred[c] = 0                             # restart resets DC
        end = min(n_mcus, mcu + restart_interval) \
            if restart_interval else n_mcus
        while mcu < end:
            my, mx = divmod(mcu, mcus_x)
            for comp, tdc, tac in scan:
                dc_tbl = htables[(0, tdc)]
                ac_tbl = htables[(1, tac)]
                bw = mcus_x * comp["h"]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = _decode_block(r, dc_tbl, ac_tbl)
                        coeffs[0] += pred[comp["id"]]
                        pred[comp["id"]] = coeffs[0]
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        planes[comp["id"]][row * bw + col] = coeffs
            mcu += 1
    # dequantize + IDCT all blocks per component at once
    spatial = {}
    for comp, _, _ in scan:
        zz = planes[comp["id"]] * \
            qtables[comp["tq"]][_ZZ_ROWS, _ZZ_COLS][None, :]
        blocks = np.zeros((zz.shape[0], 8, 8))
        blocks[:, _ZZ_ROWS, _ZZ_COLS] = zz
        px = np.einsum("ka,nkl,lb->nab", _A, blocks, _A) + 128.0
        bw = mcus_x * comp["h"]
        bh = mcus_y * comp["v"]
        img = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        # upsample to full MCU-grid resolution, then crop
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        spatial[comp["id"]] = img[:h, :w]
    if len(scan) == 1:
        g = np.clip(spatial[scan[0][0]["id"]], 0, 255)
        return np.round(g).astype(np.uint8)[..., None]
    y, cb, cr = (spatial[c["id"]] for c, _, _ in scan)
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.round(np.clip(rgb, 0, 255)).astype(np.uint8)


def _decode_block(r: _BitReader, dc_tbl: dict, ac_tbl: dict) -> np.ndarray:
    coeffs = np.zeros(64, np.int64)
    t = _huff_read(r, dc_tbl)
    coeffs[0] = _extend(r.bits(t), t)
    k = 1
    while k < 64:
        rs = _huff_read(r, ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if rs == 0x00:                              # EOB
            break
        if rs == 0xF0:                              # ZRL: 16 zeros
            k += 16
            continue
        k += run
        if k > 63:
            raise ValueError("jpeg: AC run past end of block")
        coeffs[k] = _extend(r.bits(size), size)
        k += 1
    return coeffs


# ---------------------------------------------------------------------------
# Progressive decoding (T.81 §G.2) — coefficients accumulate across
# scans into per-component planes; dequant + IDCT happen once at EOI.
# ---------------------------------------------------------------------------


def _prog_init(frame) -> dict:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    st = {"mcus_x": mcus_x, "mcus_y": mcus_y,
          "hmax": hmax, "vmax": vmax, "planes": {}, "dims": {}}
    for c in comps:
        bw_pad, bh_pad = mcus_x * c["h"], mcus_y * c["v"]
        # ACTUAL data-unit grid for non-interleaved scans (T.81 A.2.2):
        # ceil over the component's own sample dimensions, not the
        # MCU-padded grid
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        st["planes"][c["id"]] = np.zeros((bh_pad * bw_pad, 64), np.int64)
        st["dims"][c["id"]] = (bw_pad, -(-cw // 8), -(-ch // 8))
    return st


def _prog_dc_scan(st, scan, htables, al, refine, restart_interval,
                  segments):
    mcus_x, mcus_y = st["mcus_x"], st["mcus_y"]
    if len(scan) == 1:
        comp = scan[0][0]
        bw_pad, bw_act, bh_act = st["dims"][comp["id"]]
        units = [(comp, row * bw_pad + col, scan[0][1])
                 for row in range(bh_act) for col in range(bw_act)]
    else:
        units = []
        for m in range(mcus_x * mcus_y):
            my, mx = divmod(m, mcus_x)
            for comp, tdc, _ in scan:
                bw_pad = st["dims"][comp["id"]][0]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        units.append((comp, row * bw_pad + col, tdc))
        # an interleaved "unit" for restart purposes is a whole MCU
        per_mcu = sum(c["h"] * c["v"] for c, _, _ in scan)
    planes = st["planes"]
    u = 0
    for seg in segments:
        if not seg:
            continue
        r = _BitReader(seg)
        pred = {c["id"]: 0 for c, _, _ in scan}
        if restart_interval:
            end = u + restart_interval * (per_mcu if len(scan) > 1 else 1)
            end = min(end, len(units))
        else:
            end = len(units)
        while u < end:
            comp, bidx, tdc = units[u]
            blk = planes[comp["id"]]
            if refine:
                blk[bidx, 0] |= r.bit() << al
            else:
                t = _huff_read(r, htables[(0, tdc)])
                pred[comp["id"]] += _extend(r.bits(t), t)
                blk[bidx, 0] = pred[comp["id"]] << al
            u += 1


def _prog_ac_first_block(r, blk, ss, se, al, ac_tbl, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_read(r, ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:                           # ZRL
                k += 16
                continue
            eobrun = 1 << run
            if run:
                eobrun += r.bits(run)
            return eobrun - 1                       # run covers this block
        k += run
        if k > se:
            raise ValueError("jpeg: AC run past spectral band")
        blk[k] = _extend(r.bits(size), size) << al
        k += 1
    return 0


def _prog_ac_refine_block(r, blk, ss, se, al, ac_tbl, eobrun) -> int:
    """T.81 G.1.2.3 / correction-bit pass (mirrors the public libjpeg
    decode_mcu_AC_refine control flow)."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_read(r, ac_tbl)
            run, size = rs >> 4, rs & 0x0F
            newval = 0
            if size == 0:
                if run < 15:                        # EOBn
                    eobrun = 1 << run
                    if run:
                        eobrun += r.bits(run)
                    break
                # run == 15: ZRL — skip 16 zero-history coefficients
            else:
                newval = p1 if r.bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if r.bit() and (abs(v) & p1) == 0:
                        blk[k] = v + (p1 if v > 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:                              # EOB-run corrections
            v = int(blk[k])
            if v != 0 and r.bit() and (abs(v) & p1) == 0:
                blk[k] = v + (p1 if v > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _prog_scan(frame, st, scan, htables, ss, se, ah, al,
               restart_interval, segments):
    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: DC scan must have Se=0")
        _prog_dc_scan(st, scan, htables, al, ah > 0,
                      restart_interval, segments)
        return
    if len(scan) != 1:
        raise ValueError("jpeg: AC scans are single-component")
    comp, _, tac = scan[0]
    blk_fn = _prog_ac_refine_block if ah > 0 else _prog_ac_first_block
    ac_tbl = htables[(1, tac)]
    bw_pad, bw_act, bh_act = st["dims"][comp["id"]]
    plane = st["planes"][comp["id"]]
    idxs = [row * bw_pad + col
            for row in range(bh_act) for col in range(bw_act)]
    u = 0
    for seg in segments:
        if not seg:
            continue
        r = _BitReader(seg)
        eobrun = 0                                  # restart resets EOBRUN
        end = min(u + restart_interval, len(idxs)) \
            if restart_interval else len(idxs)
        while u < end:
            eobrun = blk_fn(r, plane[idxs[u]], ss, se, al, ac_tbl, eobrun)
            u += 1


def _prog_finish(frame, st, qtables) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax, vmax = st["hmax"], st["vmax"]
    mcus_x, mcus_y = st["mcus_x"], st["mcus_y"]
    spatial = {}
    for comp in frame["comps"]:
        zz = st["planes"][comp["id"]] * \
            qtables[comp["tq"]][_ZZ_ROWS, _ZZ_COLS][None, :]
        blocks = np.zeros((zz.shape[0], 8, 8))
        blocks[:, _ZZ_ROWS, _ZZ_COLS] = zz
        px = np.einsum("ka,nkl,lb->nab", _A, blocks, _A) + 128.0
        bw = mcus_x * comp["h"]
        bh = mcus_y * comp["v"]
        img = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        spatial[comp["id"]] = img[:h, :w]
    if len(frame["comps"]) == 1:
        g = np.clip(spatial[frame["comps"][0]["id"]], 0, 255)
        return np.round(g).astype(np.uint8)[..., None]
    y, cb, cr = (spatial[c["id"]] for c in frame["comps"])
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.round(np.clip(rgb, 0, 255)).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (test fixture generator)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)               # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)         # pad with 1s per spec


def _huff_build(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies → (counts per length 1..16, symbols in
    canonical order), length-limited per Annex K.3."""
    import heapq

    if not freqs:
        freqs = {0: 1}
    heap = [(f, i, [s]) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    lengths = {s: 0 for s in freqs}
    if len(heap) == 1:
        lengths[heap[0][2][0]] = 1
    tie = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, tie, s1 + s2))
        tie += 1
    counts = [0] * 33
    for s, ln in lengths.items():
        counts[ln] += 1
    # Annex K.3 adjust: fold codes longer than 16 bits down
    for i in range(32, 16, -1):
        while counts[i] > 0:
            j = i - 2
            while counts[j] == 0:
                j -= 1
            counts[i] -= 2
            counts[i - 1] += 1
            counts[j] -= 1
            counts[j + 1] += 2
    ordered = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    out_counts = counts[1:17]
    symbols: list[int] = []
    k = 0
    for ln in range(1, 17):
        for _ in range(out_counts[ln - 1]):
            symbols.append(ordered[k][0])
            k += 1
    return out_counts, symbols


def _huff_encode_map(counts: list[int], symbols: list[int]) -> dict:
    return {sym: (ln, code)
            for (ln, code), sym in _huff_decode_map(counts, symbols).items()}


def _fdct_quant(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """(bh*8, bw*8) float plane → (nblocks, 64) quantized zigzag ints."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) \
        .reshape(bh * bw, 8, 8) - 128.0
    coeffs = np.einsum("ak,nkl,bl->nab", _A, blocks, _A)
    q = np.round(coeffs / qtable[None].astype(float)).astype(np.int64)
    return q[:, _ZZ_ROWS, _ZZ_COLS]


def _block_symbols(zz: np.ndarray, pred: int) -> tuple[list, int]:
    """One zigzag block → [(sym, value_bits, nbits), ...] + new DC pred."""
    syms = []
    diff = int(zz[0]) - pred
    t = diff if diff >= 0 else -diff
    size = t.bit_length()
    v = diff if diff >= 0 else diff + (1 << size) - 1
    syms.append(("dc", size, v & ((1 << size) - 1), size))
    run = 0
    last = 0
    nz = np.nonzero(zz[1:])[0]
    if len(nz):
        last = nz[-1] + 1
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            syms.append(("ac", 0xF0, 0, 0))
            run -= 16
        val = int(zz[k])
        t = val if val >= 0 else -val
        size = t.bit_length()
        v = val if val >= 0 else val + (1 << size) - 1
        syms.append(("ac", (run << 4) | size, v & ((1 << size) - 1), size))
        run = 0
    if last < 63:
        syms.append(("ac", 0x00, 0, 0))
    return syms, int(zz[0])


def synth_jpeg_progressive(pixels: np.ndarray, quality: int = 85,
                           subsample: bool = False) -> bytes:
    """Encode pixels as a PROGRESSIVE JPEG (SOF2) exercising all four
    scan types the decoder implements: an interleaved DC first scan
    (Al=1), a DC refinement scan, per-component AC first scans split
    into two spectral bands (1-5, 6-63, Al=1), and the matching AC
    refinement scans (Ah=1→Al=0, T.81 §G.1.2.3 with EOB-run buffered
    correction bits).  Quantized coefficients are identical to
    ``synth_jpeg``'s, so decoded pixels are bit-identical to the
    baseline encoding of the same input."""
    comps, qs, h, w, mcus_x, mcus_y, gray = _prepare_components(
        pixels, quality, subsample)

    # interleaved MCU unit order (shared by both DC scans)
    units: list[tuple[int, int]] = []
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    units.append(
                        (ci, (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx))

    def dc_first_items(al: int) -> list:
        pred = [0] * len(comps)
        items = []                                  # (tbl, sym, bits, n)
        for ci, bidx in units:
            dc = int(comps[ci]["zz"][bidx][0]) >> al
            diff = dc - pred[ci]
            pred[ci] = dc
            size = abs(diff).bit_length()
            v = diff if diff >= 0 else diff + (1 << size) - 1
            items.append((0 if comps[ci]["tq"] == 0 else 1,
                          size, v & ((1 << size) - 1), size))
        return items

    def ac_first_items(c: dict, ss: int, se: int, al: int) -> list:
        items = []
        eobrun = 0

        def flush():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                items.append(("s", nb << 4, eobrun - (1 << nb), nb))
                eobrun = 0

        for row in range(c["bh_act"]):
          for col in range(c["bw_act"]):
            blk = c["zz"][row * c["bw"] + col]
            run = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = abs(v) >> al
                if t == 0:
                    run += 1
                    continue
                flush()
                while run > 15:
                    items.append(("s", 0xF0, 0, 0))
                    run -= 16
                size = t.bit_length()
                ev = t if v > 0 else (-t) + (1 << size) - 1
                items.append(("s", (run << 4) | size,
                              ev & ((1 << size) - 1), size))
                run = 0
            if run > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
        flush()
        return items

    def ac_refine_items(c: dict, ss: int, se: int, al: int) -> list:
        """T.81 G.1.2.3 encoder (mirrors libjpeg encode_mcu_AC_refine):
        corrections buffered through EOB runs."""
        items = []
        eobrun = 0
        pending: list[int] = []                     # carried corrections

        def flush():
            nonlocal eobrun, pending
            if eobrun:
                nb = eobrun.bit_length() - 1
                items.append(("s", nb << 4, eobrun - (1 << nb), nb))
                eobrun = 0
            items.extend(("b", b) for b in pending)
            pending = []

        for row in range(c["bh_act"]):
          for col in range(c["bw_act"]):
            blk = c["zz"][row * c["bw"] + col]
            ts = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eob = max((i for i, t in enumerate(ts) if t == 1), default=-1)
            run = 0
            br: list[int] = []                      # this block's pending
            for i, t in enumerate(ts):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and i <= eob:
                    flush()
                    items.append(("s", 0xF0, 0, 0))
                    run -= 16
                    items.extend(("b", b) for b in br)
                    br = []
                if t > 1:
                    br.append(t & 1)
                    continue
                flush()
                items.append(("s", (run << 4) | 1, 0, 0))
                items.append(("b", 1 if int(blk[ss + i]) > 0 else 0))
                items.extend(("b", b) for b in br)
                br = []
                run = 0
            if run > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF or len(pending) > 900:
                    flush()
        flush()
        return items

    def huff_tables_for(items, n_tables: int, tbl_of) -> list:
        freqs: list[dict] = [{} for _ in range(n_tables)]
        for it in items:
            t, sym = tbl_of(it)
            if t is not None:
                freqs[t][sym] = freqs[t].get(sym, 0) + 1
        return [_huff_build(f) for f in freqs]

    out = _jpeg_header(comps, qs, h, w, b"\xff\xc2")

    def dht(tc: int, th: int, counts, symbols) -> bytes:
        return (b"\xff\xc4" + struct.pack(">H", 19 + len(symbols))
                + bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols))

    def sos(scomps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        b = bytes([len(scomps)])
        for cid, td, ta in scomps:
            b += bytes([cid, (td << 4) | ta])
        b += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(b)) + b

    # scan 1: DC first, interleaved, Al=1
    items = dc_first_items(1)
    ntab = 1 if gray else 2
    tabs = huff_tables_for(items, ntab, lambda it: (it[0], it[1]))
    maps = [_huff_encode_map(*t) for t in tabs]
    for th, (cnt, symv) in enumerate(tabs):
        out += dht(0, th, cnt, symv)
    out += sos([(c["id"], 0 if c["tq"] == 0 else 1, 0) for c in comps],
               0, 0, 0, 1)
    bw_ = _BitWriter()
    for t, sym, bits, n in items:
        ln, code = maps[t][sym]
        bw_.write(code, ln)
        if n:
            bw_.write(bits, n)
    bw_.flush()
    out += bw_.out

    # scan 2: DC refinement, Ah=1 → Al=0 (raw bits, no Huffman)
    out += sos([(c["id"], 0, 0) for c in comps], 0, 0, 1, 0)
    bw_ = _BitWriter()
    for ci, bidx in units:
        bw_.write(int(comps[ci]["zz"][bidx][0]) & 1, 1)
    bw_.flush()
    out += bw_.out

    # AC scans: two spectral bands per component, first pass then refine
    bands = [(1, 5), (6, 63)]
    for build, ah, al in ((ac_first_items, 0, 1), (ac_refine_items, 1, 0)):
        for c in comps:
            for ss, se in bands:
                items = build(c, ss, se, al if ah == 0 else 0)
                cnt, symv = _huff_build(_count_s(items))
                amap = _huff_encode_map(cnt, symv)
                out += dht(1, 0, cnt, symv)
                out += sos([(c["id"], 0, 0)], ss, se, ah, al)
                bw_ = _BitWriter()
                for it in items:
                    if it[0] == "s":
                        _, sym, bits, n = it
                        ln, code = amap[sym]
                        bw_.write(code, ln)
                        if n:
                            bw_.write(bits, n)
                    else:
                        bw_.write(it[1], 1)
                bw_.flush()
                out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


def _count_s(items) -> dict:
    f: dict[int, int] = {}
    for it in items:
        if it[0] == "s":
            f[it[1]] = f.get(it[1], 0) + 1
    return f


def _prepare_components(pixels: np.ndarray, quality: int,
                        subsample: bool):
    """Shared encoder front half: color transform, subsample, pad,
    FDCT+quantize.  Returns (comps, qs, h, w, mcus_x, mcus_y, gray)."""
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2 or px.shape[2] == 1
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[..., 0]
    h, w = px.shape[:2]
    qs = [_scale_quant(QUANT_LUMA, quality)]
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": px}]
    else:
        r_, g_, b_ = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        qs.append(_scale_quant(QUANT_CHROMA, quality))
        cf = 2 if subsample else 1
        comps = [
            {"id": 1, "h": cf, "v": cf, "tq": 0, "plane": y},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad each component plane (edge replicate) to its block grid
    for c in comps:
        plane = c["plane"]
        if c["h"] != hmax or c["v"] != vmax:        # subsample by mean
            ry, rx = vmax // c["v"], hmax // c["h"]
            ph = -(-plane.shape[0] // ry) * ry
            pw = -(-plane.shape[1] // rx) * rx
            plane = np.pad(plane, ((0, ph - plane.shape[0]),
                                   (0, pw - plane.shape[1])), mode="edge")
            plane = plane.reshape(ph // ry, ry, pw // rx, rx).mean((1, 3))
        th = mcus_y * c["v"] * 8
        tw = mcus_x * c["h"] * 8
        plane = np.pad(plane, ((0, th - plane.shape[0]),
                               (0, tw - plane.shape[1])), mode="edge")
        c["zz"] = _fdct_quant(plane, qs[c["tq"]])
        c["bw"] = mcus_x * c["h"]
        # ACTUAL data-unit grid (T.81 A.2.2) — non-interleaved scans
        # cover only these blocks, not the MCU padding
        cw = -(-(w * c["h"]) // hmax)
        ch_ = -(-(h * c["v"]) // vmax)
        c["bw_act"] = -(-cw // 8)
        c["bh_act"] = -(-ch_ // 8)
        del c["plane"]
    return comps, qs, h, w, mcus_x, mcus_y, gray


def _jpeg_header(comps, qs, h, w, sof_marker: bytes) -> bytearray:
    out = bytearray(b"\xff\xd8")                    # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, q in enumerate(qs):
        zz = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    out += sof_marker + struct.pack(">H", 8 + 3 * len(comps))
    out += struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    return out


def synth_jpeg(pixels: np.ndarray, quality: int = 85,
               subsample: bool = False,
               restart_interval: int = 0) -> bytes:
    """Encode (H, W, 3) RGB or (H, W)/(H, W, 1) grayscale uint8 pixels
    as a baseline JPEG.  ``subsample=True`` emits 4:2:0 chroma (tests
    the decoder's interleaved-MCU and upsampling paths)."""
    comps, qs, h, w, mcus_x, mcus_y, gray = _prepare_components(
        pixels, quality, subsample)
    # pass 1: emit symbols per MCU to gather Huffman frequencies
    n_mcus = mcus_x * mcus_y
    stream: list[tuple] = []                        # (comp_idx, syms)
    pred = [0] * len(comps)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            pred = [0] * len(comps)
            stream.append((-1, m // restart_interval - 1))
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    syms, pred[ci] = _block_symbols(
                        c["zz"][row * c["bw"] + col], pred[ci])
                    stream.append((ci, syms))
    dc_freq: list[dict] = [{}, {}]
    ac_freq: list[dict] = [{}, {}]
    for ci, syms in stream:
        if ci < 0:
            continue
        tbl = 0 if comps[ci]["tq"] == 0 else 1
        for kind, sym, _, _ in syms:
            f = dc_freq[tbl] if kind == "dc" else ac_freq[tbl]
            f[sym] = f.get(sym, 0) + 1
    ntab = 1 if gray else 2
    dc_tabs = [_huff_build(dc_freq[i]) for i in range(ntab)]
    ac_tabs = [_huff_build(ac_freq[i]) for i in range(ntab)]
    dc_maps = [_huff_encode_map(*t) for t in dc_tabs]
    ac_maps = [_huff_encode_map(*t) for t in ac_tabs]
    # pass 2: entropy-code
    bw_ = _BitWriter()
    body = bytearray()
    for ci, syms in stream:
        if ci < 0:                                  # restart marker
            bw_.flush()
            body += bw_.out
            bw_ = _BitWriter()
            body += bytes([0xFF, 0xD0 + (syms % 8)])
            continue
        tbl = 0 if comps[ci]["tq"] == 0 else 1
        for kind, sym, vbits, nbits in syms:
            ln, code = (dc_maps if kind == "dc" else ac_maps)[tbl][sym]
            bw_.write(code, ln)
            if nbits:
                bw_.write(vbits, nbits)
    bw_.flush()
    body += bw_.out
    # assemble segments
    out = _jpeg_header(comps, qs, h, w, b"\xff\xc0")
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for th, (counts, symbols) in enumerate(tabs):
            out += b"\xff\xc4" + struct.pack(
                ">H", 19 + len(symbols)) + bytes([(tc << 4) | th])
            out += bytes(counts) + bytes(symbols)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(comps))
    out += bytes([len(comps)])
    for c in comps:
        tbl = 0 if c["tq"] == 0 else 1
        out += bytes([c["id"], (tbl << 4) | tbl])
    out += b"\x00\x3f\x00"                          # Ss/Se/Ah-Al
    out += body
    out += b"\xff\xd9"                              # EOI
    return bytes(out)

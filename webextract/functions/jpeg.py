"""Pure-Python baseline-sequential JPEG (JFIF) pixel decoder.

Closes the last codec gap in the media pipeline: PNG/BMP/GIF already
decode codec-free (zlib / raw rows / LZW), and JPEG — the dominant web
image format — needs a Huffman entropy decoder plus an 8×8 IDCT, both of
which are implementable from the public ITU-T T.81 spec with nothing but
the stdlib and numpy. The reference decodes JPEG like any other format
via PIL (``utils/image_utils.py:84-168``); this module is the from-spec
equivalent for environments without a codec library, and the
deterministic fallback behind the pluggable ``decoder=`` seam in
:mod:`webextract.functions.multimodal`.

Scope: baseline DCT sequential (SOF0), extended sequential (SOF1) and
progressive (SOF2, T.81 G.2: spectral selection + successive
approximation, DC/AC first and refinement scans, EOB runs), 8-bit
samples, grayscale or YCbCr, any sampling factors, restart markers,
16-bit quantization tables. Lossless and arithmetic-coded frames raise
``ValueError`` — captured as per-row error values by the batch wrapper,
never exceptions.

Performance note: this is a per-row Python loop (~100× slower than a C
codec like libjpeg-turbo); production installs a native decoder through
the ``decoder=`` seam and keeps this as the deterministic oracle path.
"""

from __future__ import annotations

import struct

_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

_SOF_BASELINE = {0xC0, 0xC1}       # Huffman sequential
_SOF_PROGRESSIVE = {0xC2}          # Huffman progressive
_SOF_UNSUPPORTED = {
    0xC3: "lossless JPEG unsupported",
    0xC5: "differential sequential JPEG unsupported",
    0xC6: "differential progressive JPEG unsupported",
    0xC7: "differential lossless JPEG unsupported",
    0xC9: "arithmetic-coded JPEG unsupported",
    0xCA: "arithmetic progressive JPEG unsupported",
    0xCB: "arithmetic lossless JPEG unsupported",
    0xCD: "arithmetic differential JPEG unsupported",
    0xCE: "arithmetic differential progressive JPEG unsupported",
    0xCF: "arithmetic differential lossless JPEG unsupported",
}


def _idct_matrix():
    """8×8 DCT-II basis matrix C with C[u, x] = a(u)·cos((2x+1)uπ/16);
    inverse transform is block = Cᵀ · coef · C."""
    import math

    import numpy as np

    c = np.empty((8, 8), dtype=np.float64)
    for u in range(8):
        a = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = a * math.cos((2 * x + 1) * u * math.pi / 16)
    return c


class _Huffman:
    """Canonical JPEG Huffman table: (code_length, code) → symbol."""

    __slots__ = ("lookup", "max_len")

    def __init__(self, bits: bytes, values: bytes):
        # bits[i] = number of codes of length i+1 (T.81 C.2 canonical
        # assignment: codes of each length count up from the previous
        # length's last code shifted left)
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.max_len = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(values):
                    raise ValueError("corrupt DHT (values short)")
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
                self.max_len = length
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, with 0xFF00
    byte-stuffing removal; stops at any non-stuffed marker."""

    __slots__ = ("data", "pos", "acc", "nbits", "end")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.end = False

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if p >= len(d):
            self.end = True
            self.acc = (self.acc << 8) | 0
            self.nbits += 8
            return
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:          # stuffed 0xFF data byte
                self.pos = p + 2
            else:                    # a real marker: scan is over
                self.end = True
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                return
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _Huffman) -> int:
        length = 0
        code = 0
        lookup = table.lookup
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def align_to_restart(self) -> None:
        """Drop buffered bits and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        self.end = False
        d = self.data
        p = self.pos
        # writers pad to the marker with 1-bits already dropped above
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        raise ValueError("missing JPEG restart marker")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s low bits to the signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_pixels(b: bytes) -> tuple[int, int, int, bytes]:
    """Decode JPEG bytes → (width, height, channels, raw pixels).

    Handles baseline/extended sequential (SOF0/SOF1) and progressive
    (SOF2) Huffman frames. Channels: 1 for grayscale frames, 3 (RGB,
    BT.601 conversion from YCbCr) otherwise. Raises ValueError on
    anything outside that scope — the caller's per-row error contract.
    """
    import numpy as np

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    frame = None           # (w, h, components) from SOF
    progressive = False
    restart_interval = 0
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[pos + 1]
        if marker == 0xFF:           # fill byte
            pos += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2                 # standalone marker
            continue
        if marker == 0xD9:           # EOI before SOS
            break
        (seg_len,) = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4:pos + 2 + seg_len]
        if marker in _SOF_UNSUPPORTED:
            raise ValueError(_SOF_UNSUPPORTED[marker])
        if marker in _SOF_BASELINE or marker in _SOF_PROGRESSIVE:
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                              "tq": tq})
            frame = (w, h, comps)
            progressive = marker in _SOF_PROGRESSIVE
        elif marker == 0xDB:         # DQT: one or more tables
            _parse_dqt(seg, qt)
        elif marker == 0xC4:         # DHT: one or more tables
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDD:         # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:         # SOS: decode the scan
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            w, h, comps = frame
            if w == 0 or h == 0:
                raise ValueError("zero-sized JPEG frame")
            if progressive:
                # hand the whole remaining marker stream (this SOS and
                # every later scan/DHT/DRI segment) to the multi-scan
                # coefficient accumulator
                return _decode_progressive(b, pos, frame, qt, huff_dc,
                                           huff_ac, restart_interval)
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i:3 + 2 * i]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError("SOS references unknown component")
                scan.append((comp, tables >> 4, tables & 0x0F))
            if len(scan) != len(comps):
                raise ValueError(
                    "multi-scan (non-interleaved) JPEG unsupported")
            return _decode_scan(b, pos + 2 + seg_len, w, h, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += 2 + seg_len
    raise ValueError("no JPEG scan data (missing SOS)")


def _decode_scan(b, pos, w, h, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    import numpy as np

    cmat = _idct_matrix()
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    if len(scan) == 1:
        # T.81 A.2.2: an Ns=1 scan is non-interleaved — ONE data unit
        # per MCU, raster order over the component's own block grid
        # (ceil(w/8) x ceil(h/8); a grayscale SOF declaring sampling
        # factors >1 must NOT decode h*v blocks per 8*hmax-pixel MCU,
        # which the interleaved geometry below would do). Mirrors the
        # progressive path's nbx/nby single-component handling.
        mcus_x, mcus_y = -(-w // 8), -(-h // 8)
        unit_shape = (1, 1)
    else:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        unit_shape = None   # interleaved: comp["v"] x comp["h"] per MCU
    planes = []
    for comp, dc_id, ac_id in scan:
        if comp["tq"] not in qt:
            raise ValueError("SOF references missing quantization table")
        if dc_id not in huff_dc or ac_id not in huff_ac:
            raise ValueError("SOS references missing Huffman table")
        cv, ch_ = unit_shape or (comp["v"], comp["h"])
        planes.append(np.zeros(
            (mcus_y * cv * 8, mcus_x * ch_ * 8), dtype=np.float64))
    reader = _BitReader(b, pos)
    preds = [0] * len(scan)
    coef = np.empty((8, 8), dtype=np.float64)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                reader.align_to_restart()
                preds = [0] * len(scan)
            if reader.end:
                raise ValueError("JPEG entropy stream ended short")
            for ci, (comp, dc_id, ac_id) in enumerate(scan):
                q = qt[comp["tq"]]
                dc_tbl, ac_tbl = huff_dc[dc_id], huff_ac[ac_id]
                nv, nh = unit_shape or (comp["v"], comp["h"])
                for by in range(nv):
                    for bx in range(nh):
                        coef[:] = 0.0
                        s = reader.decode(dc_tbl)
                        if s > 11:
                            raise ValueError("bad DC category")
                        diff = _extend(reader.bits(s), s) if s else 0
                        preds[ci] += diff
                        coef[0, 0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:   # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break         # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient overrun")
                            z = _ZIGZAG[k]
                            coef[z // 8, z % 8] = _extend(
                                reader.bits(s), s)
                            k += 1
                        block = cmat.T @ (coef * q) @ cmat
                        y0 = (my * nv + by) * 8
                        x0 = (mx * nh + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1
    out = []
    for ci, (comp, _, _) in enumerate(scan):
        # crop the padded MCU grid to the component's true raster, then
        # replicate up to full frame resolution (nearest, the same index
        # mapping as multimodal._nn_resize)
        cw = -(-w * comp["h"] // hmax)
        ch = -(-h * comp["v"] // vmax)
        plane = planes[ci][:ch, :cw]
        ys = (np.arange(h, dtype=np.int64) * ch) // h
        xs = (np.arange(w, dtype=np.int64) * cw) // w
        out.append(plane[ys][:, xs] + 128.0)
    if len(out) == 1:
        gray = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    # BT.601 full-range YCbCr → RGB (the JFIF-specified conversion)
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=-1)
    return w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()


def _parse_dqt(seg: bytes, qt: dict) -> None:
    import numpy as np

    sp = 0
    while sp < len(seg):
        pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
        sp += 1
        if pq == 0:
            tbl = np.frombuffer(seg[sp:sp + 64], dtype=np.uint8) \
                .astype(np.float64)
            sp += 64
        else:
            tbl = np.frombuffer(seg[sp:sp + 128], dtype=">u2") \
                .astype(np.float64)
            sp += 128
        if tbl.size != 64:
            raise ValueError("corrupt DQT")
        dz = np.empty(64, dtype=np.float64)
        dz[list(_ZIGZAG)] = tbl      # de-zigzag at parse time
        qt[tq] = dz.reshape(8, 8)


def _parse_dht(seg: bytes, huff_dc: dict, huff_ac: dict) -> None:
    sp = 0
    while sp + 17 <= len(seg):
        tc, th = seg[sp] >> 4, seg[sp] & 0x0F
        bits = seg[sp + 1:sp + 17]
        cnt = sum(bits)
        values = seg[sp + 17:sp + 17 + cnt]
        (huff_dc if tc == 0 else huff_ac)[th] = _Huffman(bits, values)
        sp += 17 + cnt


# ---------------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 G.2: every scan delivers a spectral
# band / successive-approximation slice of the full-frame coefficient
# arrays; dequantization + IDCT happen once at the end
# ---------------------------------------------------------------------------


def _decode_progressive(b, pos, frame, qt, huff_dc, huff_ac,
                        restart_interval):
    """Accumulate all progressive scans into per-component coefficient
    grids (zigzag order, int), then reconstruct. ``pos`` points at the
    first SOS marker; DHT/DQT/DRI segments between scans are honored."""
    import numpy as np

    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]            # padded block grid (MCU)
        c["bh"] = mcus_y * c["v"]
        cw = -(-(w * c["h"]) // hmax)        # true component raster
        ch = -(-(h * c["v"]) // vmax)
        c["nbx"] = -(-cw // 8)               # blocks coded by a
        c["nby"] = -(-ch // 8)               # non-interleaved scan
    coefs = [np.zeros((c["bh"], c["bw"], 64), dtype=np.int64)
             for c in comps]
    n = len(b)
    saw_scan = False
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:                   # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            break
        (seg_len,) = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4:pos + 2 + seg_len]
        if marker == 0xC4:
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i:3 + 2 * i]
                ci = next((j for j, c in enumerate(comps)
                           if c["id"] == cs), None)
                if ci is None:
                    raise ValueError("SOS references unknown component")
                scomps.append((ci, tables >> 4, tables & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _prog_scan(b, pos + 2 + seg_len, scomps, ss, se, ah,
                             al, coefs, comps, huff_dc, huff_ac,
                             restart_interval, mcus_x, mcus_y)
            saw_scan = True
            continue
        pos += 2 + seg_len
    if not saw_scan:
        raise ValueError("no JPEG scan data (missing SOS)")
    return _prog_reconstruct(w, h, comps, coefs, qt, hmax, vmax)


def _prog_scan(b, pos, scomps, ss, se, ah, al, coefs, comps, huff_dc,
               huff_ac, restart_interval, mcus_x, mcus_y):
    """Decode one progressive scan into ``coefs``; returns the stream
    position of the marker that ended the entropy segment."""
    reader = _BitReader(b, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with nonzero Se")
        _prog_dc_scan(reader, scomps, ah, al, coefs, comps, huff_dc,
                      restart_interval, mcus_x, mcus_y)
    else:
        if len(scomps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError("bad progressive spectral band")
        _prog_ac_scan(reader, scomps[0], ss, se, ah, al, coefs, comps,
                      huff_ac, restart_interval)
    # the reader usually stops at the terminating marker's 0xFF, but a
    # fully-unread trailing pad byte can be left over — skip to the next
    # true marker (0xFF not followed by a stuffed 0x00)
    d, p = reader.data, reader.pos
    while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
        p += 1
    return p


def _prog_dc_scan(reader, scomps, ah, al, coefs, comps, huff_dc,
                  restart_interval, mcus_x, mcus_y):
    preds = [0] * len(scomps)
    tbls = []
    for _, dc_id, _ in scomps:
        if ah == 0:                      # refinement scans read raw bits
            if dc_id not in huff_dc:
                raise ValueError("SOS references missing Huffman table")
            tbls.append(huff_dc[dc_id])
        else:
            tbls.append(None)

    def block(sci, ci, by, bx):
        coef = coefs[ci][by, bx]
        if ah == 0:                      # first DC scan: diff of DC>>al
            s = reader.decode(tbls[sci])
            if s > 11:
                raise ValueError("bad DC category")
            diff = _extend(reader.bits(s), s) if s else 0
            preds[sci] += diff
            coef[0] = preds[sci] << al
        else:                            # refinement: one bit at al
            if reader.bit():
                coef[0] |= 1 << al

    count = 0
    if len(scomps) > 1:                  # interleaved MCU order
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and count \
                        and count % restart_interval == 0:
                    reader.align_to_restart()
                    preds = [0] * len(scomps)
                if reader.end:
                    raise ValueError("JPEG entropy stream ended short")
                for sci, (ci, _, _) in enumerate(scomps):
                    comp = comps[ci]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            block(sci, ci, my * comp["v"] + by,
                                  mx * comp["h"] + bx)
                count += 1
    else:                                # single component: raster order
        ci = scomps[0][0]
        comp = comps[ci]
        for by in range(comp["nby"]):
            for bx in range(comp["nbx"]):
                if restart_interval and count \
                        and count % restart_interval == 0:
                    reader.align_to_restart()
                    preds = [0] * len(scomps)
                if reader.end:
                    raise ValueError("JPEG entropy stream ended short")
                block(0, ci, by, bx)
                count += 1


def _prog_ac_scan(reader, scomp, ss, se, ah, al, coefs, comps, huff_ac,
                  restart_interval):
    ci, _, ac_id = scomp
    if ac_id not in huff_ac:
        raise ValueError("SOS references missing Huffman table")
    ac_tbl = huff_ac[ac_id]
    comp = comps[ci]
    grid = coefs[ci]
    p1 = 1 << al
    m1 = -p1
    eobrun = 0
    count = 0
    for by in range(comp["nby"]):
        for bx in range(comp["nbx"]):
            if restart_interval and count \
                    and count % restart_interval == 0:
                reader.align_to_restart()
                eobrun = 0
            count += 1
            block = grid[by, bx]
            if ah == 0:                  # first pass for this band/level
                if eobrun > 0:
                    eobrun -= 1
                    continue
                if reader.end:
                    raise ValueError("JPEG entropy stream ended short")
                k = ss
                while k <= se:
                    rs = reader.decode(ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:      # EOBn: this block is done
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.bits(r)
                            break
                        k += 16          # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC coefficient overrun")
                    block[k] = _extend(reader.bits(s), s) << al
                    k += 1
            else:                        # refinement pass (T.81 G.1.2.3)
                if reader.end and eobrun == 0:
                    raise ValueError("JPEG entropy stream ended short")
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode(ac_tbl)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:  # EOBn incl. this block
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.bits(r)
                                break
                        else:
                            if s != 1:
                                raise ValueError(
                                    "bad AC refinement magnitude")
                            newval = p1 if reader.bit() else m1
                        # advance past r zero-history coefficients,
                        # correcting nonzero-history ones on the way
                        while k <= se:
                            if block[k] != 0:
                                if reader.bit() and (block[k] & p1) == 0:
                                    block[k] += p1 if block[k] > 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            block[k] = newval
                        k += 1
                if eobrun > 0:
                    # EOB refinement: correction bits for the remaining
                    # nonzero-history coefficients of the band
                    while k <= se:
                        if block[k] != 0:
                            if reader.bit() and (block[k] & p1) == 0:
                                block[k] += p1 if block[k] > 0 else m1
                        k += 1
                    eobrun -= 1


def _prog_reconstruct(w, h, comps, coefs, qt, hmax, vmax):
    import numpy as np

    cmat = _idct_matrix()
    zz = list(_ZIGZAG)
    out = []
    for ci, comp in enumerate(comps):
        if comp["tq"] not in qt:
            raise ValueError("SOF references missing quantization table")
        q = qt[comp["tq"]]
        grid = coefs[ci].astype(np.float64)
        nat = np.zeros_like(grid)
        nat[..., zz] = grid                  # de-zigzag
        blocks = nat.reshape(comp["bh"], comp["bw"], 8, 8) * q
        # IDCT every block at once: Cᵀ · M · C
        spat = np.einsum("ij,mnjk,kl->mnil", cmat.T, blocks, cmat)
        plane = spat.transpose(0, 2, 1, 3).reshape(
            comp["bh"] * 8, comp["bw"] * 8)
        cw = -(-(w * comp["h"]) // hmax)
        ch = -(-(h * comp["v"]) // vmax)
        plane = plane[:ch, :cw]
        ys = (np.arange(h, dtype=np.int64) * ch) // h
        xs = (np.arange(w, dtype=np.int64) * cw) // w
        out.append(plane[ys][:, xs] + 128.0)
    if len(out) == 1:
        gray = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=-1)
    return w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()

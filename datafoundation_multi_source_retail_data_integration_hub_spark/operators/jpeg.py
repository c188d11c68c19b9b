"""Pure-Python JPEG codec: baseline-sequential AND progressive decode,
plus minimal test-fixture encoders for both.

Closes the Pillow dependence in the multimodal pixel tier (VERDICT r09
directive 7; progressive added r11 — ~10% of real web corpora): baseline
and progressive DCT / Huffman JPEGs now decode to raw 8-bit pixels with
stdlib only, so ``resize_media`` yields real thumbnails in a codec-less
environment. Supported: SOF0 (baseline sequential), SOF1 (extended
sequential, 8- and 12-bit — 12-bit samples level-shift by 2048, decode
exactly, and scale to the module's 8-bit pixel contract; 16-bit Pq=1
quantization tables; the §F.1.2.1.1 DC category-16 corner), and SOF2
(progressive: spectral selection + successive approximation, DC and AC
first/refinement scans, per T.81 Annex G, 8- and 12-bit), grayscale and
3-component YCbCr at 4:4:4 / 4:2:2 / 4:2:0 (any sampling factors ≤ 2
compose through the generic per-component upsampler), restart markers
in all modes. Arithmetic coding (SOF9+; no verifiable Table D.3 state
machine available in this environment — see COVERAGE.md's declared
boundary) and hierarchical/lossless frames raise
``ValueError``/``NotImplementedError`` — callers fall back to Pillow
or surface ``resize_ok=false`` data rows, never task failures.

Interpreted per-pixel loops are ~100x slower than a C codec; like the
PNG/GIF paths, this is the deterministic fallback/oracle tier — bulk
pipelines prefer Pillow via ``resize_image(backend="native")``.

This module is written from the public JPEG spec (ITU-T T.81): marker
layout §B.2, Huffman table construction §C.2, the sequential decode
procedure §F.2.2, the progressive control procedures Annex G (EOB runs
§G.1.2.2, successive-approximation correction bits §G.1.2.3), and the
Annex K reference quantization/Huffman tables for the encoders.
"""

from __future__ import annotations

import math
import struct

# zigzag order: index i of the scan -> position in the 8x8 block
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# separable 8-point DCT-III basis: _COS[u][x] = C(u) * cos((2x+1)u*pi/16) / 2
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16)
        / 2.0
        for x in range(8)
    ]
    for u in range(8)
]


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any non-RST marker (left for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("malformed JPEG: entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            else:
                # a real marker: per §F.2.2.5 the decoder pads with 1-bits
                # at the end of the interval; keep pos ON the marker
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop buffered bits and skip to the next marker boundary (used
        at restart intervals)."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                return
            self.pos += 1


def _build_huffman(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, per T.81 Annex C code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("malformed JPEG: invalid Huffman code")


def _extend(v: int, n: int) -> int:
    # §F.2.2.1 EXTEND: map the n-bit magnitude to its signed value
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _dc_diff(br: _BitReader, dc_tbl, prec: int) -> int:
    """Huffman-decode one DC difference — the single implementation of
    the §F.1.2.1.1 corner (12-bit category 16 codes 32768 with NO
    appended magnitude bits), shared by the sequential and progressive
    DC paths so they cannot diverge."""
    t = _huff_decode(br, dc_tbl)
    if t == 16 and prec == 12:
        return 32768
    return _extend(br.receive(t), t)


def _idct_2d(coef: list[int], prec: int = 8) -> list[int]:
    """8x8 inverse DCT -> level-shifted, clamped samples scaled to
    8 bits. ``prec`` is the frame's sample precision: 12-bit frames
    level-shift by 2048, clamp to 0..4095, and return the samples
    scaled down 4 bits (the module's pixel contract is 8-bit; the
    decode is exact internally, only the final presentation scales)."""
    # rows then columns, separable; floats are IEEE-deterministic
    mid = 1 << (prec - 1)
    maxv = (1 << prec) - 1
    down = prec - 8
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8 : y * 8 + 8]
        if not any(row):
            continue
        base = y * 8
        for x in range(8):
            cx = _COS
            s = 0.0
            for u in range(8):
                if row[u]:
                    s += row[u] * cx[u][x]
            tmp[base + x] = s
    out = [0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            s = 0.0
            for v in range(8):
                if col[v]:
                    s += col[v] * _COS[v][y]
            p = int(round(s)) + mid
            p = 0 if p < 0 else (maxv if p > maxv else p)
            out[y * 8 + x] = p >> down if down else p
    return out


def _parse_dqt(seg: bytes, qt: dict[int, list[int]]) -> None:
    j = 0
    while j < len(seg):
        pq, tq = seg[j] >> 4, seg[j] & 0x0F
        tbl = [0] * 64
        if pq == 0:
            if j + 65 > len(seg):
                raise ValueError("malformed JPEG: truncated DQT")
            for k in range(64):
                tbl[ZIGZAG[k]] = seg[j + 1 + k]
            j += 65
        elif pq == 1:  # 16-bit entries (12-bit frames may use either)
            if j + 129 > len(seg):
                raise ValueError("malformed JPEG: truncated 16-bit DQT")
            for k in range(64):
                tbl[ZIGZAG[k]] = (seg[j + 1 + 2 * k] << 8) | seg[j + 2 + 2 * k]
            j += 129
        else:
            raise ValueError(f"malformed JPEG: DQT precision field {pq}")
        qt[tq] = tbl


def _parse_dht(seg: bytes, huff_dc: dict[int, dict], huff_ac: dict[int, dict]) -> None:
    j = 0
    while j < len(seg):
        tc, th = seg[j] >> 4, seg[j] & 0x0F
        counts = seg[j + 1 : j + 17]
        nsym = sum(counts)
        symbols = seg[j + 17 : j + 17 + nsym]
        tbl = _build_huffman(counts, symbols)
        (huff_dc if tc == 0 else huff_ac)[th] = tbl
        j += 17 + nsym


def decode_baseline(p: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a baseline-sequential OR progressive JPEG to
    (w, h, channels, pixels), row-major interleaved 8-bit — same
    contract as ``multimodal._png_decode_pixels``. Grayscale stays
    1 channel; YCbCr converts to RGB (JFIF full-range BT.601). (The
    name predates progressive support; it is the module's single
    decode entry point.)"""
    if p[:2] != b"\xff\xd8":
        raise ValueError("malformed JPEG: no SOI")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (w, h, comps) ; comps = [(cid, hs, vs, tq)]
    precision = 8
    progressive = False
    restart_interval = 0
    i = 2
    n = len(p)
    while i + 4 <= n:
        if p[i] != 0xFF:
            raise ValueError("malformed JPEG: lost marker sync")
        marker = p[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI before any scan
            break
        (seglen,) = struct.unpack(">H", p[i + 2 : i + 4])
        seg = p[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qt)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec == 12:
                if marker == 0xC0:
                    # T.81 B.2.2: baseline frames are 8-bit by definition
                    raise ValueError("malformed JPEG: 12-bit baseline frame")
            elif prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fw, fh, comps)
            precision = prec
            progressive = marker == 0xC2
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise NotImplementedError(
                f"JPEG frame type 0x{marker:02x} (only SOF0/SOF1/SOF2)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("malformed JPEG: SOS before SOF")
            if progressive:
                # the progressive loop owns the rest of the stream
                # (multiple scans, tables redefined between them)
                return _decode_progressive(
                    p, i, frame, qt, huff_dc, huff_ac, restart_interval,
                    precision,
                )
            ns = seg[0]
            if ns != len(frame[2]):
                # a baseline JPEG may legally carry one scan per
                # component; _decode_scan assumes the single fully
                # interleaved scan — decoding a partial scan with MCU
                # ordering would place blocks wrong and zero the other
                # planes silently. Raise for the caller's Pillow fallback.
                raise NotImplementedError(
                    "non-interleaved baseline JPEG (scan covers "
                    f"{ns} of {len(frame[2])} components)"
                )
            scan = []  # (comp_index, dc_table, ac_table)
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                idx = next(
                    (k for k, c in enumerate(frame[2]) if c[0] == cs), None
                )
                if idx is None:
                    raise ValueError("malformed JPEG: scan names unknown component")
                scan.append((idx, tt >> 4, tt & 0x0F))
            return _decode_scan(
                p, i + 2 + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval, precision,
            )
        i += 2 + seglen
    raise ValueError("malformed JPEG: no scan data")


def _decode_scan(
    p: bytes,
    pos: int,
    frame,
    scan,
    qt,
    huff_dc,
    huff_ac,
    restart_interval: int,
    prec: int = 8,
) -> tuple[int, int, int, bytearray]:
    fw, fh, comps = frame
    if fw == 0 or fh == 0:
        raise ValueError("malformed JPEG: zero dimension")
    # decompression-bomb guard (same budget as multimodal's raster
    # decoders): 16-bit dims allow a ~4-gigapixel declaration in a
    # 200-byte payload, and the planes below allocate w*h up front
    if fw * fh > (1 << 26):
        raise ValueError(
            f"decompression bomb: {fw}x{fh} exceeds the decode budget"
        )
    # before any plane allocation: the header may declare up to 255
    # components, each of which would get a frame-sized bytearray below
    if len(comps) not in (1, 3):
        raise NotImplementedError(
            f"{len(comps)}-component JPEG (only 1 or 3)"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("malformed JPEG: bad sampling factors")
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    # per-component pixel planes at their own resolution
    planes = []
    for _, hs, vs, _ in comps:
        planes.append(bytearray(mcus_x * hs * 8 * mcus_y * vs * 8))
    br = _BitReader(p, pos)
    pred = [0] * len(comps)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                br.align_to_marker()
                d = br.data
                if br.pos + 1 < len(d) and d[br.pos] == 0xFF and 0xD0 <= d[br.pos + 1] <= 0xD7:
                    br.pos += 2
                    pred = [0] * len(comps)
                else:
                    raise ValueError("malformed JPEG: missing restart marker")
            for ci, tdc, tac in scan:
                _, hs, vs, tq = comps[ci]
                quant = qt.get(tq)
                if quant is None:
                    raise ValueError("malformed JPEG: missing quant table")
                dc_tbl = huff_dc.get(tdc)
                ac_tbl = huff_ac.get(tac)
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("malformed JPEG: missing Huffman table")
                for by in range(vs):
                    for bx in range(hs):
                        coef = [0] * 64
                        pred[ci] += _dc_diff(br, dc_tbl, prec)
                        coef[0] = pred[ci] * quant[0]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("malformed JPEG: AC index overflow")
                            # quant is stored de-zigzagged (natural order),
                            # so index it at the coefficient's natural
                            # position, not the scan position k
                            coef[ZIGZAG[k]] = (
                                _extend(br.receive(s), s) * quant[ZIGZAG[k]]
                            )
                            k += 1
                        block = _idct_2d(coef, prec)
                        # paste into the component plane
                        pw = mcus_x * hs * 8
                        ox = (mx * hs + bx) * 8
                        oy = (my * vs + by) * 8
                        plane = planes[ci]
                        for row in range(8):
                            dst = (oy + row) * pw + ox
                            plane[dst : dst + 8] = bytes(
                                block[row * 8 : row * 8 + 8]
                            )
            mcu_index += 1
    return _planes_to_pixels(fw, fh, comps, planes, mcus_x, hmax, vmax)


def _planes_to_pixels(
    fw: int,
    fh: int,
    comps,
    planes,
    mcus_x: int,
    hmax: int,
    vmax: int,
) -> tuple[int, int, int, bytearray]:
    """Upsample each component plane to frame resolution and interleave
    (shared by the baseline and progressive decode paths)."""
    nc = len(comps)
    if nc == 1:
        _, hs, vs, _ = comps[0]
        pw = mcus_x * hs * 8
        out = bytearray(fw * fh)
        for y in range(fh):
            src = y * pw
            out[y * fw : (y + 1) * fw] = planes[0][src : src + fw]
        return fw, fh, 1, out
    if nc != 3:
        raise NotImplementedError(f"{nc}-component JPEG (only 1 or 3)")
    out = bytearray(fw * fh * 3)
    pws = [mcus_x * c[1] * 8 for c in comps]
    for y in range(fh):
        row_src = []
        for ci, (_, hs, vs, _) in enumerate(comps):
            sy = y * vs // vmax
            row_src.append(sy * pws[ci])
        base = y * fw * 3
        for x in range(fw):
            yy = planes[0][row_src[0] + x * comps[0][1] // hmax]
            cb = planes[1][row_src[1] + x * comps[1][1] // hmax] - 128
            cr = planes[2][row_src[2] + x * comps[2][1] // hmax] - 128
            r = yy + 1.402 * cr
            g = yy - 0.344136 * cb - 0.714136 * cr
            b = yy + 1.772 * cb
            o = base + x * 3
            out[o] = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
            out[o + 1] = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
            out[o + 2] = 0 if b < 0 else (255 if b > 255 else int(b + 0.5))
    return fw, fh, 3, out


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — T.81 Annex G
# ---------------------------------------------------------------------------


def _expect_rst(br: _BitReader) -> None:
    """Skip to and consume the next RSTn marker (restart boundary)."""
    br.align_to_marker()
    d = br.data
    if (
        br.pos + 1 < len(d)
        and d[br.pos] == 0xFF
        and 0xD0 <= d[br.pos + 1] <= 0xD7
    ):
        br.pos += 2
    else:
        raise ValueError("malformed JPEG: missing restart marker")


def _dc_first(br, dc_tbl, blk, pred: list[int], ci: int, al: int, prec: int) -> None:
    # the §F.1.2.1.1 category-16 rule applies in the point-transformed
    # domain too — shared _dc_diff keeps it in lockstep with _decode_scan
    pred[ci] += _dc_diff(br, dc_tbl, prec)
    blk[0] = pred[ci] << al


def _dc_refine(br, blk, al: int) -> None:
    # §G.1.2.1: one appended bit per block; OR works for negative
    # values because Python ints are two's-complement under bitwise ops
    if br.read_bit():
        blk[0] |= 1 << al


def _ac_first_block(br, ac_tbl, blk, ss, se, al, eobrun) -> int:
    """§G.1.2.2: AC first scan for one block; returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                # EOBn: run of 2^r blocks (this one included) + r bits
                eob = (1 << r) - 1
                if r:
                    eob += br.receive(r)
                return eob
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("malformed JPEG: AC index overflow")
            blk[ZIGZAG[k]] = _extend(br.receive(s), s) << al
            k += 1
    return 0


def _ac_refine_block(br, ac_tbl, blk, ss, se, al, eobrun) -> int:
    """§G.1.2.3: AC successive-approximation refinement for one block.
    Already-nonzero coefficients crossed while advancing take one
    correction bit each; a decoded (r, 1) symbol places a new ±2^Al
    after r still-zero positions. Returns the new EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break  # rest of the band is EOB-tail refined below
                # r == 15: ZRL — cross 16 still-zero positions
            else:
                if s != 1:
                    raise ValueError(
                        "malformed JPEG: progressive refinement size != 1"
                    )
                val = p1 if br.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if blk[z] != 0:
                    if br.read_bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError(
                        "malformed JPEG: refinement overruns the band"
                    )
                blk[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        # EOB tail: correction bits for every remaining already-nonzero
        # coefficient in the band
        while k <= se:
            z = ZIGZAG[k]
            if blk[z] != 0:
                if br.read_bit() and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    p: bytes,
    pos: int,
    seg: bytes,
    frame,
    grids,
    coefs,
    huff_dc,
    huff_ac,
    restart_interval: int,
    prec: int = 8,
) -> int:
    """Decode one progressive scan's entropy data into the coefficient
    store; returns the stream position of the next marker."""
    fw, fh, comps = frame
    ns = seg[0]
    scan = []  # (comp_index, dc_table, ac_table)
    for s_i in range(ns):
        cs, tt = seg[1 + 2 * s_i], seg[2 + 2 * s_i]
        idx = next((k for k, c in enumerate(comps) if c[0] == cs), None)
        if idx is None:
            raise ValueError("malformed JPEG: scan names unknown component")
        scan.append((idx, tt >> 4, tt & 0x0F))
    ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    if ss == 0 and se != 0:
        raise ValueError("malformed JPEG: progressive DC scan with Se != 0")
    if ss > 0 and ns != 1:
        raise ValueError(
            "malformed JPEG: progressive AC scan must cover one component"
        )
    if se > 63 or ss > se or al > 13 or (ah and ah != al + 1):
        raise ValueError("malformed JPEG: bad scan header parameters")
    br = _BitReader(p, pos)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    if ss == 0 and ns > 1:
        # interleaved DC scan: MCU order over the padded block grids
        for ci, tdc, _ in scan:
            if ah == 0 and huff_dc.get(tdc) is None:
                raise ValueError("malformed JPEG: missing Huffman table")
        pred = [0] * len(comps)
        mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    _expect_rst(br)
                    pred = [0] * len(comps)
                for ci, tdc, _ in scan:
                    _, hs, vs, _ = comps[ci]
                    pwb = grids[ci][0]
                    for by in range(vs):
                        for bx in range(hs):
                            blk = coefs[ci][
                                (my * vs + by) * pwb + (mx * hs + bx)
                            ]
                            if ah == 0:
                                _dc_first(br, huff_dc[tdc], blk, pred, ci, al, prec)
                            else:
                                _dc_refine(br, blk, al)
                mcu += 1
    else:
        # single-component scan (DC or AC): the component's OWN block
        # grid in raster order — NOT the MCU-padded grid (§G.1: a
        # non-interleaved scan has one block per MCU and no dummies)
        ci, tdc, tac = scan[0]
        pwb, _, owb, ohb = grids[ci]
        if ss == 0:
            tbl = huff_dc.get(tdc)
            if ah == 0 and tbl is None:
                raise ValueError("malformed JPEG: missing Huffman table")
        else:
            tbl = huff_ac.get(tac)
            if tbl is None:
                raise ValueError("malformed JPEG: missing Huffman table")
        pred = [0] * len(comps)
        eobrun = 0
        mcu = 0
        for by in range(ohb):
            for bx in range(owb):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    _expect_rst(br)
                    pred = [0] * len(comps)
                    eobrun = 0
                blk = coefs[ci][by * pwb + bx]
                if ss == 0:
                    if ah == 0:
                        _dc_first(br, tbl, blk, pred, ci, al, prec)
                    else:
                        _dc_refine(br, blk, al)
                elif ah == 0:
                    eobrun = _ac_first_block(br, tbl, blk, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(
                        br, tbl, blk, ss, se, al, eobrun
                    )
                mcu += 1
    br.align_to_marker()
    return br.pos


def _decode_progressive(
    p: bytes,
    pos: int,
    frame,
    qt,
    huff_dc,
    huff_ac,
    restart_interval: int,
    prec: int = 8,
) -> tuple[int, int, int, bytearray]:
    """Decode a progressive JPEG from its first SOS marker: accumulate
    unquantized coefficients across scans, then dequantize + IDCT once.

    Scale note: like the baseline path this runs per row inside an
    Arrow-batched UDF — the corpus parallelism is Spark's; the codec
    only ever sees one image."""
    fw, fh, comps = frame
    if fw == 0 or fh == 0:
        raise ValueError("malformed JPEG: zero dimension")
    # TIGHTER budget than the baseline path's 1<<26: the progressive
    # coefficient store is Python int lists (~576 B per 64-coef block
    # in CPython — ~9x the 64-byte bytearray block the baseline path
    # streams through), allocated up front from HEADER dims. At the
    # baseline budget a ~200-byte crafted SOF2 header would force
    # >2 GB before any scan data is read — an uncatchable executor
    # OOM, not a resize_ok=false data row. 1<<24 pixels (≈4096x4096,
    # 16.7 MP) covers real smartphone/web photo sizes while bounding
    # the worst case (3-component 4:4:4) near 500 MB transient per
    # blob, one blob at a time per task. Past the budget the row
    # degrades to resize_ok=false (or Pillow when importable) — the
    # same contract as every other decode boundary here.
    if fw * fh > (1 << 24):
        raise ValueError(
            f"decompression bomb: {fw}x{fh} exceeds the progressive "
            "decode budget"
        )
    if len(comps) not in (1, 3):
        raise NotImplementedError(
            f"{len(comps)}-component JPEG (only 1 or 3)"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("malformed JPEG: bad sampling factors")
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    grids = []  # (padded_width_blocks, padded_height_blocks, own_w, own_h)
    coefs = []  # per component: padded-raster list of 64-coef blocks
    for _, hs, vs, _ in comps:
        pwb, phb = mcus_x * hs, mcus_y * vs
        owb = -(-(-(-fw * hs // hmax)) // 8)
        ohb = -(-(-(-fh * vs // vmax)) // 8)
        grids.append((pwb, phb, owb, ohb))
        coefs.append([[0] * 64 for _ in range(pwb * phb)])
    i = pos
    n = len(p)
    seen_scan = False
    while i + 2 <= n:
        if p[i] != 0xFF:
            raise ValueError("malformed JPEG: lost marker sync")
        marker = p[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("malformed JPEG: truncated segment")
        (seglen,) = struct.unpack(">H", p[i + 2 : i + 4])
        seg = p[i + 4 : i + 2 + seglen]
        if marker == 0xC4:  # tables may be redefined between scans
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            i = _progressive_scan(
                p,
                i + 2 + seglen,
                seg,
                frame,
                grids,
                coefs,
                huff_dc,
                huff_ac,
                restart_interval,
                prec,
            )
            seen_scan = True
            continue
        i += 2 + seglen
    if not seen_scan:
        raise ValueError("malformed JPEG: no scan data")
    # dequantize + inverse DCT — once, after every scan has contributed
    planes = []
    for ci, (_, hs, vs, tq) in enumerate(comps):
        quant = qt.get(tq)
        if quant is None:
            raise ValueError("malformed JPEG: missing quant table")
        pwb, phb, _, _ = grids[ci]
        pw = pwb * 8
        plane = bytearray(pw * phb * 8)
        blocks = coefs[ci]
        for by in range(phb):
            oy = by * 8
            for bx in range(pwb):
                c = blocks[by * pwb + bx]
                if any(c):
                    block = _idct_2d([c[z] * quant[z] for z in range(64)], prec)
                else:
                    block = _GRAY_BLOCK  # all-zero block -> level shift
                ox = bx * 8
                for row in range(8):
                    dst = (oy + row) * pw + ox
                    plane[dst : dst + 8] = block[row * 8 : row * 8 + 8]
        planes.append(plane)
    return _planes_to_pixels(fw, fh, comps, planes, mcus_x, hmax, vmax)


_GRAY_BLOCK = bytes([128]) * 64


# ---------------------------------------------------------------------------
# minimal encoder — test fixtures only (Pillow is absent in CI, so real
# baseline streams must be built here). Single quant table of 1s keeps
# the round-trip near-lossless; Huffman tables are the T.81 Annex K
# luminance pair, valid for any symbol the encoder can emit.
# ---------------------------------------------------------------------------

_K3_DC_COUNTS = bytes((0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0))
_K3_DC_SYMBOLS = bytes(range(12))
_K5_AC_COUNTS = bytes((0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D))
_K5_AC_SYMBOLS = bytes((
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
))

# 12-bit encoder tables (Annex K has no 12-bit pair, so these are
# generated canonical codes, valid for anything the encoder can emit):
# DC difference categories reach 16 in 12-bit frames (§F.1.2.1.1) —
# 15 symbols at length 5 plus 2 at length 6 (codes 30/31, the length-6
# all-ones code 63 stays unused per §C.2); AC RRRRSSSS pairs span
# r 0..15 x s 1..14 plus EOB/ZRL = 226 symbols, all at length 8
# (codes 0..225 — the all-ones code 255 stays unused).
_EXT_DC_COUNTS = bytes((0, 0, 0, 0, 15, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
_EXT_DC_SYMBOLS = bytes(range(17))
_EXT_AC_SYMBOLS = bytes(
    sorted({0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 15)})
)
_EXT_AC_COUNTS = bytes((0, 0, 0, 0, 0, 0, 0, len(_EXT_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0))


def _encode_codes(counts: bytes, symbols: bytes) -> dict[int, tuple[int, int]]:
    table = _build_huffman(counts, symbols)
    return {sym: (length, code) for (length, code), sym in table.items()}


def _table_pair(precision: int):
    """(dc_counts, dc_symbols, ac_counts, ac_symbols) for the frame
    precision — one chooser for both encoders, so the twin-stream
    byte-identity guarantee cannot drift."""
    if precision == 12:
        return _EXT_DC_COUNTS, _EXT_DC_SYMBOLS, _EXT_AC_COUNTS, _EXT_AC_SYMBOLS
    return _K3_DC_COUNTS, _K3_DC_SYMBOLS, _K5_AC_COUNTS, _K5_AC_SYMBOLS


def _dqt_payload(quant: list[int], precision: int) -> bytes:
    """DQT marker payload (zigzag order): 8-bit Pq=0 entries for 8-bit
    frames, 16-bit Pq=1 entries for 12-bit frames."""
    if precision == 12:
        return bytes((0x10,)) + b"".join(
            struct.pack(">H", quant[ZIGZAG[k]]) for k in range(64)
        )
    return bytes((0x00,)) + bytes(quant[ZIGZAG[k]] for k in range(64))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        while self.nacc:
            self.write(1, 1)  # pad with 1-bits per the spec


def _fdct_2d(block: list[int], mid: int = 128) -> list[int]:
    """Forward 8x8 DCT of level-shifted samples, rounded to ints."""
    shifted = [s - mid for s in block]
    tmp = [0.0] * 64
    for u in range(8):
        for y in range(8):
            s = 0.0
            for x in range(8):
                s += shifted[y * 8 + x] * _COS[u][x]
            tmp[y * 8 + u] = s
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * _COS[v][y]
            out[v * 8 + u] = int(round(s))
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) for a signed coefficient per §F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _encode_block(bw: _BitWriter, coef: list[int], pred: int, dc_codes, ac_codes) -> int:
    diff = coef[0] - pred
    n, bits = _magnitude(diff)
    if n == 16 and diff != 32768:
        # category 16 carries no magnitude bits, so only +32768 is
        # representable; -32768 would silently decode as +32768
        raise ValueError(f"DC diff {diff} not encodable: category 16 is +32768 only")
    length, code = dc_codes[n]
    bw.write(code, length)
    if n and n != 16:  # 12-bit DC category 16 carries no magnitude bits
        bw.write(bits, n)
    zz = [coef[ZIGZAG[k]] for k in range(64)]
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        n, bits = _magnitude(zz[k])
        length, code = ac_codes[(run << 4) | n]
        bw.write(code, length)
        bw.write(bits, n)
        run = 0
    if run:
        length, code = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return coef[0]


def _plane_block(plane: list[int], pw: int, ph: int, ox: int, oy: int) -> list[int]:
    """8x8 block at (ox, oy) with edge replication past the plane."""
    block = [0] * 64
    for y in range(8):
        sy = min(oy + y, ph - 1)
        row = sy * pw
        for x in range(8):
            block[y * 8 + x] = plane[row + min(ox + x, pw - 1)]
    return block


def _prep_planes(
    w: int,
    h: int,
    pixels: bytes,
    channels: int,
    sampling: tuple[int, int],
    quant: list[int] | None,
    precision: int = 8,
):
    """Shared encoder front end: validate, convert RGB->YCbCr, apply
    chroma subsampling. Returns (comps, planes, pdims, quant).

    ``precision=12``: grayscale only (the RGB->YCbCr constants here are
    8-bit-centric), samples 0..4095 in any int sequence, quant entries
    up to 65535 (emitted as a 16-bit DQT)."""
    if len(pixels) != w * h * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if channels not in (1, 3):
        raise ValueError("encoder supports 1 (gray) or 3 (RGB) channels")
    if precision == 12:
        if channels != 1:
            raise ValueError("12-bit encoding supports grayscale only")
        if any(not 0 <= v <= 4095 for v in pixels):
            raise ValueError("12-bit samples must be in 0..4095")
    elif precision != 8:
        raise ValueError("precision must be 8 or 12")
    qmax = 65535 if precision == 12 else 255
    if quant is None:
        quant = [1] * 64
    if len(quant) != 64 or any(not 1 <= q <= qmax for q in quant):
        raise ValueError(f"quant must be 64 entries in 1..{qmax}")
    hs, vs = sampling
    if channels == 1:
        comps = [(1, (1, 1))]
        planes = [list(pixels)]
        pdims = [(w, h)]
    else:
        yp, cbp, crp = [], [], []
        for i in range(0, len(pixels), 3):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            yv = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
            yp.append(max(0, min(255, int(yv + 0.5))))
            cbp.append(max(0, min(255, int(cb + 0.5))))
            crp.append(max(0, min(255, int(cr + 0.5))))
        comps = [(1, (hs, vs)), (2, (1, 1)), (3, (1, 1))]
        cw, ch_ = -(-w // hs), -(-h // vs)

        def down(p: list[int]) -> list[int]:
            if (hs, vs) == (1, 1):
                return p
            out = []
            for y in range(ch_):
                for x in range(cw):
                    acc = cnt = 0
                    for dy in range(vs):
                        for dx in range(hs):
                            sx, sy = x * hs + dx, y * vs + dy
                            if sx < w and sy < h:
                                acc += p[sy * w + sx]
                                cnt += 1
                    out.append((acc + cnt // 2) // cnt)
            return out

        planes = [yp, down(cbp), down(crp)]
        pdims = [(w, h), (cw, ch_), (cw, ch_)]
    return comps, planes, pdims, quant


def encode_baseline(
    w: int,
    h: int,
    pixels: bytes,
    channels: int = 1,
    sampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    quant: list[int] | None = None,
    precision: int = 8,
) -> bytes:
    """Encode 8-bit pixels (grayscale or interleaved RGB) as a real
    baseline-sequential JPEG: unity quant table by default (near-
    lossless — a round-trip differs only by DCT/color rounding), Annex K
    luminance Huffman tables for every component, optional luma
    subsampling (``sampling=(2,2)`` gives 4:2:0 with box-averaged
    chroma) and restart markers. ``quant`` takes a 64-entry NATURAL-
    order table (values 1..255) — a non-flat table exercises the
    decoder's zigzag<->natural dequantization pairing, which an all-1s
    table cannot distinguish. Test-fixture tier: correctness over
    speed.

    ``precision=12`` emits an EXTENDED SEQUENTIAL (SOF1) grayscale
    frame: samples 0..4095 (any int sequence), level shift 2048, a
    16-bit (Pq=1) DQT, and the generated 12-bit Huffman pair (DC
    categories to 16, AC sizes to 14)."""
    comps, planes, pdims, quant = _prep_planes(
        w, h, pixels, channels, sampling, quant, precision
    )
    dc_counts, dc_symbols, ac_counts, ac_symbols = _table_pair(precision)
    mid = 1 << (precision - 1)
    dc_codes = _encode_codes(dc_counts, dc_symbols)
    ac_codes = _encode_codes(ac_counts, ac_symbols)
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    bw = _BitWriter()
    preds = [0] * len(comps)
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (_, (chs, cvs)) in enumerate(comps):
                pw, ph = pdims[ci]
                for by in range(cvs):
                    for bx in range(chs):
                        block = _plane_block(
                            planes[ci], pw, ph,
                            (mx * chs + bx) * 8, (my * cvs + by) * 8,
                        )
                        f = _fdct_2d(block, mid)
                        qcoef = [
                            int(round(f[i] / quant[i])) for i in range(64)
                        ]
                        preds[ci] = _encode_block(
                            bw, qcoef, preds[ci], dc_codes, ac_codes
                        )
            mcu += 1
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", 2 + len(payload)) + payload

    # DQT payload is in ZIGZAG scan order; quant is natural-order
    dqt = seg(0xDB, _dqt_payload(quant, precision))
    sof_comps = b"".join(
        bytes((cid, (chs << 4) | cvs, 0)) for cid, (chs, cvs) in comps
    )
    sof_marker = 0xC1 if precision == 12 else 0xC0
    sof = seg(
        sof_marker, struct.pack(">BHHB", precision, h, w, len(comps)) + sof_comps
    )
    dht = seg(
        0xC4,
        bytes((0x00,)) + dc_counts + dc_symbols
        + bytes((0x10,)) + ac_counts + ac_symbols,
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos_comps = b"".join(bytes((cid, 0x00)) for cid, _ in comps)
    sos = seg(0xDA, bytes((len(comps),)) + sos_comps + bytes((0, 63, 0)))
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(bw.out) + b"\xff\xd9"
    )


def encode_baseline_gray(w: int, h: int, pixels: bytes) -> bytes:
    """Grayscale convenience wrapper over ``encode_baseline``."""
    return encode_baseline(w, h, pixels, channels=1)


# ---------------------------------------------------------------------------
# progressive (SOF2) encoder — test fixtures only, like the baseline
# encoder: real spec-valid streams so the progressive decoder is
# exercised without Pillow. Emits the same quantized coefficients as
# encode_baseline, so a progressive stream decodes byte-identically to
# its baseline twin.
# ---------------------------------------------------------------------------


def _quantized_blocks(comps, planes, pdims, quant, mcus_x, mcus_y, mid=128):
    """Per component: padded-raster list of quantized coefficient
    blocks (natural order) — the shared input of every scan."""
    blocks = []
    for ci, (_, (chs, cvs)) in enumerate(comps):
        pw, ph = pdims[ci]
        bl = []
        for by in range(mcus_y * cvs):
            for bx in range(mcus_x * chs):
                f = _fdct_2d(_plane_block(planes[ci], pw, ph, bx * 8, by * 8), mid)
                bl.append([int(round(f[i] / quant[i])) for i in range(64)])
        blocks.append(bl)
    return blocks


def _enc_ac_first_block(bw, blk, ss, se, al, ac_codes) -> None:
    """§G.1.2.2 encode side, per-block EOB (an EOB run of exactly 1 —
    the plain 0x00 symbol — is always legal, so no cross-block run
    buffering is needed at fixture scale)."""
    run = 0
    for k in range(ss, se + 1):
        v = blk[ZIGZAG[k]]
        av = abs(v) >> al  # AC point transform truncates toward zero
        if av == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        n, bits = _magnitude(av if v >= 0 else -av)
        length, code = ac_codes[(run << 4) | n]
        bw.write(code, length)
        bw.write(bits, n)
        run = 0
    if run:
        length, code = ac_codes[0x00]
        bw.write(code, length)


def _enc_ac_refine_block(bw, blk, ss, se, al, ac_codes) -> None:
    """§G.1.2.3 encode side. Correction bits for already-nonzero
    coefficients are BUFFERED and flushed right after the next Huffman
    symbol (ZRL / new-coefficient / EOB) — the decoder reads them while
    crossing those positions, so stream order must be symbol-then-bits.
    The zero run counts only still-zero positions; already-nonzero ones
    are transparent to it (mirrors the decode loop exactly)."""
    run = 0
    buffered: list[int] = []

    def flush() -> None:
        for b in buffered:
            bw.write(b, 1)
        buffered.clear()

    for k in range(ss, se + 1):
        v = blk[ZIGZAG[k]]
        av = abs(v) >> al
        if av == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
            flush()
        if av > 1:
            # previously nonzero: one correction bit (bit Al of |v|)
            buffered.append(av & 1)
            continue
        # newly nonzero at this precision: (run, 1) + sign bit
        length, code = ac_codes[(run << 4) | 1]
        bw.write(code, length)
        bw.write(1 if v >= 0 else 0, 1)
        flush()
        run = 0
    if run or buffered:
        length, code = ac_codes[0x00]
        bw.write(code, length)
        flush()


def encode_progressive(
    w: int,
    h: int,
    pixels: bytes,
    channels: int = 1,
    sampling: tuple[int, int] = (1, 1),
    quant: list[int] | None = None,
    successive: bool = False,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode 8-bit pixels as a progressive (SOF2) JPEG.

    ``precision=12``: grayscale 12-bit samples (see ``encode_baseline``)
    emitted as a 12-bit SOF2 frame with a 16-bit DQT and the generated
    12-bit Huffman pair.

    ``successive=False``: spectral selection only — one interleaved DC
    scan, then one full-band AC scan per component. ``successive=True``
    adds successive approximation: DC and AC first scans at Al=1 with
    the AC band split (1-5, 6-63), then DC/AC refinement scans to Al=0
    — exercising every progressive decode path (EOB tails, correction
    bits, new-coefficient placement). Both forms carry the same
    quantized coefficients as ``encode_baseline``, so the decoded
    pixels are byte-identical to the baseline stream's."""
    comps, planes, pdims, quant = _prep_planes(
        w, h, pixels, channels, sampling, quant, precision
    )
    dc_counts, dc_symbols, ac_counts, ac_symbols = _table_pair(precision)
    dc_codes = _encode_codes(dc_counts, dc_symbols)
    ac_codes = _encode_codes(ac_counts, ac_symbols)
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    blocks = _quantized_blocks(
        comps, planes, pdims, quant, mcus_x, mcus_y, 1 << (precision - 1)
    )
    grids = []  # (padded_width_blocks, own_w_blocks, own_h_blocks)
    for ci, (_, (chs, cvs)) in enumerate(comps):
        pw, ph = pdims[ci]
        grids.append((mcus_x * chs, -(-pw // 8), -(-ph // 8)))

    def rst_marker(bw: _BitWriter, state: list[int]) -> None:
        bw.flush()
        bw.out += bytes((0xFF, 0xD0 + state[0]))
        state[0] = (state[0] + 1) % 8

    def dc_scan(al: int, refine: bool) -> bytes:
        bw = _BitWriter()
        preds = [0] * len(comps)
        mcu, rst = 0, [0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    rst_marker(bw, rst)
                    preds = [0] * len(comps)
                for ci, (_, (chs, cvs)) in enumerate(comps):
                    pwb = grids[ci][0]
                    for by in range(cvs):
                        for bx in range(chs):
                            dc = blocks[ci][
                                (my * cvs + by) * pwb + (mx * chs + bx)
                            ][0]
                            if refine:
                                bw.write((dc >> al) & 1, 1)
                            else:
                                # DC point transform: arithmetic shift
                                v = dc >> al
                                n, bits = _magnitude(v - preds[ci])
                                if n == 16 and v - preds[ci] != 32768:
                                    raise ValueError(
                                        f"DC diff {v - preds[ci]} not encodable:"
                                        " category 16 is +32768 only"
                                    )
                                length, code = dc_codes[n]
                                bw.write(code, length)
                                # n != 16: category 16 carries no
                                # magnitude bits (parity with
                                # _encode_block; unreachable with this
                                # DCT normalization, guarded anyway)
                                if n and n != 16:
                                    bw.write(bits, n)
                                preds[ci] = v
                mcu += 1
        bw.flush()
        return bytes(bw.out)

    def ac_scan(ci: int, ss: int, se: int, al: int, refine: bool) -> bytes:
        bw = _BitWriter()
        pwb, owb, ohb = grids[ci]
        mcu, rst = 0, [0]
        for by in range(ohb):
            for bx in range(owb):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    rst_marker(bw, rst)
                blk = blocks[ci][by * pwb + bx]
                if refine:
                    _enc_ac_refine_block(bw, blk, ss, se, al, ac_codes)
                else:
                    _enc_ac_first_block(bw, blk, ss, se, al, ac_codes)
                mcu += 1
        bw.flush()
        return bytes(bw.out)

    def seg(marker: int, payload: bytes) -> bytes:
        return (
            bytes((0xFF, marker))
            + struct.pack(">H", 2 + len(payload))
            + payload
        )

    def sos(scan_comps, ss: int, se: int, ah: int, al: int) -> bytes:
        payload = bytes((len(scan_comps),))
        for cid in scan_comps:
            payload += bytes((cid, 0x00))  # DC table 0, AC table 0
        payload += bytes((ss, se, (ah << 4) | al))
        return seg(0xDA, payload)

    all_ids = [cid for cid, _ in comps]
    scans: list[tuple[list[int], int, int, int, int, bytes]] = []
    if not successive:
        scans.append((all_ids, 0, 0, 0, 0, dc_scan(0, refine=False)))
        for ci, (cid, _) in enumerate(comps):
            scans.append(([cid], 1, 63, 0, 0, ac_scan(ci, 1, 63, 0, False)))
    else:
        scans.append((all_ids, 0, 0, 0, 1, dc_scan(1, refine=False)))
        for ci, (cid, _) in enumerate(comps):
            scans.append(([cid], 1, 5, 0, 1, ac_scan(ci, 1, 5, 1, False)))
            scans.append(([cid], 6, 63, 0, 1, ac_scan(ci, 6, 63, 1, False)))
        scans.append((all_ids, 0, 0, 1, 0, dc_scan(0, refine=True)))
        for ci, (cid, _) in enumerate(comps):
            scans.append(([cid], 1, 5, 1, 0, ac_scan(ci, 1, 5, 0, True)))
            scans.append(([cid], 6, 63, 1, 0, ac_scan(ci, 6, 63, 0, True)))

    dqt = seg(0xDB, _dqt_payload(quant, precision))
    sof_comps = b"".join(
        bytes((cid, (chs << 4) | cvs, 0)) for cid, (chs, cvs) in comps
    )
    sof = seg(0xC2, struct.pack(">BHHB", precision, h, w, len(comps)) + sof_comps)
    dht = seg(
        0xC4,
        bytes((0x00,)) + dc_counts + dc_symbols
        + bytes((0x10,)) + ac_counts + ac_symbols,
    )
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    out = b"\xff\xd8" + dqt + sof + dht + dri
    for scan_comps, ss, se, ah, al, data in scans:
        out += sos(scan_comps, ss, se, ah, al) + data
    return out + b"\xff\xd9"

"""Foreign-shaped progressive JPEG decode coverage (round-9 ADVICE #5).

The module's own progressive encoder emits ONE scan script: 4:4:4,
single-stage Al=1, EOB runs of length 1, Annex K tables. The decoder
claims the general T.81 G.1.2 scan algebra, previously exercised only
by that sibling encoder. These tests build progressive streams a
FOREIGN encoder (libjpeg's default scan script family) would emit —

- EOBn runs spanning many blocks (G.1.2.2), with non-Annex-K Huffman
  tables that actually carry EOBn symbols,
- multi-stage successive approximation chains Al=2 -> 1 -> 0 for both
  DC and AC (G.1.2.3 applied twice),
- 4:2:0 and 4:2:2 subsampled progressive scan scripts (interleaved DC,
  per-component AC on the component's own block grid),

from the SAME quantized coefficients as a reference stream, and assert
bit-exact pixel equality of the two decodes. The scan encoders here
are written directly against the T.81 scan algebra (EOBRUN
accumulation with deferred correction-bit buffering, the
encode_mcu_AC_refine shape), independently of the module's span-based
refinement encoder, so the decoder is cross-checked against a second
reading of the spec rather than its own sibling.

No Spark session needed; pure numpy.
"""

from __future__ import annotations

import struct

import numpy as np

from fugue_warehouses_spark.extensions import jpeg as J

RNG = np.random.default_rng(97)


# ------------------------------------------------------- stream pieces


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt(tid: int, q: np.ndarray) -> bytes:
    return _seg(
        0xDB, bytes([tid]) + bytes(int(x) for x in q.reshape(-1)[J._ZIGZAG])
    )


def _dht(cls: int, tid: int, bits, vals) -> bytes:
    return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


def _sof(marker: int, h: int, w: int, comps) -> bytes:
    """comps: [(cid, ch, cv, qsel)]"""
    payload = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, qsel in comps:
        payload += bytes([cid, (ch << 4) | cv, qsel])
    return _seg(marker, payload)


def _flat_table(symbols) -> tuple[list, list]:
    """All symbols at one code length L with K <= 2^L - 1 (the all-ones
    code of any length stays reserved per T.81 C.2) — a deliberately
    non-Annex-K table so DHT parsing is exercised on foreign tables."""
    syms = sorted(set(symbols))
    L = 1
    while (1 << L) - 1 < len(syms):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms


# ----------------------------------------------- coefficient utilities


def _gray_coefs(pixels: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficients [bh, bw, 64] — identical to what
    encode_jpeg entropy-codes (shared front half), so decode equality
    checks the scan algebra alone."""
    comps, gray = J._quantized_components(pixels)
    assert gray
    return comps[0]


def _subsampled_coefs(pixels: np.ndarray, ch: int, cv: int):
    """Per-component quantized zigzag grids for a subsampled encode:
    luma full-res, chroma box-averaged by (cv_max/cv, ch_max/ch) per
    component — the conventional downsample-then-DCT front half."""
    ycc = J._rgb_to_ycbcr(pixels)
    out = []
    for ci in range(3):
        chan = ycc[..., ci]
        if ci > 0:
            fy, fx = cv, ch  # chroma factors relative to luma (2,1)=max
            h, w = chan.shape
            chan = chan.reshape(h // fy, fy, w // fx, fx).mean(axis=(1, 3))
        blocks, bh, bwid = J._blockify(chan)
        q = J._QL if ci == 0 else J._QC
        coeffs = np.einsum("ux,nxy,vy->nuv", J._DCT8, blocks - 128.0, J._DCT8)
        quant = np.round(coeffs / q).astype(np.int64)
        out.append(quant.reshape(bh, bwid, 64)[..., J._ZIGZAG])
    return out


# ------------------------------------------------ baseline test encoder


def _encode_baseline_subsampled(coef_grids, h, w, samp) -> bytes:
    """SOF0 interleaved stream over prebuilt coefficient grids with
    chroma subsampling (the module encoder is 4:4:4-only, so the
    subsampled reference stream is built here, Annex K tables)."""
    comps = [(1, samp[0][0], samp[0][1], 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, J._QL) + _dqt(1, J._QC)
    out += _sof(0xC0, h, w, comps)
    out += _dht(0, 0, *J._DC_L) + _dht(1, 0, *J._AC_L)
    out += _dht(0, 1, *J._DC_C) + _dht(1, 1, *J._AC_C)
    out += J._sos_header([(1, 0, 0), (2, 1, 1), (3, 1, 1)], 0, 63, 0, 0)
    dc_tabs = [J._huff_codes(*J._DC_L)] + [J._huff_codes(*J._DC_C)] * 2
    ac_tabs = [J._huff_codes(*J._AC_L)] + [J._huff_codes(*J._AC_C)] * 2
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    bw = J._BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, ch, cv, _) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        row = coef_grids[ci][my * cv + by, mx * ch + bx]
                        dc = int(row[0])
                        cat, bits_v = J._magnitude(dc - preds[ci])
                        code, ln = dc_tabs[ci][cat]
                        bw.write(code, ln)
                        bw.write(bits_v, cat)
                        preds[ci] = dc
                        run = 0
                        nz = [k for k in range(1, 64) if row[k] != 0]
                        last = nz[-1] if nz else 0
                        for k in range(1, last + 1):
                            v = int(row[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_tabs[ci][0xF0]
                                bw.write(code, ln)
                                run -= 16
                            cat, bits_v = J._magnitude(v)
                            code, ln = ac_tabs[ci][(run << 4) | cat]
                            bw.write(code, ln)
                            bw.write(bits_v, cat)
                            run = 0
                        if last < 63:
                            code, ln = ac_tabs[ci][0x00]
                            bw.write(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------- foreign progressive enc


class _ForeignProgressive:
    """Progressive scan-script writer over prebuilt coefficient grids,
    implementing the general G.1.2 algebra: EOBRUN accumulation across
    blocks (first AND refinement scans, deferred correction bits) and
    arbitrary Ah/Al stages. Huffman tables are flat non-Annex-K tables
    built from the symbols each scan actually uses."""

    def __init__(self, coef_grids, h, w, comps):
        # comps: [(cid, ch, cv, qsel)]; grids MCU-padded == unpadded
        # (test dims are MCU multiples)
        self.grids = coef_grids
        self.h, self.w = h, w
        self.comps = comps
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.out = bytearray(b"\xff\xd8")
        self.out += _dqt(0, J._QL)
        if len(comps) > 1:
            self.out += _dqt(1, J._QC)
        self.out += _sof(0xC2, h, w, comps)
        self._next_tid = 0

    def _emit_dht(self, cls: int, symbols) -> int:
        tid = self._next_tid % 4
        self._next_tid += 1
        bits, vals = _flat_table(symbols)
        self.out += _dht(cls, tid, bits, vals)
        return tid

    def _blocks(self, ci):
        g = self.grids[ci]
        for by in range(g.shape[0]):
            for bx in range(g.shape[1]):
                yield g[by, bx]

    # ---- DC scans (interleaved when ns > 1)
    def dc_first(self, Al: int) -> None:
        symbols = set()
        diffs_per_comp: list[list[int]] = []
        for ci in range(len(self.comps)):
            pred, diffs = 0, []
            for row in self._blocks(ci):
                dc = int(row[0]) >> Al
                diffs.append(dc - pred)
                pred = dc
            diffs_per_comp.append(diffs)
            symbols |= {J._magnitude(d)[0] for d in diffs}
        tid = self._emit_dht(0, symbols)
        tab = J._huff_codes(*_flat_table(symbols))
        self.out += J._sos_header(
            [(cid, tid, 0) for cid, _, _, _ in self.comps], 0, 0, 0, Al
        )
        bw = J._BitWriter()
        # interleaved MCU order (ns>1) or plain block order (ns==1) —
        # both walk each component's grid row-major per MCU
        idx = [0] * len(self.comps)
        flat = [list(self._blocks(ci)) for ci in range(len(self.comps))]
        preds = [0] * len(self.comps)
        for my in range(self.mcuy):
            for mx in range(self.mcux):
                for ci, (cid, ch, cv, _) in enumerate(self.comps):
                    for by in range(cv):
                        for bx in range(ch):
                            row = self.grids[ci][my * cv + by, mx * ch + bx]
                            dc = int(row[0]) >> Al
                            cat, bits_v = J._magnitude(dc - preds[ci])
                            code, ln = tab[cat]
                            bw.write(code, ln)
                            bw.write(bits_v, cat)
                            preds[ci] = dc
        del idx, flat
        self.out += bw.flush()

    def dc_refine(self, Al: int) -> None:
        self.out += J._sos_header(
            [(cid, 0, 0) for cid, _, _, _ in self.comps], 0, 0, Al + 1, Al
        )
        bw = J._BitWriter()
        for my in range(self.mcuy):
            for mx in range(self.mcux):
                for ci, (cid, ch, cv, _) in enumerate(self.comps):
                    for by in range(cv):
                        for bx in range(ch):
                            v = int(self.grids[ci][my * cv + by, mx * ch + bx][0])
                            bw.write((v >> Al) & 1, 1)
        self.out += bw.flush()

    # ---- AC scans (non-interleaved, one component each)
    def ac_first(self, ci: int, Al: int, Ss: int = 1, Se: int = 63) -> None:
        cid = self.comps[ci][0]
        # gather symbols (incl. the EOBn symbols this scan will need)
        blocks = list(self._blocks(ci))
        symbols = {0xF0}
        eobrun = 0
        max_eob_r = 0
        for row in blocks:
            sv = [
                (1 if int(v) > 0 else -1) * (abs(int(v)) >> Al)
                for v in row
            ]
            nz = [k for k in range(Ss, Se + 1) if sv[k] != 0]
            if not nz:
                eobrun += 1
                max_eob_r = max(max_eob_r, eobrun.bit_length() - 1)
                continue
            max_eob_r = max(max_eob_r, eobrun.bit_length() - 1)
            eobrun = 1 if nz[-1] < Se else 0
            run = 0
            for k in range(Ss, nz[-1] + 1):
                if sv[k] == 0:
                    run += 1
                    continue
                run %= 16
                symbols.add((run << 4) | J._magnitude(sv[k])[0])
                run = 0
        max_eob_r = max(max_eob_r, eobrun.bit_length() - 1)
        symbols |= {r << 4 for r in range(max_eob_r + 1)}
        tid = self._emit_dht(1, symbols)
        tab = J._huff_codes(*_flat_table(symbols))
        self.out += J._sos_header([(cid, 0, tid)], Ss, Se, 0, Al)
        bw = J._BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            code, ln = tab[r << 4]
            bw.write(code, ln)
            bw.write(eobrun - (1 << r), r)
            eobrun = 0

        for row in blocks:
            sv = [
                (1 if int(v) > 0 else -1) * (abs(int(v)) >> Al)
                for v in row
            ]
            nz = [k for k in range(Ss, Se + 1) if sv[k] != 0]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for k in range(Ss, nz[-1] + 1):
                if sv[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = tab[0xF0]
                    bw.write(code, ln)
                    run -= 16
                cat, bits_v = J._magnitude(sv[k])
                code, ln = tab[(run << 4) | cat]
                bw.write(code, ln)
                bw.write(bits_v, cat)
                run = 0
            if nz[-1] < Se:
                eobrun = 1
        flush_eob()
        self.out += bw.flush()

    def ac_refine(self, ci: int, Al: int, Ss: int = 1, Se: int = 63) -> None:
        """G.1.2.3 with cross-block EOBRUN and deferred correction bits
        (the encode_mcu_AC_refine shape): an EOBn's appended bits carry
        the correction bits of every block the run covers, in block
        order; ZRL consumes exactly the corrections crossed among its
        16 zero-history positions."""
        cid = self.comps[ci][0]
        Ah = Al + 1
        blocks = list(self._blocks(ci))
        # symbol gathering: runs of zero-HISTORY positions before each
        # newly significant coefficient, mod ZRL
        symbols = {0xF0}
        eobrun = 0
        max_r = 0
        for row in blocks:
            newly = False
            run = 0
            for k in range(Ss, Se + 1):
                v = int(row[k])
                hist = abs(v) >> Ah
                cur = abs(v) >> Al
                if hist != 0:
                    continue
                if cur == 0:
                    run += 1
                    continue
                newly = True
                symbols.add(((run % 16) << 4) | 1)
                run = 0
            last_new = max(
                (
                    k
                    for k in range(Ss, Se + 1)
                    if (abs(int(row[k])) >> Ah) == 0
                    and (abs(int(row[k])) >> Al) != 0
                ),
                default=None,
            )
            if last_new is None or last_new < Se:
                eobrun += 1
                max_r = max(max_r, eobrun.bit_length() - 1)
            else:
                max_r = max(max_r, eobrun.bit_length() - 1)
                eobrun = 0
            del newly
        max_r = max(max_r, eobrun.bit_length() - 1)
        symbols |= {r << 4 for r in range(max_r + 1)}
        tid = self._emit_dht(1, symbols)
        tab = J._huff_codes(*_flat_table(symbols))
        self.out += J._sos_header([(cid, 0, tid)], Ss, Se, Ah, Al)
        bw = J._BitWriter()
        eobrun = 0
        pending_corr: list[int] = []  # correction bits riding the EOBn

        def flush_eob():
            nonlocal eobrun, pending_corr
            if not eobrun:
                assert not pending_corr
                return
            r = eobrun.bit_length() - 1
            code, ln = tab[r << 4]
            bw.write(code, ln)
            bw.write(eobrun - (1 << r), r)
            for b in pending_corr:
                bw.write(b, 1)
            pending_corr = []
            eobrun = 0

        for row in blocks:
            # span since the last emitted symbol: ('z',) zero-history,
            # ('c', bit) correction for an already-significant position
            span: list[tuple[str, int]] = []
            emitted_any = False
            last_new = max(
                (
                    k
                    for k in range(Ss, Se + 1)
                    if (abs(int(row[k])) >> Ah) == 0
                    and (abs(int(row[k])) >> Al) != 0
                ),
                default=None,
            )
            for k in range(Ss, (last_new if last_new is not None else 0) + 1):
                v = int(row[k])
                hist = abs(v) >> Ah
                cur = abs(v) >> Al
                if hist != 0:
                    span.append(("c", cur & 1))
                    continue
                if cur == 0:
                    span.append(("z", 0))
                    continue
                # newly significant: flush any pending EOB run first
                flush_eob()
                emitted_any = True
                while sum(1 for t, _ in span if t == "z") > 15:
                    code, ln = tab[0xF0]
                    bw.write(code, ln)
                    zseen, idx = 0, 0
                    while True:
                        t, b = span[idx]
                        idx += 1
                        if t == "z":
                            zseen += 1
                            if zseen == 16:
                                break
                        else:
                            bw.write(b, 1)
                    span = span[idx:]
                r = sum(1 for t, _ in span if t == "z")
                code, ln = tab[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if v > 0 else 0, 1)
                for t, b in span:
                    if t == "c":
                        bw.write(b, 1)
                span = []
            if last_new is not None and last_new == Se:
                # block ends exactly on a newly-significant coefficient
                assert emitted_any and not span
                continue
            # EOB covers the tail: buffer its corrections for the flush
            for k in range((last_new + 1) if last_new is not None else Ss,
                           Se + 1):
                v = int(row[k])
                if (abs(v) >> Ah) != 0:
                    pending_corr.append((abs(v) >> Al) & 1)
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
        flush_eob()
        self.out += bw.flush()

    def finish(self) -> bytes:
        return bytes(self.out + b"\xff\xd9")


# -------------------------------------------------------------- tests


def test_eobn_runs_span_blocks_gray():
    """EOBn runs > 1 (first scan) + refinement EOB runs with deferred
    correction bits: mostly-flat image -> long runs of AC-empty blocks.
    Decode must equal the baseline decode of the same coefficients."""
    px = np.full((48, 48), 128, dtype=np.uint8)
    px[8:16, 8:16] = RNG.integers(0, 256, (8, 8))  # one textured block
    px[40:48, 24:32] = RNG.integers(0, 256, (8, 8))  # and another
    coefs = _gray_coefs(px)
    enc = _ForeignProgressive([coefs], 48, 48, [(1, 1, 1, 0)])
    enc.dc_first(Al=1)
    enc.dc_refine(Al=0)
    enc.ac_first(0, Al=1)
    enc.ac_refine(0, Al=0)
    data = enc.finish()
    assert J._is_progressive(data)
    # the stream really exercises EOBn > 1: some emitted AC table must
    # carry an EOBn symbol with r >= 1 (run length >= 2) — i.e. the
    # decode equality below is not vacuously re-testing the EOB=1 path
    pos = 2
    found_eobn = False
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9):
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xC4:
            seg = data[pos + 2 : pos + seglen]
            cls = seg[0] >> 4
            vals = seg[17 : 17 + sum(seg[1:17])]
            if cls == 1 and any(
                v & 0x0F == 0 and 1 <= (v >> 4) <= 14 for v in vals
            ):
                found_eobn = True
        if marker == 0xDA:
            # skip the entropy-coded scan body to the next marker
            pos = J._scan_end(data, pos + seglen)
            continue
        pos += seglen
    assert found_eobn, "no EOBn symbol in any AC table — test is vacuous"
    ref = J.decode_jpeg(J.encode_jpeg(px))
    got = J.decode_jpeg(data)
    assert np.array_equal(got, ref)


def test_multi_stage_al_chain_gray():
    """Successive approximation Al=2 -> 1 -> 0 for DC and AC — two
    chained refinement stages, a shape the module encoder never emits."""
    x = np.linspace(0, 255, 32)
    px = (np.add.outer(x, x) / 2 + RNG.integers(0, 64, (32, 32))).clip(
        0, 255
    ).astype(np.uint8)
    coefs = _gray_coefs(px)
    enc = _ForeignProgressive([coefs], 32, 32, [(1, 1, 1, 0)])
    enc.dc_first(Al=2)
    enc.dc_refine(Al=1)
    enc.dc_refine(Al=0)
    enc.ac_first(0, Al=2)
    enc.ac_refine(0, Al=1)
    enc.ac_refine(0, Al=0)
    got = J.decode_jpeg(enc.finish())
    ref = J.decode_jpeg(J.encode_jpeg(px))
    assert np.array_equal(got, ref)


def test_spectral_bands_with_eobn_gray():
    """Split spectral selection (1-5, 6-63) with EOBn in both bands +
    an Al chain — the full libjpeg default-script shape."""
    px = np.full((64, 64), 200, dtype=np.uint8)
    px[:16, :16] = RNG.integers(0, 256, (16, 16))
    coefs = _gray_coefs(px)
    enc = _ForeignProgressive([coefs], 64, 64, [(1, 1, 1, 0)])
    enc.dc_first(Al=1)
    enc.dc_refine(Al=0)
    enc.ac_first(0, Al=2, Ss=1, Se=5)
    enc.ac_first(0, Al=2, Ss=6, Se=63)
    enc.ac_refine(0, Al=1, Ss=1, Se=5)
    enc.ac_refine(0, Al=1, Ss=6, Se=63)
    enc.ac_refine(0, Al=0, Ss=1, Se=5)
    enc.ac_refine(0, Al=0, Ss=6, Se=63)
    got = J.decode_jpeg(enc.finish())
    ref = J.decode_jpeg(J.encode_jpeg(px))
    assert np.array_equal(got, ref)


def _subsampled_case(samp_y, h=32, w=32):
    px = RNG.integers(0, 256, (h, w, 3)).astype(np.uint8)
    ch, cv = samp_y
    grids = _subsampled_coefs(px, ch, cv)
    baseline = _encode_baseline_subsampled(grids, h, w, [(ch, cv)])
    comps = [(1, ch, cv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    enc = _ForeignProgressive(grids, h, w, comps)
    enc.dc_first(Al=1)
    enc.dc_refine(Al=0)
    for ci in range(3):
        enc.ac_first(ci, Al=1)
    for ci in range(3):
        enc.ac_refine(ci, Al=0)
    return baseline, enc.finish()


def test_progressive_420_matches_baseline_420():
    """4:2:0 progressive scans (interleaved DC over 2x2-luma MCUs,
    per-component AC on each component's own block grid) decode
    identically to the SOF0 stream over the same coefficients."""
    baseline, prog = _subsampled_case((2, 2))
    assert J._is_progressive(prog) and not J._is_progressive(baseline)
    ref = J.decode_jpeg(baseline)
    got = J.decode_jpeg(prog)
    assert np.array_equal(got, ref)


def test_progressive_422_matches_baseline_422():
    baseline, prog = _subsampled_case((2, 1))
    ref = J.decode_jpeg(baseline)
    got = J.decode_jpeg(prog)
    assert np.array_equal(got, ref)

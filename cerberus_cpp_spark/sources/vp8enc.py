"""Minimal in-repo VP8 key-frame ENCODER — RFC 6386 (public spec).

Purpose (round 4): give the in-repo RFC 6386 decoder
(``vp8codec.py``) conformance food that libwebp's encoder never
emits — in particular SIMPLE-filter streams and nonzero sharpness
levels, which the simple WebP encode API cannot produce — plus
lossless-of-libwebp roundtrip evidence that works even in
environments without the native library. The encoder is deliberately
small: i16 luma modes only (DC/V/H/TM, chosen per macroblock by SSD),
no segmentation, single token partition, default coefficient
probabilities. Every stream it emits is a fully conforming VP8 key
frame: libwebp decodes it, and the conformance tests assert
libwebp's pixels == our decoder's pixels on our own streams.

Encoder-side reconstruction reuses the decoder's predictors,
dequantizer and inverse transforms, so prediction feedback matches
any conforming decoder exactly; the loop-filter parameters written to
the header only affect decoder-side output (intra prediction uses
unfiltered reconstruction), which is what makes arbitrary
(level, sharpness, simple) combinations safe to emit.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .vp8codec import (
    DC_PRED,
    H_PRED,
    TM_PRED,
    V_PRED,
    _dequant_factors,
    _FrameHeader,
    _idct4x4,
    _iwht4x4,
    _LoopFilterParams,
    _pred_block,
    _Segmentation,
)
from .vp8tables import (
    CAT_BASES,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_UPDATE_PROBS,
    DEFAULT_COEFF_PROBS,
    KF_UV_MODE_PROBS,
    KF_YMODE_PROBS,
    KF_YMODE_TREE,
    UV_MODE_TREE,
    ZIGZAG,
)


class BoolEncoder:
    """RFC 6386 §8.3 boolean encoder (carry-propagating)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i < 0:
            raise OverflowError("bool-encoder carry out of stream")
        self.out[i] += 1

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            if self.bottom >= 1 << 32:
                self._carry()
                self.bottom &= 0xFFFFFFFF
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def put_literal(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.put((value >> i) & 1, 128)

    def put_tree(self, tree, probs, value: int) -> None:
        # walk from the root, at each node choosing the child whose
        # subtree contains `value`
        path = self._tree_path(tree, value)
        i = 0
        for bit in path:
            self.put(bit, probs[i >> 1])
            i = tree[i + bit]
            if i <= 0:
                break

    @staticmethod
    def _tree_path(tree, value: int) -> List[int]:
        # DFS for the leaf ~value, recording branch bits
        target = -value

        def rec(i: int, path: List[int]):
            for bit in (0, 1):
                nxt = tree[i + bit]
                if nxt == target and nxt <= 0:
                    return path + [bit]
                if nxt > 0:
                    got = rec(nxt, path + [bit])
                    if got is not None:
                        return got
            return None

        out = rec(0, [])
        if out is None:
            raise ValueError(f"value {value} not in tree")
        return out

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


# --- forward transforms (libvpx reference integer versions) ----------

def _fdct4x4(block: np.ndarray) -> List[int]:
    """Forward 4x4 DCT approximately inverting ``_idct4x4`` (exact
    inversion is not required for a conforming stream — any residual
    coefficients are decodable; imprecision only costs PSNR)."""
    ip = block.astype(np.int64)
    tmp = np.empty((4, 4), np.int64)
    for i in range(4):
        a1 = (ip[i, 0] + ip[i, 3]) * 8
        b1 = (ip[i, 1] + ip[i, 2]) * 8
        c1 = (ip[i, 1] - ip[i, 2]) * 8
        d1 = (ip[i, 0] - ip[i, 3]) * 8
        tmp[i, 0] = a1 + b1
        tmp[i, 2] = a1 - b1
        tmp[i, 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[i, 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = np.empty((4, 4), np.int64)
    for i in range(4):
        a1 = tmp[0, i] + tmp[3, i]
        b1 = tmp[1, i] + tmp[2, i]
        c1 = tmp[1, i] - tmp[2, i]
        d1 = tmp[0, i] - tmp[3, i]
        out[0, i] = (a1 + b1 + 7) >> 4
        out[2, i] = (a1 - b1 + 7) >> 4
        out[1, i] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (
            1 if d1 != 0 else 0)
        out[3, i] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return [int(x) for x in out.reshape(16)]


def _fwht4x4(dcs: List[int]) -> List[int]:
    """Forward WHT for the Y2 block (16 luma DC terms)."""
    ip = np.array(dcs, np.int64).reshape(4, 4)
    tmp = np.empty((4, 4), np.int64)
    for i in range(4):
        a1 = (ip[i, 0] + ip[i, 2]) * 4
        d1 = (ip[i, 1] + ip[i, 3]) * 4
        c1 = (ip[i, 1] - ip[i, 3]) * 4
        b1 = (ip[i, 0] - ip[i, 2]) * 4
        tmp[i, 0] = a1 + d1 + (1 if a1 != 0 else 0)
        tmp[i, 1] = b1 + c1
        tmp[i, 2] = b1 - c1
        tmp[i, 3] = a1 - d1
    out = np.empty((4, 4), np.int64)
    for i in range(4):
        a1 = tmp[0, i] + tmp[2, i]
        d1 = tmp[1, i] + tmp[3, i]
        c1 = tmp[1, i] - tmp[3, i]
        b1 = tmp[0, i] - tmp[2, i]
        a2 = a1 + d1
        b2 = b1 + c1
        c2 = b1 - c1
        d2 = a1 - d1
        out[0, i] = (a2 + (1 if a2 < 0 else 0) + 3) >> 3
        out[1, i] = (b2 + (1 if b2 < 0 else 0) + 3) >> 3
        out[2, i] = (c2 + (1 if c2 < 0 else 0) + 3) >> 3
        out[3, i] = (d2 + (1 if d2 < 0 else 0) + 3) >> 3
    return [int(x) for x in out.reshape(16)]


def _quantize(coeffs: List[int], dq_dc: int, dq_ac: int) -> List[int]:
    """Coefficient levels (natural order) by truncating division —
    any level choice yields a conforming stream."""
    out = [0] * 16
    for i, c in enumerate(coeffs):
        dq = dq_dc if i == 0 else dq_ac
        q = abs(c) // dq
        if q > 2047 + 67:
            q = 2047 + 67  # DCT category 6 ceiling
        out[i] = -q if c < 0 else q
    return out


def _write_coeffs(enc: BoolEncoder, probs, ctx: int, first: int,
                  levels: List[int]) -> int:
    """Token-encode one block (levels in NATURAL order); mirrors the
    decoder's _get_coeffs. Returns the nonzero flag (n > first)."""
    scan = [levels[ZIGZAG[n]] for n in range(16)]
    last = -1
    for n in range(15, first - 1, -1):
        if scan[n] != 0:
            last = n
            break
    n = first
    p = probs[COEFF_BANDS[n]][ctx]
    if last < first:
        enc.put(0, p[0])          # immediate end-of-block
        return 0
    while n <= last:
        enc.put(1, p[0])          # not EOB
        v = scan[n]
        while v == 0:             # zero run (never reaches past last)
            enc.put(0, p[1])
            n += 1
            p = probs[COEFF_BANDS[n]][0]
            v = scan[n]
        enc.put(1, p[1])          # nonzero
        a = abs(v)
        if a == 1:
            enc.put(0, p[2])
            nxt = 1
        else:
            enc.put(1, p[2])
            if a <= 4:
                enc.put(0, p[3])
                if a == 2:
                    enc.put(0, p[4])
                else:
                    enc.put(1, p[4])
                    enc.put(a - 3, p[5])
            elif a <= 10:
                enc.put(1, p[3])
                enc.put(0, p[6])
                if a <= 6:
                    enc.put(0, p[7])
                    enc.put(a - 5, 159)
                else:
                    enc.put(1, p[7])
                    enc.put((a - 7) >> 1, 165)
                    enc.put((a - 7) & 1, 145)
            else:
                enc.put(1, p[3])
                enc.put(1, p[6])
                cat = 5  # CAT_PROBS index (category - 1), 2..5
                for idx in range(2, 6):
                    hi = CAT_BASES[idx] + (1 << len(CAT_PROBS[idx])) - 1
                    if a <= hi:
                        cat = idx
                        break
                sel = cat - 2
                enc.put(sel >> 1, p[8])
                enc.put(sel & 1, p[9 + (sel >> 1)])
                extra = a - CAT_BASES[cat]
                bits = CAT_PROBS[cat]
                for i, bp in enumerate(bits):
                    enc.put((extra >> (len(bits) - 1 - i)) & 1, bp)
            nxt = 2
        enc.put(1 if v < 0 else 0, 128)
        n += 1
        if n == 16:
            return 1
        p = probs[COEFF_BANDS[n]][nxt]
    enc.put(0, p[0])              # EOB after the last nonzero
    return 1


def _write_header(enc: BoolEncoder, q_index: int, filter_level: int,
                  sharpness: int, simple_filter: bool) -> None:
    enc.put(0, 128)               # color space
    enc.put(0, 128)               # clamping type
    enc.put(0, 128)               # segmentation disabled
    enc.put(1 if simple_filter else 0, 128)
    enc.put_literal(filter_level, 6)
    enc.put_literal(sharpness, 3)
    enc.put(0, 128)               # loop_filter_adj disabled
    enc.put_literal(0, 2)         # log2(token partitions) = 0
    enc.put_literal(q_index, 7)
    for _ in range(5):            # no quantizer deltas
        enc.put(0, 128)
    enc.put(0, 128)               # refresh_entropy_probs
    for t in range(4):            # keep default coefficient probs
        for b in range(8):
            for c in range(3):
                up = COEFF_UPDATE_PROBS[t][b][c]
                for pi in range(11):
                    enc.put(0, up[pi])
    enc.put(1, 128)               # mb_no_coeff_skip enabled
    enc.put_literal(128, 8)       # prob_skip_false


_I16_MODES = (DC_PRED, V_PRED, H_PRED, TM_PRED)


def encode_vp8_yuv(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                   q_index: int = 20, filter_level: int = 20,
                   sharpness: int = 0,
                   simple_filter: bool = False) -> bytes:
    """Encode 4:2:0 planes as a VP8 key-frame bitstream (the payload
    of a ``VP8 `` chunk). i16 modes only; per-MB mode by SSD."""
    h, w = y.shape
    if not (1 <= w < 1 << 14 and 1 <= h < 1 << 14):
        raise ValueError("dimensions out of VP8 range")
    if u.shape != ((h + 1) // 2, (w + 1) // 2):
        raise ValueError("chroma plane shape mismatch")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    H, W = mb_h * 16, mb_w * 16

    def pad(plane, ph, pw):
        out = np.empty((ph, pw), np.uint8)
        sh, sw = plane.shape
        out[:sh, :sw] = plane
        out[:sh, sw:] = plane[:, sw - 1:sw]
        out[sh:, :] = out[sh - 1:sh, :]
        return out

    ysrc = pad(y, H, W)
    usrc = pad(u, H // 2, W // 2)
    vsrc = pad(v, H // 2, W // 2)
    yrec = np.zeros((H, W), np.uint8)
    urec = np.zeros((H // 2, W // 2), np.uint8)
    vrec = np.zeros((H // 2, W // 2), np.uint8)

    # reuse the decoder's dequant logic via a throwaway header shell
    hdr = _FrameHeader(
        width=w, height=h, mb_w=mb_w, mb_h=mb_h,
        seg=_Segmentation(), lf=_LoopFilterParams(),
        y_ac_qi=q_index, y1_dc_delta=0, y2_dc_delta=0, y2_ac_delta=0,
        uv_dc_delta=0, uv_ac_delta=0, use_skip=True, skip_prob=128,
        coeff_probs=None)
    (y1_dc, y1_ac), (y2_dc, y2_ac), (uv_dc, uv_ac) = \
        _dequant_factors(hdr, 0)

    enc0 = BoolEncoder()
    _write_header(enc0, q_index, filter_level, sharpness, simple_filter)
    enc1 = BoolEncoder()
    probs = DEFAULT_COEFF_PROBS

    # token nonzero contexts
    above_y = [[0] * 4 for _ in range(mb_w)]
    above_u = [[0] * 2 for _ in range(mb_w)]
    above_v = [[0] * 2 for _ in range(mb_w)]
    above_y2 = [0] * mb_w

    # first pass per MB: choose modes, quantize, reconstruct, and
    # buffer (mode decisions + levels); tokens/modes written in the
    # same raster order
    for mb_y in range(mb_h):
        left_y = [0] * 4
        left_u = [0] * 2
        left_v = [0] * 2
        left_y2 = 0
        if mb_y == 0:
            pass
        for mb_x in range(mb_w):
            y0, x0 = mb_y * 16, mb_x * 16
            cy0, cx0 = mb_y * 8, mb_x * 8
            have_above, have_left = mb_y > 0, mb_x > 0
            src16 = ysrc[y0:y0 + 16, x0:x0 + 16].astype(np.int32)
            best = None
            for mode in _I16_MODES:
                pred = _pred_block(yrec, y0, x0, 16, mode,
                                   have_above, have_left)
                ssd = int(((src16 - pred) ** 2).sum())
                if best is None or ssd < best[0]:
                    best = (ssd, mode, pred)
            _, ymode, ypred = best
            # luma residual -> fdct -> split dc (y2) / ac
            ylevels = []
            dcs = []
            for i in range(16):
                r, c = i >> 2, i & 3
                res = (src16[4 * r:4 * r + 4, 4 * c:4 * c + 4]
                       - ypred[4 * r:4 * r + 4, 4 * c:4 * c + 4])
                co = _fdct4x4(res)
                dcs.append(co[0])
                lv = _quantize(co, y1_dc, y1_ac)
                lv[0] = 0  # dc carried by Y2
                ylevels.append(lv)
            y2co = _fwht4x4(dcs)
            y2lv = _quantize(y2co, y2_dc, y2_ac)

            # chroma
            csrcu = usrc[cy0:cy0 + 8, cx0:cx0 + 8].astype(np.int32)
            csrcv = vsrc[cy0:cy0 + 8, cx0:cx0 + 8].astype(np.int32)
            bestc = None
            for mode in _I16_MODES:
                pu = _pred_block(urec, cy0, cx0, 8, mode,
                                 have_above, have_left)
                pv = _pred_block(vrec, cy0, cx0, 8, mode,
                                 have_above, have_left)
                ssd = int(((csrcu - pu) ** 2).sum()
                          + ((csrcv - pv) ** 2).sum())
                if bestc is None or ssd < bestc[0]:
                    bestc = (ssd, mode, pu, pv)
            _, uvmode, upred, vpred = bestc
            ulevels, vlevels = [], []
            for src, pred, dest in ((csrcu, upred, ulevels),
                                    (csrcv, vpred, vlevels)):
                for i in range(4):
                    r, c = i >> 1, i & 1
                    res = (src[4 * r:4 * r + 4, 4 * c:4 * c + 4]
                           - pred[4 * r:4 * r + 4, 4 * c:4 * c + 4])
                    dest.append(_quantize(_fdct4x4(res), uv_dc, uv_ac))

            skip = (not any(any(lv) for lv in ylevels)
                    and not any(y2lv)
                    and not any(any(lv) for lv in ulevels)
                    and not any(any(lv) for lv in vlevels))

            # --- write modes (partition 0)
            enc0.put(1 if skip else 0, 128)
            enc0.put_tree(KF_YMODE_TREE, KF_YMODE_PROBS, ymode)
            enc0.put_tree(UV_MODE_TREE, KF_UV_MODE_PROBS, uvmode)

            # --- write tokens (partition 1) + contexts
            if skip:
                left_y = [0] * 4
                left_u = [0] * 2
                left_v = [0] * 2
                above_y[mb_x] = [0] * 4
                above_u[mb_x] = [0] * 2
                above_v[mb_x] = [0] * 2
                left_y2 = above_y2[mb_x] = 0
            else:
                ctx = above_y2[mb_x] + left_y2
                nz = _write_coeffs(enc1, probs[1], ctx, 0,
                                   [int(x) for x in y2lv])
                left_y2 = above_y2[mb_x] = nz
                for i in range(16):
                    r, c = i >> 2, i & 3
                    ctx = above_y[mb_x][c] + left_y[r]
                    nz = _write_coeffs(enc1, probs[0], ctx, 1,
                                       ylevels[i])
                    above_y[mb_x][c] = left_y[r] = nz
                for above_c, left_c, levels in (
                        (above_u, left_u, ulevels),
                        (above_v, left_v, vlevels)):
                    for i in range(4):
                        r, c = i >> 1, i & 1
                        ctx = above_c[mb_x][c] + left_c[r]
                        nz = _write_coeffs(enc1, probs[2], ctx, 0,
                                           levels[i])
                        above_c[mb_x][c] = left_c[r] = nz

            # --- reconstruct exactly as a decoder would
            recon = ypred.copy()
            if not skip:
                deq_y2 = [lv * (y2_dc if i == 0 else y2_ac)
                          for i, lv in enumerate(y2lv)]
                rdcs = _iwht4x4(deq_y2)
                for i in range(16):
                    r, c = i >> 2, i & 3
                    deq = [lv * (y1_dc if j == 0 else y1_ac)
                           for j, lv in enumerate(ylevels[i])]
                    deq[0] = rdcs[i]
                    recon[4 * r:4 * r + 4, 4 * c:4 * c + 4] += \
                        _idct4x4(deq)
            yrec[y0:y0 + 16, x0:x0 + 16] = np.clip(recon, 0, 255)
            for pred, levels, plane in ((upred, ulevels, urec),
                                        (vpred, vlevels, vrec)):
                rec = pred.copy()
                if not skip:
                    for i in range(4):
                        r, c = i >> 1, i & 1
                        deq = [lv * (uv_dc if j == 0 else uv_ac)
                               for j, lv in enumerate(levels[i])]
                        rec[4 * r:4 * r + 4, 4 * c:4 * c + 4] += \
                            _idct4x4(deq)
                plane[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(rec, 0, 255)

    part0 = enc0.flush()
    part1 = enc1.flush()
    tag = 0 | (0 << 1) | (1 << 4) | (len(part0) << 5)
    header = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    header += b"\x9d\x01\x2a"
    header += bytes((w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F))
    return header + part0 + part1


def encode_webp_vp8(pixels: np.ndarray, q_index: int = 20,
                    filter_level: int = 20, sharpness: int = 0,
                    simple_filter: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> a complete lossy WebP container
    (RIFF/WEBP/``VP8 ``). BT.601 full-range-to-studio conversion with
    box-filtered 4:2:0 chroma; exactness is not a goal (the fidelity
    contract gates lossy payloads by PSNR)."""
    import struct as _struct

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 RGB")
    h, w = px.shape[:2]
    r = px[:, :, 0].astype(np.int32)
    g = px[:, :, 1].astype(np.int32)
    b = px[:, :, 2].astype(np.int32)
    y = ((16839 * r + 33059 * g + 6420 * b + (16 << 16) + 32768) >> 16)
    # pad to even dims for box-filtered chroma
    he, we = h + (h & 1), w + (w & 1)
    rp = np.empty((he, we), np.int32)
    gp = np.empty((he, we), np.int32)
    bp = np.empty((he, we), np.int32)
    for src, dst in ((r, rp), (g, gp), (b, bp)):
        dst[:h, :w] = src
        dst[:h, w:] = src[:, w - 1:w]
        dst[h:, :] = dst[h - 1:h, :]
    r2 = (rp[0::2, 0::2] + rp[0::2, 1::2] + rp[1::2, 0::2]
          + rp[1::2, 1::2] + 2) >> 2
    g2 = (gp[0::2, 0::2] + gp[0::2, 1::2] + gp[1::2, 0::2]
          + gp[1::2, 1::2] + 2) >> 2
    b2 = (bp[0::2, 0::2] + bp[0::2, 1::2] + bp[1::2, 0::2]
          + bp[1::2, 1::2] + 2) >> 2
    u = ((-9719 * r2 - 19081 * g2 + 28800 * b2 + (128 << 16) + 32768)
         >> 16)
    v = ((28800 * r2 - 24116 * g2 - 4684 * b2 + (128 << 16) + 32768)
         >> 16)
    payload = encode_vp8_yuv(
        np.clip(y, 0, 255).astype(np.uint8),
        np.clip(u, 0, 255).astype(np.uint8),
        np.clip(v, 0, 255).astype(np.uint8),
        q_index=q_index, filter_level=filter_level,
        sharpness=sharpness, simple_filter=simple_filter)
    chunk = b"VP8 " + _struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + _struct.pack("<I", len(body)) + body

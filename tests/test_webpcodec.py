"""VP8L WebP codec conformance tests.

No libwebp exists in this container, so in addition to
encoder↔decoder roundtrips these tests HAND-BUILD bitstreams with an
independent test-side writer to exercise every decoder feature the
in-repo encoder does not emit — LZ77 backrefs (linear + 2D map
distances), color cache, palette transform with pixel packing,
predictor + color transforms, meta prefix codes, and repeat codes —
against expected pixels computed by hand in each test."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cerberus_cpp_spark.sources.webpcodec import (
    _CODE_LENGTH_ORDER,
    _BitWriter,
    _cache_index,
    canonical_codes,
    decode_webp,
    encode_webp,
    sniff_webp,
)
from cerberus_cpp_spark.sources.imagegen import (
    synth_noise_pixels,
    synth_pixels,
)


# ---------------------------------------------------------------------------
# test-side stream builder (independent of the encoder's subset)
# ---------------------------------------------------------------------------


def wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def write_simple_code(bw: _BitWriter, symbols: list[int]) -> dict:
    """Simple-format prefix code; returns symbol -> (code, len)."""
    bw.write(1, 1)
    bw.write(len(symbols) - 1, 1)
    first = symbols[0]
    if first < 2:
        bw.write(0, 1)
        bw.write(first, 1)
    else:
        bw.write(1, 1)
        bw.write(first, 8)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)
        # codes are CANONICAL over the symbol values (libwebp builds
        # the table from code_lengths), not over read order
        lo, hi = sorted(symbols)
        return {lo: (0, 1), hi: (1, 1)}
    return {symbols[0]: (0, 0)}  # single symbol: zero bits


def write_normal_code(bw: _BitWriter, alphabet: int,
                      lengths: dict[int, int]) -> dict:
    """Normal-format prefix code from a symbol->length map (at most
    two distinct nonzero lengths). Returns symbol -> (code, len)."""
    distinct = sorted(set(lengths.values()))
    if len(distinct) == 1:
        cl = {0: 1, distinct[0]: 1}
    elif len(distinct) == 2:
        cl = {0: 1, distinct[0]: 2, distinct[1]: 2}
    else:
        raise AssertionError("test helper supports <= 2 lengths")
    needed = max(_CODE_LENGTH_ORDER.index(s) for s in cl) + 1
    needed = max(needed, 4)
    bw.write(0, 1)
    bw.write(needed - 4, 4)
    for s in _CODE_LENGTH_ORDER[:needed]:
        bw.write(cl.get(s, 0), 3)
    cl_codes = canonical_codes([cl.get(i, 0) for i in range(19)])
    last = max(lengths)
    if last + 1 < alphabet:
        max_symbol = last + 1
        code3 = 0
        while max_symbol - 2 >= (1 << (2 + 2 * code3)):
            code3 += 1
        bw.write(1, 1)
        bw.write(code3, 3)
        bw.write(max_symbol - 2, 2 + 2 * code3)
        upto = max_symbol
    else:
        bw.write(0, 1)
        upto = alphabet
    for sym in range(upto):
        c, ln = cl_codes[lengths.get(sym, 0)]
        bw.write_code(c, ln)
    full = [lengths.get(i, 0) for i in range(alphabet)]
    return canonical_codes(full)


def no_extras(bw: _BitWriter) -> None:
    """No transforms, no cache, no meta codes (spec order)."""
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)


# ---------------------------------------------------------------------------
# roundtrips (encoder subset)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sg", [True, False])
@pytest.mark.parametrize("dims", [(1, 1), (3, 2), (16, 16), (17, 5),
                                  (64, 48)])
def test_roundtrip_gradient(sg, dims):
    w, h = dims
    px = synth_pixels(1000 + w * h, w, h)
    assert np.array_equal(
        decode_webp(encode_webp(px, subtract_green=sg)), px)


def test_roundtrip_noise():
    px = synth_noise_pixels(5, 37, 19)
    assert np.array_equal(decode_webp(encode_webp(px)), px)


def test_sniff_and_unsupported_variants():
    px = synth_pixels(1, 8, 8)
    blob = encode_webp(px)
    assert sniff_webp(blob)
    assert not sniff_webp(b"RIFF\x00\x00\x00\x00AVI ")
    lossy = blob[:12] + b"VP8 " + blob[16:]
    with pytest.raises(ValueError, match="unsupported WebP variant"):
        decode_webp(lossy)


# ---------------------------------------------------------------------------
# hand-built conformance streams
# ---------------------------------------------------------------------------


def test_lz77_backref_2d_distance():
    """4x1: one literal then a length-3 backref at 2D distance code 2
    = offset (1, 0) = linear distance 1 → four identical pixels."""
    bw = _BitWriter()
    header(bw, 4, 1)
    no_extras(bw)
    # green: {literal 10, length-prefix 2 (-> length 3) = sym 258}
    g = write_normal_code(bw, 280, {10: 1, 258: 1})
    write_simple_code(bw, [20])    # red
    write_simple_code(bw, [30])    # blue
    write_simple_code(bw, [255])   # alpha
    write_simple_code(bw, [1])     # distance prefix 1 -> value 2
    bw.write_code(*g[10])          # literal pixel
    bw.write_code(*g[258])         # backref len 3 (prefix < 4: no extra)
    out = decode_webp(wrap(bw.bytes()))
    assert np.array_equal(out, np.tile([20, 10, 30], (1, 4, 1)))


def test_lz77_backref_linear_distance_with_extra_bits():
    """2x3: copy the whole first row twice via one length-4 backref
    (length prefix 3 -> 4) at linear distance 2 (dist code 122)."""
    bw = _BitWriter()
    header(bw, 2, 3)
    no_extras(bw)
    g = write_normal_code(bw, 280, {7: 1, 259: 1})  # literal 7, len 4
    r = write_simple_code(bw, [1, 2])
    write_simple_code(bw, [0])     # blue
    write_simple_code(bw, [255])   # alpha
    # we need dist VALUE 122 for linear distance 2 (122 - 120):
    # prefix 13: extra=(13-2)>>1=5, offset=(2+1)<<5=96,
    # value = 96 + ReadBits(5) + 1 -> write 25
    d = write_simple_code(bw, [13])
    bw.write_code(*g[7])
    bw.write_code(*r[1])
    bw.write_code(*g[7])
    bw.write_code(*r[2])
    bw.write_code(*g[259])         # length prefix 3 -> 4, no extras
    bw.write_code(*d[13])          # distance prefix (zero bits, single)
    bw.write(122 - 96 - 1, 5)      # extra bits -> value 122 -> dist 2
    out = decode_webp(wrap(bw.bytes()))
    row = [[1, 7, 0], [2, 7, 0]]
    assert np.array_equal(out, np.array([row, row, row], dtype=np.uint8))


def test_color_cache_hit():
    """3x1: literal A, literal B, then a cache reference to A."""
    a_px = (255, 0, 5, 0)   # a, r, g, b
    idx_a = _cache_index(*a_px, cache_bits=2)
    bw = _BitWriter()
    header(bw, 3, 1)
    bw.write(0, 1)          # no transforms
    bw.write(1, 1)          # cache present (color-cache-info FIRST,
    bw.write(2, 4)          # cache_bits = 2 (size 4)
    bw.write(0, 1)          # then the meta-prefix bit — RFC 9649)
    g = write_normal_code(
        bw, 256 + 24 + 4, {5: 2, 6: 2, 280 + idx_a: 1})
    write_simple_code(bw, [0])     # red
    write_simple_code(bw, [0])     # blue
    write_simple_code(bw, [255])   # alpha
    write_simple_code(bw, [0])     # distance
    bw.write_code(*g[5])
    bw.write_code(*g[6])
    bw.write_code(*g[280 + idx_a])
    out = decode_webp(wrap(bw.bytes()))
    assert np.array_equal(
        out, np.array([[[0, 5, 0], [0, 6, 0], [0, 5, 0]]], np.uint8))


def _single_color_group(bw: _BitWriter, a, r, g, b) -> None:
    """One prefix-code GROUP pinned to a constant pixel (all
    single-symbol, zero bits per pixel) — no leading cache bit."""
    write_simple_code(bw, [g])
    write_simple_code(bw, [r])
    write_simple_code(bw, [b])
    write_simple_code(bw, [a])
    write_simple_code(bw, [0])


def _single_color_subimage(bw: _BitWriter, a, r, g, b) -> None:
    """A sub-image STREAM (is_main=False) of one constant pixel:
    cache bit + one code group."""
    bw.write(0, 1)  # no cache
    _single_color_group(bw, a, r, g, b)


def test_palette_transform_with_packing():
    """8x1 image, 2 colors → 3-bit packing (8 px per coded byte):
    packed green byte 0b10110010 indexes the palette LSB-first."""
    bw = _BitWriter()
    header(bw, 8, 1)
    bw.write(1, 1)          # a transform
    bw.write(3, 2)          # COLOR_INDEXING
    bw.write(2 - 1, 8)      # 2 colors
    # palette deltas image (2x1): entry0 = (255,9,8,7); delta1 = (0,1,1,1)
    bw.write(0, 1)          # (sub-image) no cache
    g = write_simple_code(bw, [8, 1])
    r = write_simple_code(bw, [9, 1])
    b = write_simple_code(bw, [7, 1])
    a = write_simple_code(bw, [255, 0])
    write_simple_code(bw, [0])
    for i in (0, 1):
        bw.write_code(*g[[8, 1][i]])
        bw.write_code(*r[[9, 1][i]])
        bw.write_code(*b[[7, 1][i]])
        bw.write_code(*a[[255, 0][i]])
    bw.write(0, 1)          # end of transforms
    bw.write(0, 1)          # no meta
    bw.write(0, 1)          # no cache
    packed = 0b10110010
    gm = write_simple_code(bw, [packed])
    write_simple_code(bw, [0])
    write_simple_code(bw, [0])
    write_simple_code(bw, [255])
    write_simple_code(bw, [0])
    bw.write_code(*gm[packed])
    out = decode_webp(wrap(bw.bytes()))
    c0, c1 = [9, 8, 7], [10, 9, 8]  # entry1 = entry0 + delta (mod 256)
    bits = [0, 1, 0, 0, 1, 1, 0, 1]  # LSB-first of 0b10110010
    expected = np.array([[c1 if t else c0 for t in bits]], np.uint8)
    assert np.array_equal(out, expected)


def test_predictor_transform_left_mode():
    """2x2, one block, mode 1 (left); edge rules: (0,0)+=ff000000,
    row 0 += left, column 0 += top. Expected computed by hand."""
    bw = _BitWriter()
    header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(0, 2)          # PREDICTOR
    bw.write(2 - 2, 3)      # size_bits = 2 (4x4 blocks -> 1 block)
    _single_color_subimage(bw, 255, 0, 1, 0)  # mode 1 in green
    bw.write(0, 1)          # end transforms
    bw.write(0, 1)          # no meta
    bw.write(0, 1)          # no cache
    # residuals: 4 literals with per-channel two-symbol codes
    g = write_simple_code(bw, [10, 1])
    r = write_simple_code(bw, [20, 2])
    b = write_simple_code(bw, [30, 3])
    a = write_simple_code(bw, [0, 255])
    write_simple_code(bw, [0])
    # pixel order ARGB residuals:
    res = [
        (0, 20, 10, 30),    # (0,0): + ff000000 -> a=0? see expected
        (255, 2, 1, 3),     # (0,1): + left
        (255, 2, 1, 3),     # (1,0): + top
        (255, 2, 1, 3),     # (1,1): mode 1 -> + left
    ]
    for (ra, rr, rg, rb) in res:
        bw.write_code(*g[rg])
        bw.write_code(*r[rr])
        bw.write_code(*b[rb])
        bw.write_code(*a[ra])
    out = decode_webp(wrap(bw.bytes()))
    # hand-computed: p00 = res + (255,0,0,0) = a=255, r=20, g=10, b=30
    # p01 = p00 + (255,2,1,3) -> a=(255+255)&255=254... alpha dropped
    # in RGB output; r=22, g=11, b=33
    # p10 = p00 + res = (22, 11, 33); p11 = p10 + res = (24, 12, 36)
    expected = np.array(
        [[[20, 10, 30], [22, 11, 33]],
         [[22, 11, 33], [24, 12, 36]]], np.uint8)
    assert np.array_equal(out, expected)


def test_color_transform_inverse():
    """2x1, one block, green_to_red=16 (i.e. +g/2), others 0.
    cte pixel: red=red_to_blue, green=green_to_blue, blue=green_to_red."""
    bw = _BitWriter()
    header(bw, 2, 1)
    bw.write(1, 1)
    bw.write(1, 2)          # COLOR transform
    bw.write(3 - 2, 3)      # size_bits = 3 -> one 8x8 block
    _single_color_subimage(bw, 255, 0, 0, 16)  # blue=16 -> g2r=16
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    g = write_simple_code(bw, [64, 200])
    r = write_simple_code(bw, [10, 0])
    b = write_simple_code(bw, [5, 7])
    a = write_simple_code(bw, [255])
    write_simple_code(bw, [0])
    for (rg, rr, rb) in [(64, 10, 5), (200, 0, 7)]:
        bw.write_code(*g[rg])
        bw.write_code(*r[rr])
        bw.write_code(*b[rb])
    out = decode_webp(wrap(bw.bytes()))
    # delta(16, g) = (16 * int8(g)) >> 5
    # px0: g=64 -> int8(64)=64 -> delta=(16*64)>>5=32; red=10+32=42
    # px1: g=200 -> int8=-56 -> delta=(16*-56)>>5=-896>>5=-28; red=0-28
    #      = -28 & 0xff = 228
    expected = np.array([[[42, 64, 5], [228, 200, 7]]], np.uint8)
    assert np.array_equal(out, expected)


def test_meta_prefix_codes_two_groups():
    """8x1 with meta_bits=2 → two 4-pixel blocks using different code
    groups (group index from (red<<8)|green of the entropy image)."""
    bw = _BitWriter()
    header(bw, 8, 1)
    bw.write(0, 1)          # no transforms
    bw.write(0, 1)          # main image: no cache (precedes meta bit)
    bw.write(1, 1)          # meta prefix codes present
    bw.write(2 - 2, 3)      # meta_bits = 2 -> entropy image 2x1
    # entropy image (sub-stream): greens 0 and 1 (groups), red 0
    bw.write(0, 1)          # no cache
    mg = write_simple_code(bw, [0, 1])
    write_simple_code(bw, [0])
    write_simple_code(bw, [0])
    write_simple_code(bw, [255])
    write_simple_code(bw, [0])
    bw.write_code(*mg[0])
    bw.write_code(*mg[1])
    # group 0: constant color (50, 60, 70)
    _single_color_group(bw, 255, 50, 60, 70)
    # group 1: constant color (5, 6, 7)
    _single_color_group(bw, 255, 5, 6, 7)
    out = decode_webp(wrap(bw.bytes()))
    expected = np.array(
        [[[50, 60, 70]] * 4 + [[5, 6, 7]] * 4], np.uint8)
    assert np.array_equal(out, expected)


def test_repeat_codes_16_17_18():
    """A normal code transmitted via repeat codes: sym0 len1, then a
    17-skip and an 18-skip of zeros, then sym255 len1."""
    bw = _BitWriter()
    header(bw, 2, 1)
    no_extras(bw)
    # green code hand-written with repeats:
    bw.write(0, 1)              # normal
    # cl code: sym0:len2, sym1:len2, sym17:len2, sym18:len2 (complete)
    cl = {0: 2, 1: 2, 17: 2, 18: 2}
    needed = max(_CODE_LENGTH_ORDER.index(s) for s in cl) + 1
    bw.write(needed - 4, 4)
    for s in _CODE_LENGTH_ORDER[:needed]:
        bw.write(cl.get(s, 0), 3)
    cl_codes = canonical_codes([cl.get(i, 0) for i in range(19)])
    bw.write(0, 1)              # no max_symbol: read all 280
    bw.write_code(*cl_codes[1])     # sym 0: length 1
    bw.write_code(*cl_codes[17])    # skip 3 + ReadBits(3)
    bw.write(7, 3)                  # -> skip 10 zeros (syms 1..10)
    bw.write_code(*cl_codes[18])    # skip 11 + ReadBits(7)
    bw.write(127, 7)                # -> skip 138 (syms 11..148)
    bw.write_code(*cl_codes[18])
    bw.write(95, 7)                 # -> skip 106 (syms 149..254)
    bw.write_code(*cl_codes[1])     # sym 255: length 1
    bw.write_code(*cl_codes[17])    # skip the remaining 24 length syms
    bw.write(4, 3)                  # 3+4=7
    bw.write_code(*cl_codes[18])
    bw.write(6, 7)                  # 11+6=17 -> 24 total
    g = {0: (0, 1), 255: (1, 1)}
    write_simple_code(bw, [0])      # red
    write_simple_code(bw, [0])      # blue
    write_simple_code(bw, [255])    # alpha
    write_simple_code(bw, [0])      # distance
    bw.write_code(*g[255])
    bw.write_code(*g[0])
    out = decode_webp(wrap(bw.bytes()))
    assert np.array_equal(
        out, np.array([[[0, 255, 0], [0, 0, 0]]], np.uint8))


def test_repeat_16_uses_previous_length():
    """Repeat-16 copies the previous code length: 256 lengths of 8
    transmitted as one literal '8' + repeat-16 runs — the dense-byte
    shape through the repeat path."""
    bw = _BitWriter()
    header(bw, 1, 1)
    no_extras(bw)
    bw.write(0, 1)              # normal green code
    cl = {8: 2, 16: 2, 0: 1}
    needed = max(_CODE_LENGTH_ORDER.index(s) for s in cl) + 1
    bw.write(needed - 4, 4)
    for s in _CODE_LENGTH_ORDER[:needed]:
        bw.write(cl.get(s, 0), 3)
    cl_codes = canonical_codes([cl.get(i, 0) for i in range(19)])
    # max_symbol counts CODE READS (libwebp `max_symbol--` per read),
    # not assigned lengths: 1 literal + 43 repeat-16s = 44
    takes, covered = [], 1
    while covered < 256:
        t = min(6, 256 - covered)
        takes.append(t)
        covered += t
    n_reads = 1 + len(takes)
    bw.write(1, 1)
    bw.write(2, 3)              # length_nbits = 6
    bw.write(n_reads - 2, 6)
    bw.write_code(*cl_codes[8])     # sym 0: length 8
    for t in takes:
        bw.write_code(*cl_codes[16])
        bw.write(t - 3, 2)
    g = canonical_codes([8] * 256 + [0] * 24)
    write_simple_code(bw, [33])     # red
    write_simple_code(bw, [44])     # blue
    write_simple_code(bw, [255])    # alpha
    write_simple_code(bw, [0])      # distance
    bw.write_code(*g[77])
    out = decode_webp(wrap(bw.bytes()))
    assert np.array_equal(out, np.array([[[33, 77, 44]]], np.uint8))


# ---------------------------------------------------------------------------
# corruption hygiene
# ---------------------------------------------------------------------------


def test_truncation_and_garbage_raise_valueerror():
    px = synth_pixels(2, 10, 10)
    blob = encode_webp(px)
    for cut in (4, 11, 12, 20, 30, len(blob) - 3):
        with pytest.raises(ValueError):
            decode_webp(blob[:cut])
    with pytest.raises(ValueError):
        decode_webp(b"not a webp at all")


def test_fuzz_bitflips_valueerror_or_decode():
    """Bit flips past the header either still decode (to some image)
    or raise ValueError — never any other exception type."""
    import random

    rng = random.Random(123)
    blob = bytearray(encode_webp(synth_pixels(8, 12, 7)))
    for _ in range(300):
        b = bytearray(blob)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(25, len(b))] ^= 1 << rng.randrange(8)
        try:
            decode_webp(bytes(b))
        except ValueError:
            pass


def test_dimension_limits():
    with pytest.raises(ValueError):
        encode_webp(np.zeros((1, 16385, 3), np.uint8))


# ---------------------------------------------------------------------------
# richer encoder modes: palette + color cache (real roundtrip coverage
# of the decoder paths the literal encoder never emits)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_colors,dims", [
    (2, (16, 8)),    # 1-bit packing, width divisible by 8
    (2, (13, 3)),    # 1-bit packing, ragged width
    (3, (10, 10)),   # 2-bit packing
    (4, (7, 9)),     # 2-bit packing, ragged
    (9, (17, 5)),    # 4-bit packing
    (16, (5, 5)),    # 4-bit boundary
    (17, (6, 6)),    # no packing
    (200, (20, 20)),  # large palette, no packing
])
def test_palette_roundtrip(n_colors, dims):
    from cerberus_cpp_spark.sources.webpcodec import encode_webp_palette

    rng = np.random.RandomState(n_colors * 7 + dims[0])
    pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    idx = rng.randint(0, n_colors, dims)
    px = pal[idx]
    assert np.array_equal(decode_webp(encode_webp_palette(px)), px)


def test_palette_rejects_too_many_colors():
    from cerberus_cpp_spark.sources.webpcodec import encode_webp_palette

    with pytest.raises(ValueError, match="<= 256 colors"):
        encode_webp_palette(synth_noise_pixels(1, 32, 32))


@pytest.mark.parametrize("cache_bits", [1, 4, 6, 11])
def test_cache_roundtrip(cache_bits):
    from cerberus_cpp_spark.sources.webpcodec import encode_webp_cached

    base = synth_pixels(3, 8, 8)
    tiled = np.tile(base, (3, 2, 1))  # heavy cache hits
    blob = encode_webp_cached(tiled, cache_bits=cache_bits)
    assert np.array_equal(decode_webp(blob), tiled)


def test_cache_low_hit_rate_still_exact():
    from cerberus_cpp_spark.sources.webpcodec import encode_webp_cached

    px = synth_noise_pixels(11, 19, 13)
    assert np.array_equal(
        decode_webp(encode_webp_cached(px, cache_bits=2)), px)


def test_palette_and_cache_shrink_payloads():
    from cerberus_cpp_spark.sources.webpcodec import (
        encode_webp_cached,
        encode_webp_palette,
    )

    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = (np.arange(24 * 24) % 2).reshape(24, 24)
    two_color = pal[idx]
    assert len(encode_webp_palette(two_color)) \
        < len(encode_webp(two_color)) / 4
    tiled = np.tile(synth_pixels(1, 8, 8), (4, 4, 1))
    assert len(encode_webp_cached(tiled)) < len(encode_webp(tiled))


def test_hypothesis_roundtrip_all_modes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cerberus_cpp_spark.sources.webpcodec import (
        encode_webp_cached,
        encode_webp_color_transformed,
        encode_webp_lz77,
        encode_webp_palette,
        encode_webp_predicted,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24), h=st.integers(1, 24),
        n_colors=st.integers(1, 20), seed=st.integers(0, 2**31 - 1),
        sg=st.booleans(),
    )
    def roundtrip(w, h, n_colors, seed, sg):
        rng = np.random.RandomState(seed)
        pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        px = pal[rng.randint(0, n_colors, (h, w))]
        assert np.array_equal(
            decode_webp(encode_webp(px, subtract_green=sg)), px)
        assert np.array_equal(
            decode_webp(encode_webp_palette(px)), px)
        assert np.array_equal(
            decode_webp(encode_webp_cached(px, cache_bits=3)), px)
        assert np.array_equal(
            decode_webp(encode_webp_predicted(px, mode=seed % 14)), px)
        assert np.array_equal(
            decode_webp(encode_webp_predicted(
                px, mode="auto", size_bits=2)), px)
        assert np.array_equal(
            decode_webp(encode_webp_color_transformed(
                px, green_to_red=seed % 256, green_to_blue=37,
                red_to_blue=201)), px)
        # low-color images repeat pixels a lot → heavy backref use
        assert np.array_equal(decode_webp(encode_webp_lz77(px)), px)

    roundtrip()


def test_lz77_prefix_inverse_of_decoder():
    """_lz77_prefix_of must invert the decoder's _lz77_value across
    the whole 40-prefix range (boundary values of every extra-bits
    level + the window max)."""
    from cerberus_cpp_spark.sources.webpcodec import (
        _LZ77_MAX_DISTANCE_VALUE,
        _lz77_prefix_of,
        _lz77_value,
    )

    class FakeBR:
        def __init__(self, val, n):
            self.val, self.n = val, n

        def read(self, n):
            assert n == self.n
            return self.val

    vals = (list(range(1, 3000))
            + [(2 << e) + d for e in range(2, 19) for d in (-1, 0, 1)]
            + [(3 << e) + d for e in range(2, 18) for d in (-1, 0, 1)]
            + [_LZ77_MAX_DISTANCE_VALUE])
    for v in vals:
        p, extra, nbits = _lz77_prefix_of(v)
        assert 0 <= p < 40, (v, p)
        assert _lz77_value(FakeBR(extra, nbits), p) == v, v
    with pytest.raises(ValueError):
        _lz77_prefix_of(0)


def test_lz77_encoder_roundtrip_and_compression():
    """The LZ77 encoder mode (r3 verdict #3): real roundtrip coverage
    of the decoder's backref branch — tiled, constant, noise and
    gradient images all roundtrip bit-exactly, and repetitive images
    compress an order of magnitude below literal coding."""
    from cerberus_cpp_spark.sources.webpcodec import (
        _lz77_tokenize,
        encode_webp_lz77,
    )

    rng = np.random.RandomState(7)
    patch = rng.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    tiled = np.tile(patch, (8, 8, 1))
    enc = encode_webp_lz77(tiled)
    assert np.array_equal(decode_webp(enc), tiled)
    assert len(enc) * 5 < len(encode_webp(tiled))

    for img in (
        np.full((17, 5, 3), 99, np.uint8),            # dist-1 runs
        rng.randint(0, 256, (9, 13, 3)).astype(np.uint8),  # no matches
        synth_pixels(123, 14, 11),                    # gradient
        np.repeat(rng.randint(0, 256, (1, 20, 3)), 30, axis=0
                  ).astype(np.uint8),                 # dist-w rows
        np.zeros((1, 1, 3), np.uint8),                # minimum dims
    ):
        assert np.array_equal(decode_webp(encode_webp_lz77(img)), img)

    # the tokenizer emits real backrefs, including overlapping
    # (distance < length) runs, and reconstructs exactly
    seq = [(255, 1, 2, 3)] * 20
    toks = _lz77_tokenize(seq, 5)
    assert toks[0][0] == "lit" and toks[1] == ("ref", 19, 1)


@pytest.mark.parametrize("mode", list(range(14)) + ["auto"])
@pytest.mark.parametrize("dims", [(1, 1), (5, 3), (16, 16), (33, 9)])
def test_predicted_roundtrip(mode, dims):
    from cerberus_cpp_spark.sources.webpcodec import encode_webp_predicted

    px = synth_pixels(77 + dims[0], *dims)
    assert np.array_equal(
        decode_webp(encode_webp_predicted(px, mode=mode)), px)


def test_predicted_auto_selects_multiple_modes():
    # mixed content (noise atop gradient) forces a genuinely
    # multi-valued mode sub-image; roundtrip pins the multi-symbol
    # green-code emission path of the transform header
    from cerberus_cpp_spark.sources.webpcodec import (
        _predictor_forward,
        _subsample,
        encode_webp_predicted,
    )

    px = synth_noise_pixels(9, 40, 40)
    px[20:, :] = synth_pixels(5, 40, 20)
    blob = encode_webp_predicted(px, mode="auto", size_bits=3)
    assert np.array_equal(decode_webp(blob), px)
    # reproduce the selection to prove >1 distinct mode was coded
    full = np.zeros((40, 40, 4), dtype=np.int32)
    full[..., 0] = 255
    full[..., 1:4] = px
    preds = _predictor_forward(full)
    r = (full[None] - preds) & 0xFF
    cost = np.minimum(r, 256 - r).sum(axis=-1).astype(np.int64)
    cost[:, 0, :] = 0
    cost[:, :, 0] = 0
    picked = set()
    for by in range(_subsample(40, 3)):
        for bx in range(_subsample(40, 3)):
            sub = cost[:, by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            picked.add(int(sub.sum(axis=(1, 2)).argmin()))
    assert len(picked) > 1


def test_predicted_noise_and_block_sizes():
    from cerberus_cpp_spark.sources.webpcodec import encode_webp_predicted

    n = synth_noise_pixels(4, 21, 14)
    for sb in (2, 3, 5):
        assert np.array_equal(
            decode_webp(encode_webp_predicted(n, size_bits=sb)), n)
    with pytest.raises(ValueError, match="0..13"):
        encode_webp_predicted(n, mode=14)


@pytest.mark.parametrize("params", [
    {},
    {"green_to_red": 200, "green_to_blue": 130, "red_to_blue": 77},
    {"auto": True},
    {"auto": True, "size_bits": 2},
])
def test_color_transformed_roundtrip(params):
    from cerberus_cpp_spark.sources.webpcodec import (
        encode_webp_color_transformed,
    )

    for dims in [(1, 1), (7, 5), (16, 16)]:
        px = synth_pixels(31 + dims[0], *dims)
        assert np.array_equal(
            decode_webp(encode_webp_color_transformed(px, **params)),
            px), (params, dims)
    n = synth_noise_pixels(8, 15, 11)
    assert np.array_equal(
        decode_webp(encode_webp_color_transformed(n, **params)), n)


def test_color_transformed_auto_varies_cte():
    # mixed content → at least two distinct per-block CTEs, pinning
    # the multi-symbol sub-image emission across all three packed
    # channels (auto reproduced here via the same candidate logic:
    # a block of pure noise and a block of smooth gradient disagree
    # on the best multiplier with overwhelming probability; assert
    # only that the ROUNDTRIP holds and the payload differs from the
    # single-CTE encodings, which proves a varying sub-image)
    from cerberus_cpp_spark.sources.webpcodec import (
        encode_webp_color_transformed,
    )

    px = synth_noise_pixels(9, 40, 40)
    px[20:, :] = synth_pixels(5, 40, 20)
    auto_blob = encode_webp_color_transformed(px, auto=True,
                                              size_bits=3)
    assert np.array_equal(decode_webp(auto_blob), px)
    fixed = {encode_webp_color_transformed(
        px, green_to_red=m, green_to_blue=m, red_to_blue=m,
        size_bits=3) for m in (0, 16, 32, 224, 240)}
    assert auto_blob not in fixed


@pytest.mark.parametrize("meta_bits", [2, 4])
@pytest.mark.parametrize("dims", [(1, 1), (5, 3), (16, 16), (33, 9)])
def test_meta_prefix_roundtrip(meta_bits, dims):
    from cerberus_cpp_spark.sources.webpcodec import encode_webp_meta

    px = synth_pixels(31 + dims[0], *dims)
    assert np.array_equal(
        decode_webp(encode_webp_meta(px, meta_bits=meta_bits)), px)
    n = synth_noise_pixels(8, *dims)
    assert np.array_equal(
        decode_webp(encode_webp_meta(n, meta_bits=meta_bits)), n)


def test_meta_prefix_two_groups_pay():
    # mixed content (noise atop a flat region): the entropy image
    # must genuinely select two different code groups, and the flat
    # group's small codes must beat the single-code literal encoder
    from cerberus_cpp_spark.sources.webpcodec import (
        encode_webp,
        encode_webp_meta,
    )

    px = synth_noise_pixels(9, 32, 32)
    px[16:, :] = 7
    blob = encode_webp_meta(px, meta_bits=3)
    assert np.array_equal(decode_webp(blob), px)
    assert len(blob) < len(encode_webp(px))


def test_meta_prefix_rejects_bad_bits():
    from cerberus_cpp_spark.sources.webpcodec import encode_webp_meta

    px = synth_pixels(1, 4, 4)
    for mb in (1, 10):
        with pytest.raises(ValueError, match="meta_bits"):
            encode_webp_meta(px, meta_bits=mb)


def test_pipeline_webp_payloads_use_palette():
    """encode_image's webp branch emits palette streams for the
    synthetic thumbs (<=256 colors) — the contract pipeline's webp
    rows therefore decode through COLOR_INDEXING for real."""
    from cerberus_cpp_spark.sources.imagegen import (
        decode_image,
        encode_image,
        synth_pixels,
    )
    from cerberus_cpp_spark.sources.webpcodec import _BitReader

    blob = encode_image(1234, 12, 9, "webp")
    fmt, px = decode_image(blob)
    assert fmt == "webp"
    assert np.array_equal(px, synth_pixels(1234, 12, 9))
    # the VP8L payload declares a transform of type COLOR_INDEXING
    payload = blob[20:]
    br = _BitReader(payload)
    br.read(8 + 14 + 14 + 1 + 3)
    assert br.read_bit() == 1      # a transform present
    assert br.read(2) == 3         # COLOR_INDEXING


def test_multi_transform_subtract_green_plus_palette():
    """Two transforms in one stream — SUBTRACT_GREEN then
    COLOR_INDEXING (which changes the coded width). The decoder must
    apply inverses in REVERSE read order (palette lookup back to
    subtract-green space, then add green back) and restore the full
    width. 8x1 image over two colors, expected pixels hand-computed."""
    from cerberus_cpp_spark.sources.webpcodec import _subsample

    # original colors (r, g, b)
    c0, c1 = (40, 30, 20), (200, 100, 250)
    # forward SG space: (r-g, g, b-g) mod 256
    sg0 = ((40 - 30) & 0xFF, 30, (20 - 30) & 0xFF)
    sg1 = ((200 - 100) & 0xFF, 100, (250 - 100) & 0xFF)
    bits = [0, 1, 1, 0, 0, 1, 0, 1]
    bw = _BitWriter()
    header(bw, 8, 1)
    bw.write(1, 1)
    bw.write(2, 2)          # SUBTRACT_GREEN (no data)
    bw.write(1, 1)
    bw.write(3, 2)          # COLOR_INDEXING
    bw.write(2 - 1, 8)      # 2 colors
    # palette deltas in SG space: entry0 = (255, sg0), delta1 = sg1-sg0
    d0 = (255,) + sg0
    d1 = (0, (sg1[0] - sg0[0]) & 0xFF, (sg1[1] - sg0[1]) & 0xFF,
          (sg1[2] - sg0[2]) & 0xFF)
    bw.write(0, 1)          # sub-image: no cache
    g = write_simple_code(bw, [d0[2], d1[2]])
    r = write_simple_code(bw, [d0[1], d1[1]])
    b = write_simple_code(bw, [d0[3], d1[3]])
    a = write_simple_code(bw, [d0[0], d1[0]])
    write_simple_code(bw, [0])
    for d in (d0, d1):
        bw.write_code(*g[d[2]])
        bw.write_code(*r[d[1]])
        bw.write_code(*b[d[3]])
        bw.write_code(*a[d[0]])
    bw.write(0, 1)          # end of transforms
    # main image: packed width = 1 (2 colors -> 8 px per byte)
    assert _subsample(8, 3) == 1
    packed = sum(bit << i for i, bit in enumerate(bits))
    bw.write(0, 1)          # no meta
    bw.write(0, 1)          # no cache
    gm = write_simple_code(bw, [packed])
    write_simple_code(bw, [0])
    write_simple_code(bw, [0])
    write_simple_code(bw, [255])
    write_simple_code(bw, [0])
    bw.write_code(*gm[packed])
    out = decode_webp(wrap(bw.bytes()))
    expected = np.array(
        [[c1 if t else c0 for t in bits]], np.uint8)
    assert np.array_equal(out, expected)

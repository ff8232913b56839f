"""WebP lossless (VP8L) decoder fixtures.

The encoder here is written INDEPENDENTLY from the spec (RFC 9649 §3)
— LSB-first bit packing, canonical prefix codes, code-length-coded and
simple code forms, LZ77 runs, color cache, and the subtract-green /
predictor / color-indexing transforms — so a decoder bug cannot be
mirrored by a shared helper (same falsification structure as the
GIF-LZW and progressive-JPEG fixture encoders)."""

import numpy as np
import pytest


# --------------------------------------------------------------------------
# independent spec-written VP8L encoder
# --------------------------------------------------------------------------


class _Bw:
    """LSB-first bit writer (spec §3.1)."""

    def __init__(self):
        self.bits = []

    def w(self, val, n):
        for i in range(n):
            self.bits.append((val >> i) & 1)

    def code(self, code, length):
        """Prefix-code bits are written MSB-first (canonical/DEFLATE)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i // 8] |= b << (i % 8)
        return bytes(out)


def _canon(lengths):
    """symbol -> (length, code), canonical RFC 1951 assignment."""
    used = sorted((ln, s) for s, ln in lengths.items() if ln)
    table, code, prev_len = {}, 0, 0
    for ln, s in used:
        code <<= ln - prev_len
        table[s] = (ln, code)
        code += 1
        prev_len = ln
    return table


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _write_prefix(bw, used_symbols, alphabet_size):
    """Write a prefix code for the used symbols; return symbol->(len,code).

    <=2 symbols -> the simple form; otherwise the code-length-coded form
    with equal lengths L = ceil(log2(k)) written one CL symbol at a time
    (CL code = two symbols {0, L} of length 1)."""
    syms = sorted(used_symbols)
    if len(syms) == 1:
        bw.w(1, 1)  # simple
        bw.w(0, 1)  # num_symbols - 1 = 0
        bw.w(1, 1)  # 8-bit symbol
        bw.w(syms[0], 8)
        return {syms[0]: (0, 0)}
    if len(syms) == 2:
        bw.w(1, 1)
        bw.w(1, 1)  # two symbols
        bw.w(1, 1)  # 8-bit first symbol
        bw.w(syms[0], 8)
        bw.w(syms[1], 8)
        return {syms[0]: (1, 0), syms[1]: (1, 1)}
    L = max(1, (len(syms) - 1).bit_length())
    bw.w(0, 1)  # code-length-coded
    n_cl = max(_CL_ORDER.index(0), _CL_ORDER.index(L)) + 1
    bw.w(n_cl - 4, 4)
    for i in range(n_cl):
        bw.w(1 if _CL_ORDER[i] in (0, L) else 0, 3)
    bw.w(0, 1)  # no explicit max_symbol
    # CL code: symbols {0, L} both length 1 -> canonical 0 -> '0', L -> '1'
    used = set(syms)
    for s in range(alphabet_size):
        bw.w(1 if s in used else 0, 1)
    return {s: (L, i) for i, s in enumerate(syms)}


def _lz77_sym(v):
    """value -> (symbol, extra_bits_value, extra_bits_count) (§3.6.2.2)."""
    if v <= 4:
        return v - 1, 0, 0
    extra = (v - 1).bit_length() - 2
    offset = (2 + (((v - 1) >> extra) & 1)) << extra
    sym = 2 * extra + (((v - 1) >> extra) & 1) + 2
    return sym, v - offset - 1, extra


def _vp8l_payload(bw_body, w, h):
    head = _Bw()
    head.w(0x2F, 8)
    head.w(w - 1, 14)
    head.w(h - 1, 14)
    head.w(0, 1)  # alpha hint
    head.w(0, 3)  # version
    head.bits += bw_body.bits
    return head.tobytes()


def _wrap_riff(payload):
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\0"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def _encode_pixels(bw, argb_flat, runs=False, cache_bits=0):
    """Spatially-coded image body: no meta codes, optional color cache,
    literal pixels with optional dist-1 LZ77 runs."""
    bw.w(0, 1)  # no meta prefix codes
    if cache_bits:
        bw.w(1, 1)
        bw.w(cache_bits, 4)
    else:
        bw.w(0, 1)
    cache = [None] * (1 << cache_bits) if cache_bits else None

    # plan the token stream first so prefix codes know their alphabets
    tokens = []  # ('lit', argb) | ('run', length) | ('cache', idx)
    i, n = 0, len(argb_flat)
    while i < n:
        p = argb_flat[i]
        if runs and i > 0 and p == argb_flat[i - 1]:
            j = i
            while j < n and argb_flat[j] == p:
                j += 1
            if j - i >= 3:
                tokens.append(("run", j - i))
                i = j
                continue
        if cache is not None:
            idx = ((0x1E35A7BD * p) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == p:
                tokens.append(("cache", idx))
                i += 1
                continue
            cache[idx] = p
        tokens.append(("lit", p))
        i += 1

    g_used, r_used, b_used, a_used, d_used = set(), set(), set(), set(), set()
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            g_used.add((p >> 8) & 0xFF)
            r_used.add((p >> 16) & 0xFF)
            b_used.add(p & 0xFF)
            a_used.add((p >> 24) & 0xFF)
        elif t[0] == "run":
            g_used.add(256 + _lz77_sym(t[1])[0])
            d_used.add(_lz77_sym(2)[0])  # dist_code value 2 -> (1,0) -> dist 1
        else:
            g_used.add(280 + t[1])
    if not d_used:
        d_used = {0}
    for ch in (r_used, b_used, a_used):
        if not ch:
            ch.add(0)
    g_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gc = _write_prefix(bw, g_used, g_alpha)
    rc = _write_prefix(bw, r_used, 256)
    bc = _write_prefix(bw, b_used, 256)
    ac = _write_prefix(bw, a_used, 256)
    dc = _write_prefix(bw, d_used, 40)
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            bw.code(*reversed(gc[(p >> 8) & 0xFF]))
            bw.code(*reversed(rc[(p >> 16) & 0xFF]))
            bw.code(*reversed(bc[p & 0xFF]))
            bw.code(*reversed(ac[(p >> 24) & 0xFF]))
        elif t[0] == "run":
            sym, ev, ec = _lz77_sym(t[1])
            bw.code(*reversed(gc[256 + sym]))
            bw.w(ev, ec)
            dsym, dev, dec_ = _lz77_sym(2)
            bw.code(*reversed(dc[dsym]))
            bw.w(dev, dec_)
        else:
            bw.code(*reversed(gc[280 + t[1]]))


def _rgb_to_argb_flat(img):
    return [
        int(0xFF000000 | (int(r) << 16) | (int(g) << 8) | int(b))
        for r, g, b in img.reshape(-1, 3)
    ]


def encode_vp8l(img, runs=False, cache_bits=0, subtract_green=False):
    """Literal/run VP8L encoder, optional subtract-green transform."""
    h, w = img.shape[:2]
    flat = _rgb_to_argb_flat(img)
    bw = _Bw()
    if subtract_green:
        bw.w(1, 1)  # transform present
        bw.w(2, 2)  # subtract-green
        sg = []
        for p in flat:
            g = (p >> 8) & 0xFF
            r = (((p >> 16) & 0xFF) - g) & 0xFF
            b = ((p & 0xFF) - g) & 0xFF
            sg.append((p & 0xFF00FF00) | (r << 16) | b)
        flat = sg
    bw.w(0, 1)  # no more transforms
    _encode_pixels(bw, flat, runs=runs, cache_bits=cache_bits)
    return _wrap_riff(_vp8l_payload(bw, w, h))


def encode_vp8l_palette(img, palette):
    """Color-indexing transform: img values are palette indices."""
    h, w = img.shape[:2]
    psize = len(palette)
    bw = _Bw()
    bw.w(1, 1)
    bw.w(3, 2)  # color indexing
    bw.w(psize - 1, 8)
    # palette image (1 x psize), delta-encoded componentwise
    deltas, prev = [], 0
    for r, g, b in palette:
        cur = 0xFF000000 | (int(r) << 16) | (int(g) << 8) | int(b)
        d = (
            ((((cur >> 24) - (prev >> 24)) & 0xFF) << 24)
            | ((((cur >> 16) - (prev >> 16)) & 0xFF) << 16)
            | ((((cur >> 8) - (prev >> 8)) & 0xFF) << 8)
            | (((cur - prev) & 0xFF))
        )
        deltas.append(d)
        prev = cur
    _encode_pixels(bw, deltas)
    bw.w(0, 1)  # no more transforms
    pack = 3 if psize <= 2 else 2 if psize <= 4 else 1 if psize <= 16 else 0
    if pack:
        per = 1 << pack
        ibits = 8 >> pack
        pw = (w + per - 1) >> pack
        packed = []
        for y in range(h):
            for px in range(pw):
                gv = 0
                for k in range(per):
                    x = (px << pack) + k
                    if x < w:
                        gv |= int(img[y, x]) << (k * ibits)
                packed.append(0xFF000000 | (gv << 8))
        flat = packed
    else:
        flat = [0xFF000000 | (int(v) << 8) for v in img.reshape(-1)]
    _encode_pixels(bw, flat)
    return _wrap_riff(_vp8l_payload(bw, w, h))


def _spec_predict(mode, left, top, tl, tr):
    """Independent predictor implementation from RFC 9649 §4.2.2."""
    def ch(p):
        return [(p >> s) & 0xFF for s in (24, 16, 8, 0)]

    def pack(v):
        return (v[0] << 24) | (v[1] << 16) | (v[2] << 8) | v[3]

    def avg2(a, b):
        return pack([(x + y) // 2 for x, y in zip(ch(a), ch(b))])

    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return avg2(avg2(left, tr), top)
    if mode == 6:
        return avg2(left, tl)
    if mode == 7:
        return avg2(left, top)
    if mode == 8:
        return avg2(tl, top)
    if mode == 9:
        return avg2(top, tr)
    if mode == 10:
        return avg2(avg2(left, tl), avg2(top, tr))
    lc, tc, cc = ch(left), ch(top), ch(tl)
    if mode == 11:
        p = [lc[i] + tc[i] - cc[i] for i in range(4)]
        pl = sum(abs(p[i] - lc[i]) for i in range(4))
        pt = sum(abs(p[i] - tc[i]) for i in range(4))
        return left if pl < pt else top
    if mode == 12:
        return pack([min(max(lc[i] + tc[i] - cc[i], 0), 255) for i in range(4)])
    out = []
    for i in range(4):
        a = (lc[i] + tc[i]) // 2
        # (a - c) / 2 truncates toward zero (libwebp C division), NOT floor
        d = a - cc[i]
        half = -((-d) // 2) if d < 0 else d // 2
        out.append(min(max(a + half, 0), 255))
    return pack(out)


def encode_vp8l_predictor(img, bits=3, mode_of=lambda bx, by: (bx + by) % 14):
    """Predictor transform: per-block modes, residual-coded pixels."""
    h, w = img.shape[:2]
    flat = _rgb_to_argb_flat(img)
    bw = _Bw()
    bw.w(1, 1)
    bw.w(0, 2)  # predictor transform
    bw.w(bits - 2, 3)
    bwid = (w + (1 << bits) - 1) >> bits
    bhei = (h + (1 << bits) - 1) >> bits
    modes = [
        0xFF000000 | (mode_of(bx, by) << 8)
        for by in range(bhei)
        for bx in range(bwid)
    ]
    _encode_pixels(bw, modes)
    bw.w(0, 1)  # no more transforms
    res = []
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = flat[pos - 1]
        elif x == 0:
            pred = flat[pos - w]
        else:
            pred = _spec_predict(
                mode_of(x >> bits, y >> bits),
                flat[pos - 1], flat[pos - w], flat[pos - w - 1],
                flat[pos - w + 1],
            )
        p, q = flat[pos], pred
        res.append(
            ((((p >> 24) - (q >> 24)) & 0xFF) << 24)
            | ((((p >> 16) - (q >> 16)) & 0xFF) << 16)
            | ((((p >> 8) - (q >> 8)) & 0xFF) << 8)
            | ((p - q) & 0xFF)
        )
    _encode_pixels(bw, res)
    return _wrap_riff(_vp8l_payload(bw, w, h))


def encode_vp8l_meta(img, meta_bits=2):
    """Meta prefix codes: two code groups, split by image half (left
    blocks use group 0, right blocks group 1)."""
    h, w = img.shape[:2]
    flat = _rgb_to_argb_flat(img)
    bw = _Bw()
    bw.w(0, 1)  # no transforms
    bw.w(1, 1)  # meta prefix codes present
    bw.w(meta_bits - 2, 3)
    mw = (w + (1 << meta_bits) - 1) >> meta_bits
    mh = (h + (1 << meta_bits) - 1) >> meta_bits

    def group_of(x, y):
        return 0 if x < w // 2 else 1

    meta_pixels = [
        0xFF000000 | (group_of(bx << meta_bits, by << meta_bits) << 8)
        for by in range(mh)
        for bx in range(mw)
    ]
    _encode_pixels(bw, meta_pixels)
    bw.w(0, 1)  # no color cache
    used = [
        {"g": set(), "r": set(), "b": set(), "a": set()} for _ in range(2)
    ]
    for pos, p in enumerate(flat):
        u = used[group_of(pos % w, pos // w)]
        u["g"].add((p >> 8) & 0xFF)
        u["r"].add((p >> 16) & 0xFF)
        u["b"].add(p & 0xFF)
        u["a"].add((p >> 24) & 0xFF)
    codes = []
    for u in used:
        gc = _write_prefix(bw, u["g"], 256 + 24)
        rc = _write_prefix(bw, u["r"], 256)
        bc = _write_prefix(bw, u["b"], 256)
        ac = _write_prefix(bw, u["a"], 256)
        dc = _write_prefix(bw, {0}, 40)
        codes.append((gc, rc, bc, ac, dc))
    for pos, p in enumerate(flat):
        gc, rc, bc, ac, _ = codes[group_of(pos % w, pos // w)]
        bw.code(*reversed(gc[(p >> 8) & 0xFF]))
        bw.code(*reversed(rc[(p >> 16) & 0xFF]))
        bw.code(*reversed(bc[p & 0xFF]))
        bw.code(*reversed(ac[(p >> 24) & 0xFF]))
    return _wrap_riff(_vp8l_payload(bw, w, h))


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def test_vp8l_literals_roundtrip():
    from image_search_indexing_spark.operators.multimodal import (
        decode_image,
        decode_webp,
        parse_image_dims,
        sniff_mime,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)
    data = encode_vp8l(img)
    assert sniff_mime(data) == "image/webp"
    assert parse_image_dims(data) == (7, 9)
    got = decode_webp(data)
    assert got is not None and np.array_equal(got, img)
    assert np.array_equal(decode_image(data), img)  # dispatch


def test_vp8l_simple_codes_two_colors():
    from image_search_indexing_spark.operators.multimodal import decode_webp

    rng = np.random.RandomState(5)
    # two distinct values per channel -> simple prefix codes throughout
    img = np.where(
        rng.rand(8, 8, 3) < 0.5,
        np.array([17, 200, 33], np.uint8),
        np.array([250, 3, 99], np.uint8),
    ).astype(np.uint8)
    got = decode_webp(encode_vp8l(img))
    assert got is not None and np.array_equal(got, img)


def test_vp8l_lz77_runs_and_color_cache():
    from image_search_indexing_spark.operators.multimodal import decode_webp

    rng = np.random.RandomState(7)
    img = np.zeros((12, 16, 3), np.uint8)
    img[:] = (40, 90, 140)                       # long dist-1 runs
    img[3, 2:9] = (200, 10, 10)
    img[7] = rng.randint(0, 256, (16, 3))        # literal row
    img[9] = img[7]                              # re-hits for the cache
    for variant in (
        encode_vp8l(img, runs=True),
        encode_vp8l(img, runs=True, cache_bits=6),
        encode_vp8l(img, cache_bits=4),
    ):
        got = decode_webp(variant)
        assert got is not None and np.array_equal(got, img)


def test_vp8l_subtract_green_transform():
    from image_search_indexing_spark.operators.multimodal import decode_webp

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (6, 11, 3)).astype(np.uint8)
    got = decode_webp(encode_vp8l(img, subtract_green=True))
    assert got is not None and np.array_equal(got, img)


def test_vp8l_palette_packing():
    from image_search_indexing_spark.operators.multimodal import decode_webp

    rng = np.random.RandomState(9)
    for ncolors in (2, 4, 13, 40):
        palette = rng.randint(0, 256, (ncolors, 3)).astype(np.uint8)
        idx = rng.randint(0, ncolors, (10, 13)).astype(np.uint8)
        got = decode_webp(encode_vp8l_palette(idx, [tuple(c) for c in palette]))
        assert got is not None, ncolors
        assert np.array_equal(got, palette[idx]), ncolors


def test_vp8l_predictor_transform_all_modes():
    from image_search_indexing_spark.operators.multimodal import decode_webp

    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (24, 31, 3)).astype(np.uint8)
    # bits=2 -> 4x4 blocks -> 8x6 block grid: every mode 0..13 appears
    got = decode_webp(encode_vp8l_predictor(img, bits=2))
    assert got is not None and np.array_equal(got, img)
    # smooth gradient (the shape predictors exist for) also survives
    grad = np.zeros((16, 16, 3), np.uint8)
    for y in range(16):
        for x in range(16):
            grad[y, x] = (x * 16, y * 16 % 256, (x + y) * 8 % 256)
    got = decode_webp(encode_vp8l_predictor(grad, bits=4, mode_of=lambda bx, by: 12))
    assert got is not None and np.array_equal(got, grad)


def test_vp8l_predictor_mode13_truncates_toward_zero():
    """ClampAddSubtractHalf with ODD NEGATIVE (avg - topleft) deltas:
    C division truncates toward zero where Python's // floors, so e.g.
    avg=10, tl=13 must predict 10 + trunc(-3/2) = 9, not 8 — and because
    reconstructed pixels feed later predictions, a floor-division decoder
    corrupts everything right of the first odd negative delta."""
    from image_search_indexing_spark.operators.multimodal import decode_webp

    # values chosen so (left+top)//2 - tl is odd and negative at many
    # pixels: descending rows against an ascending first column
    img = np.zeros((12, 13, 3), np.uint8)
    for y in range(12):
        for x in range(13):
            img[y, x] = ((250 - 7 * x - 3 * y) % 256, (5 + 11 * x) % 256, (200 - 5 * y) % 256)
    got = decode_webp(encode_vp8l_predictor(img, bits=4, mode_of=lambda bx, by: 13))
    assert got is not None and np.array_equal(got, img)


def test_vp8l_meta_prefix_groups():
    from image_search_indexing_spark.operators.multimodal import decode_webp

    rng = np.random.RandomState(17)
    # left half: a narrow value range; right half: a different one — two
    # genuinely distinct code groups selected via the entropy image
    img = np.zeros((12, 16, 3), np.uint8)
    img[:, :8] = rng.randint(0, 40, (12, 8, 3))
    img[:, 8:] = rng.randint(200, 256, (12, 8, 3))
    got = decode_webp(encode_vp8l_meta(img, meta_bits=2))
    assert got is not None and np.array_equal(got, img)
    got = decode_webp(encode_vp8l_meta(img, meta_bits=3))
    assert got is not None and np.array_equal(got, img)


def test_vp8l_malformed_and_stub_paths():
    from image_search_indexing_spark.operators.multimodal import decode_webp

    img = np.zeros((4, 4, 3), np.uint8)
    data = encode_vp8l(img)
    assert decode_webp(None) is None
    assert decode_webp(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert decode_webp(data[:20]) is None            # truncated
    bad = bytearray(data)
    bad[12:16] = b"VP8 "                             # lossy: declared stub
    assert decode_webp(bytes(bad)) is None
    # version != 0 rejected: VP8L body starts at 20 (RIFF 12 + chunk hdr 8),
    # the 3 version bits are the top bits of header byte 4
    payload = bytearray(data)
    payload[20 + 4] |= 0xE0
    assert decode_webp(bytes(payload)) is None


def test_vp8l_through_phash_and_media_pipeline(spark):
    """WebP payloads flow through the Arrow decode path end-to-end:
    phash_frame decodes them and hashes match the direct pixel hash."""
    from image_search_indexing_spark.operators.multimodal import (
        decode_webp,
        phash64,
        phash_frame,
    )

    rng = np.random.RandomState(21)
    rows, want = [], {}
    for i in range(6):
        img = rng.randint(0, 256, (16 + i, 20, 3)).astype(np.uint8)
        data = encode_vp8l(img, subtract_green=bool(i % 2))
        rows.append((i, bytearray(data)))
        want[i] = phash64(img)
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["phash"] for r in phash_frame(df).collect()}
    assert got == want

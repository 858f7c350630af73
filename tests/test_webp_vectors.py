"""Hand-derived VP8L bitstream vectors (RFC 9649), built field-by-field
with an independent LSB-first bit packer — no webpcodec writer code, no
webpcodec Huffman machinery. Our encoder emits only literal-coded
normal-prefix streams, so none of these byte sequences can come out of
it: they exercise simple prefix codes, explicit code-length-coded
trees, LZ77 backward references through the 2-D distance map, and the
color cache purely from the spec's field tables. Expected pixels are
stated from the spec, not computed by the decoder under test.

(The JPEG analogue — vectors from a genuinely foreign implementation —
lives in test_jpeg_vectors.py; no external WebP codec exists in this
container, so these are spec-derived rather than foreign-generated.)
"""

import numpy as np

from smcchecker_spark import webpcodec as wc


class _Pack:
    """Independent LSB-first bit packer (mirrors the byte order RFC
    9649 §5 defines; deliberately NOT webpcodec._BitWriter)."""

    def __init__(self):
        self.nbits = 0
        self.acc = bytearray()

    def put(self, value: int, nbits: int) -> None:
        for k in range(nbits):
            if self.nbits % 8 == 0:
                self.acc.append(0)
            if (value >> k) & 1:
                self.acc[-1] |= 1 << (self.nbits % 8)
            self.nbits += 1

    def put_code(self, code: int, length: int) -> None:
        # prefix-code bits enter the stream root-first (MSB of the
        # canonical code first)
        for k in range(length - 1, -1, -1):
            self.put((code >> k) & 1, 1)

    def bytes(self) -> bytes:
        return bytes(self.acc)


def _container(payload: bytes) -> bytes:
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def _vp8l(w: int, h: int, body: _Pack) -> bytes:
    head = _Pack()
    head.put(w - 1, 14)
    head.put(h - 1, 14)
    head.put(0, 1)  # alpha hint
    head.put(0, 3)  # version
    # splice head+body at bit level
    full = _Pack()
    for src in (head, body):
        for i in range(src.nbits):
            full.put((src.acc[i // 8] >> (i % 8)) & 1, 1)
    return _container(b"\x2f" + full.bytes())


def _simple1(p: _Pack, sym: int) -> None:
    """Simple prefix code, one symbol (consumes zero data bits)."""
    p.put(1, 1)  # simple
    p.put(0, 1)  # 1 symbol
    if sym < 2:
        p.put(0, 1)  # 1-bit first symbol
        p.put(sym, 1)
    else:
        p.put(1, 1)  # 8-bit first symbol
        p.put(sym, 8)


def _explicit_lengths(p: _Pack, lengths: dict[int, int], alphabet: int):
    """Normal prefix code written the verbose way: a {0,1,2}-symbol
    code-length code and one explicit length per alphabet symbol
    (``lengths`` values must be 1 or 2 and Kraft-complete)."""
    p.put(0, 1)  # not simple
    p.put(1, 4)  # n_codes = 5 → CLC order prefix [17, 18, 0, 1, 2]
    for ln in (0, 0, 1, 2, 2):  # lengths for CLC symbols 17, 18, 0, 1, 2
        p.put(ln, 3)
    p.put(0, 1)  # no max_symbol cap
    # CLC canonical codes: sym 0 → '0', sym 1 → '10', sym 2 → '11'
    codes = {0: (0b0, 1), 1: (0b10, 2), 2: (0b11, 2)}
    for s in range(alphabet):
        p.put_code(*codes[lengths.get(s, 0)])


def test_simple_code_1x1():
    """1x1 red pixel, every tree a one-symbol simple code — the whole
    pixel costs zero data bits."""
    p = _Pack()
    p.put(0, 1)  # no transforms
    p.put(0, 1)  # no color cache
    p.put(0, 1)  # no meta prefix
    _simple1(p, 0)    # green = 0
    _simple1(p, 255)  # red = 255
    _simple1(p, 0)    # blue = 0
    _simple1(p, 255)  # alpha = 255
    _simple1(p, 0)    # distance (unused, must be valid)
    dec = wc.decode_webp(_vp8l(1, 1, p))
    assert np.array_equal(dec, np.array([[[255, 0, 0]]], dtype=np.uint8))


def test_lz77_backward_reference_2x2():
    """2x2: one literal pixel + a length-3 copy at distance code 2
    (2-D map entry (1,0) → distance 1) — all four pixels identical.
    The green tree carries a literal and a length symbol, so it can't
    be a simple code: written via an explicit code-length code."""
    p = _Pack()
    p.put(0, 1)  # no transforms
    p.put(0, 1)  # no color cache
    p.put(0, 1)  # no meta prefix
    # green alphabet 280: literal 10 and length-prefix 258 (length 3)
    _explicit_lengths(p, {10: 1, 258: 1}, 280)
    _simple1(p, 20)   # red
    _simple1(p, 30)   # blue
    _simple1(p, 255)  # alpha
    _simple1(p, 1)    # distance symbol 1 → dist code 2 → map (1,0)
    # data: green '0' → literal (r=20, g=10, b=30); green '1' → copy
    p.put_code(0, 1)
    p.put_code(1, 1)
    dec = wc.decode_webp(_vp8l(2, 2, p))
    exp = np.full((2, 2, 3), (20, 10, 30), dtype=np.uint8)
    assert np.array_equal(dec, exp)


def test_color_cache_2x1():
    """2x1: literal pixel then a color-cache hit. The cache index is
    the spec's multiplicative hash of the packed ARGB value."""
    cbits = 1
    argb = (255 << 24) | (1 << 16) | (2 << 8) | 3  # a=255 r=1 g=2 b=3
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cbits)
    p = _Pack()
    p.put(0, 1)      # no transforms
    p.put(1, 1)      # color cache present
    p.put(cbits, 4)
    p.put(0, 1)      # no meta prefix
    # green alphabet 256+24+2 = 282: literal 2 + cache symbol 280+idx
    _explicit_lengths(p, {2: 1, 280 + idx: 1}, 282)
    _simple1(p, 1)    # red
    _simple1(p, 3)    # blue
    _simple1(p, 255)  # alpha
    _simple1(p, 0)    # distance (unused)
    p.put_code(0, 1)  # literal
    p.put_code(1, 1)  # cache hit
    dec = wc.decode_webp(_vp8l(2, 1, p))
    exp = np.full((1, 2, 3), (1, 2, 3), dtype=np.uint8)
    assert np.array_equal(dec, exp)


def test_length_extra_bits_4x2():
    """Length prefix 4 (green sym 260) carries one extra bit: value
    ((2 + (4&1)) << 1) + extra + 1 = 5 + extra. extra=1 → length 6 at
    distance 1: seven identical pixels after one literal (cyclic
    overlap copy)."""
    p = _Pack()
    p.put(0, 1)
    p.put(0, 1)
    p.put(0, 1)
    _explicit_lengths(p, {7: 1, 260: 1}, 280)
    _simple1(p, 40)   # red
    _simple1(p, 50)   # blue
    _simple1(p, 255)  # alpha
    _simple1(p, 1)    # distance code 2 → (1,0) → 1
    p.put_code(0, 1)  # literal (40, 7, 50)
    p.put_code(1, 1)  # length prefix 260
    p.put(1, 1)       # extra bit → length 6
    # 1 + 6 = 7 pixels; the 8th is another literal
    p.put_code(0, 1)
    dec = wc.decode_webp(_vp8l(4, 2, p))
    exp = np.full((2, 4, 3), (40, 7, 50), dtype=np.uint8)
    assert np.array_equal(dec, exp)


def test_distance_17_extra_bits_wide_image():
    """Distance prefix codes 36-39 carry 17-18 extra bits — wider than
    one 16-bit window, so the reader must compose two windows. A
    truncated read (the old single-window form) lands 65,536 pixels
    away from the true source; a period-3 green pattern makes that
    land on different pixel values. ~330k-pixel stream also forces
    multiple window-slab refills at the default slab size."""
    w, h = 1024, 322
    total = w * h
    L = 327650  # literals before the backward reference
    dist = 327600
    eb = 0x10000 + 39  # bit 16 set — truncation would read 39
    # dcode 36: base (2 + 0) << 17; dist_pre = base + eb + 1; > 120
    assert ((2 + 0) << 17) + eb + 1 - 120 == dist

    p = _Pack()
    p.put(0, 1)  # no transforms
    p.put(0, 1)  # no color cache
    p.put(0, 1)  # no meta prefix
    # green tree: literals 5 ('10') and 9 ('11'), length-prefix 258
    # ('0', length 3)
    _explicit_lengths(p, {5: 2, 9: 2, 258: 1}, 280)
    _simple1(p, 77)   # red
    _simple1(p, 88)   # blue
    _simple1(p, 255)  # alpha
    _simple1(p, 36)   # distance prefix 36 → 17 extra bits
    greens = []

    def put_literal(k):
        g = 5 if k % 3 == 0 else 9
        p.put_code(0b10 if g == 5 else 0b11, 2)
        greens.append(g)

    for k in range(L):
        put_literal(k)
    p.put_code(0b0, 1)  # length prefix 258 → length 3
    p.put(eb, 17)       # distance extra bits (LSB first)
    for k in range(L, L + total - L - 3):
        put_literal(k)
    dec = wc.decode_webp(_vp8l(w, h, p))

    # expected: simulate the copy over the literal green sequence
    exp_g = greens[:L] + [greens[L - dist + i] for i in range(3)] \
        + greens[L:]
    exp = np.zeros((h, w, 3), dtype=np.uint8)
    exp[:, :, 0] = 77
    exp[:, :, 1] = np.array(exp_g, dtype=np.uint8).reshape(h, w)
    exp[:, :, 2] = 88
    assert np.array_equal(dec, exp)


def test_window_slab_refill_parity(monkeypatch):
    """Force a tiny window slab so every refill site (fixed fields,
    CLC reads, all five tree reads, both extra-bits reads) triggers
    constantly; decode must be bit-identical to the default slab."""
    streams = []
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    streams.append(wc.encode_webp(a))
    refs = [wc.decode_webp(s) for s in streams]
    monkeypatch.setattr(wc, "_WINDOW_CHUNK_BYTES", 3)
    for s, ref in zip(streams, refs):
        assert np.array_equal(wc.decode_webp(s), ref)


# ---------------------------------------------------------------------------
# Native pixel-loop kernel vs the Python reference walk
# ---------------------------------------------------------------------------


def _collect_streams():
    """A spread of VP8L payloads: encoder roundtrips plus the
    hand-built vectors above (simple codes, CLC trees, LZ77, cache,
    wide distances)."""
    rng = np.random.default_rng(17)
    streams = []
    for h, w in ((1, 1), (7, 9), (16, 16), (23, 5)):
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        streams.append(wc.encode_webp(a))

    def grab(build):
        p = _Pack()
        build(p)
        return p

    # rebuild the vector payloads byte-for-byte
    p = _Pack()
    p.put(0, 1); p.put(0, 1); p.put(0, 1)
    _explicit_lengths(p, {10: 1, 258: 1}, 280)
    _simple1(p, 20); _simple1(p, 30); _simple1(p, 255); _simple1(p, 1)
    p.put_code(0, 1); p.put_code(1, 1)
    streams.append(_vp8l(2, 2, p))

    cbits = 1
    argb = (255 << 24) | (1 << 16) | (2 << 8) | 3
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cbits)
    p = _Pack()
    p.put(0, 1); p.put(1, 1); p.put(cbits, 4); p.put(0, 1)
    _explicit_lengths(p, {2: 1, 280 + idx: 1}, 282)
    _simple1(p, 1); _simple1(p, 3); _simple1(p, 255); _simple1(p, 0)
    p.put_code(0, 1); p.put_code(1, 1)
    streams.append(_vp8l(2, 1, p))
    return streams


def test_native_python_pixel_parity(monkeypatch):
    from smcchecker_spark import native

    if native.vp8lpix() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    streams = _collect_streams()
    dec_native = [wc.decode_webp(s) for s in streams]
    monkeypatch.setitem(native._cache, "vp8lpix.c", False)
    for i, s in enumerate(streams):
        assert np.array_equal(wc.decode_webp(s), dec_native[i]), i


def test_native_python_error_parity(monkeypatch):
    """Corrupt payload bytes must raise the same ValueError text on
    both paths."""
    from smcchecker_spark import native

    if native.vp8lpix() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    rng = np.random.default_rng(23)
    a = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    base = bytearray(wc.encode_webp(a))
    corrupted = []
    for _ in range(40):
        mut = bytearray(base)
        for at in rng.integers(30, len(base), size=2):
            mut[at] ^= int(rng.integers(1, 256))
        corrupted.append(bytes(mut))

    def outcomes():
        res = []
        for s in corrupted:
            try:
                res.append(wc.decode_webp(s).tobytes())
            except ValueError as e:
                res.append(str(e))
        return res

    got_native = outcomes()
    monkeypatch.setitem(native._cache, "vp8lpix.c", False)
    assert outcomes() == got_native


def test_native_python_tree_parity(monkeypatch):
    """vp8ltree.c (the code-length read loop) must produce identical
    decodes AND identical error texts to the Python loop — across the
    hand-built RFC streams, real encodes, and corrupted mutants."""
    from smcchecker_spark import native

    if native.vp8ltree() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    rng = np.random.default_rng(31)
    streams = _collect_streams()
    for i in range(6):
        a = rng.integers(0, 256, (8 + i * 5, 8 + i * 3, 3), dtype=np.uint8)
        streams.append(wc.encode_webp(a))
    corrupted = []
    for _ in range(40):
        mut = bytearray(streams[-1])
        for at in rng.integers(30, len(mut), size=2):
            mut[at] ^= int(rng.integers(1, 256))
        corrupted.append(bytes(mut))

    def outcomes():
        wc._TREE_CACHE.clear()  # force construction through each path
        res = []
        for s in streams + corrupted:
            try:
                res.append(wc.decode_webp(s).tobytes())
            except ValueError as e:
                res.append(str(e))
        return res

    got_native = outcomes()
    monkeypatch.setitem(native._cache, "vp8ltree.c", False)
    assert outcomes() == got_native

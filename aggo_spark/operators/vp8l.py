"""VP8L (lossless WebP) pixel codec — pure Python, executor-side.

r12 (verdict r11 next #4): ``webp_decode`` was header-only with
honestly-NULL pixel stats; VP8L is tractable without a video stack —
canonical prefix codes over an LSB-first bitstream (the GIF LZW reader
is the same plumbing), an LZ77 layer with a 2-D "plane code" distance
map, a color cache, and four invertible transforms (predictor, color,
subtract-green, color-indexing) — no DCT anywhere. Implements the
WebP Lossless Bitstream Specification (RFC 9649); VP8 *lossy* has its
own real intra decoder since r13 (:mod:`.vp8`, RFC 6386, verified
bit-exact against libwebp).

The decoder is budget-bounded (``max_pixels``) and returns None on any
structural violation — over-subscribed prefix codes, out-of-range
cache/palette/backref indices, truncated bitstreams — so corrupt blobs
fall back to the header tier with NULL means, never fabricated stats
(the JPEG-tier convention, multimodal.py).

Verification note: no real-encoder WebP files exist in this container
(no PIL/libwebp), so parity is fixture-based — :func:`encode_vp8l`
exercises every decoder path (simple + normal prefix codes, meta-free
and cache-carrying streams, LZ row copies via BOTH direct distances
and plane codes, all four transforms) and corruption fuzz pins the
no-raise contract. The plane-code neighborhood is generated from the
spec's ordering rule (x in [-7, 8], y in [0, 7], sorted by squared
distance then larger y then positive x first), checked against the
table prefix in RFC 9649 §5.2.3.
"""

from __future__ import annotations

__all__ = ["vp8l_pixels", "alpha_plane", "encode_vp8l",
           "encode_webp_vp8l"]

# ---------------------------------------------------------------------------
# bit I/O — VP8L packs bits LSB-first; prefix-code BITS are read one at
# a time MSB-of-code-first (code = code<<1 | bit), value fields LSB-first
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0          # absolute bit position
        self.n = len(data) * 8

    def read(self, nbits: int) -> int:
        """Word-at-a-time LSB-first read (r13, verdict r12 #7): one
        byte-slice + shift instead of a per-bit gather loop."""
        p = self.pos
        if p + nbits > self.n:
            raise IndexError("bitstream exhausted")
        v = int.from_bytes(self.d[p >> 3:(p + nbits + 7) >> 3], "little")
        self.pos = p + nbits
        return (v >> (p & 7)) & ((1 << nbits) - 1)

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.n:
            raise IndexError("bitstream exhausted")
        self.pos = p + 1
        return (self.d[p >> 3] >> (p & 7)) & 1

    def peek(self, nbits: int) -> int:
        """Next ``nbits`` WITHOUT advancing; zero-padded past the end
        (complete prefix codes guarantee the symbol's true length is
        validated by the subsequent :meth:`skip`)."""
        p = self.pos
        v = int.from_bytes(self.d[p >> 3:(p + nbits + 7) >> 3], "little")
        return (v >> (p & 7)) & ((1 << nbits) - 1)

    def skip(self, nbits: int) -> None:
        if self.pos + nbits > self.n:
            raise IndexError("bitstream exhausted")
        self.pos += nbits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def put(self, value: int, nbits: int) -> None:
        """Append ``nbits`` of ``value``, LSB-first (value fields)."""
        self.acc |= (value & ((1 << nbits) - 1)) << self.nb
        self.nb += nbits
        while self.nb >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nb -= 8

    def put_code(self, code: int, length: int) -> None:
        """Append a prefix code MSB-of-code-first (how readers consume
        prefix codes: one bit at a time, code = code<<1 | bit)."""
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.out)
        if self.nb:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes (deflate-style assignment)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol: (length, code)} for nonzero lengths, canonical order."""
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (ln, next_code[ln])
            next_code[ln] += 1
    return out


def _build_decoder(lengths: list[int]):
    """Decoder for a canonical code: ('single', sym) for the one-symbol
    degenerate code (decodes consuming zero bits), else a dict
    {(len, code): sym}. None if the code is not complete (the spec
    requires complete codes; rejecting over-/under-subscribed tables
    keeps corrupt streams on the None path)."""
    syms = [s for s, ln in enumerate(lengths) if ln > 0]
    if not syms:
        return None
    if len(syms) == 1:
        return ("single", syms[0])
    max_len = max(lengths)
    kraft = sum(1 << (max_len - ln) for ln in lengths if ln)
    if kraft != 1 << max_len:
        return None
    codes = _canonical_codes(lengths)
    if max_len <= _LUT_BITS:
        # flat one-shot lookup table (libwebp's root-table idea): the
        # stream is LSB-first while codes are consumed MSB-of-code
        # first, so the next max_len stream bits index the table at
        # bit_reverse(code) + every possible suffix. Completeness
        # (kraft == 1) guarantees every index is populated.
        lut: list = [None] * (1 << max_len)
        for sym, (ln, code) in codes.items():
            rev = 0
            c = code
            for _ in range(ln):
                rev = (rev << 1) | (c & 1)
                c >>= 1
            for idx in range(rev, 1 << max_len, 1 << ln):
                lut[idx] = (sym, ln)
        return ("lut", lut, max_len)
    return {(ln, code): sym for sym, (ln, code) in codes.items()}


# codes up to 11 bits (2048-entry table) decode via one peek+skip;
# longer codes (rare: VP8L caps lengths at 15) take the bit walk
_LUT_BITS = 11


def _read_symbol(br: _Bits, table) -> int:
    if isinstance(table, tuple):
        if table[0] == "lut":
            sym, ln = table[1][br.peek(table[2])]
            br.skip(ln)
            return sym
        return table[1]  # ("single", sym): consumes zero bits
    code = 0
    length = 0
    while True:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
        if length > 15:
            raise IndexError("prefix code over-long")


def _equal_weight_lengths(k: int) -> list[int]:
    """Complete code lengths for k equally-likely symbols: 2^L - r
    leaves at depth L and 2r at depth L+1 where k = 2^L + r."""
    if k == 1:
        return [0]  # caller special-cases single-symbol codes
    L = k.bit_length() - 1
    if k == (1 << L):
        return [L] * k
    r = k - (1 << L)
    return [L] * ((1 << L) - r) + [L + 1] * (2 * r)


# ---------------------------------------------------------------------------
# spec constants
# ---------------------------------------------------------------------------

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _plane_codes() -> list[tuple[int, int]]:
    """The 120-entry close-neighborhood distance map (RFC 9649
    §5.2.3), generated from its ordering rule: offsets (x, y) with
    x in [-7, 8], y in [0, 7], y > 0 or x > 0, sorted by squared
    distance, then larger y, then positive x before negative."""
    cands = [(x, y) for y in range(8) for x in range(-7, 9)
             if y > 0 or x > 0]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return cands


_PLANE = _plane_codes()
assert len(_PLANE) == 120


def _lz_prefix_value(br: _Bits, code: int) -> int:
    """LZ77 length/distance prefix decoding: codes 0..3 are the values
    1..4; above that, (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz_prefix_encode(value: int) -> tuple[int, int, int]:
    """(code, extra_value, extra_bits) — inverse of _lz_prefix_value."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    # codes 0..3 cover values 1..4 (the early-return path above)
    code = 2 * extra + ((v >> extra) & 1) + 2
    return code, v & ((1 << extra) - 1), extra


def _hash_pixel(px: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_prefix_code(br: _Bits, alphabet: int):
    """One prefix code: the 'simple' 1-2 symbol form or the normal
    form (code lengths themselves prefix-coded with repeats)."""
    if br.read_bit():  # simple
        nsym = br.read_bit() + 1
        if br.read_bit():
            s0 = br.read(8)
        else:
            s0 = br.read_bit()
        if nsym == 1:
            if s0 >= alphabet:
                return None
            return ("single", s0)
        s1 = br.read(8)
        if s0 >= alphabet or s1 >= alphabet or s0 == s1:
            return None
        # canonical: the SMALLER symbol takes code 0 regardless of the
        # order the two symbols were written in
        return {(1, 0): min(s0, s1), (1, 1): max(s0, s1)}
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = _build_decoder(cl_lengths)
    if cl_dec is None:
        return None
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = _read_symbol(br, cl_dec)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        else:
            if sym == 16:
                rep, fill = 3 + br.read(2), prev_len
            elif sym == 17:
                rep, fill = 3 + br.read(3), 0
            else:
                rep, fill = 11 + br.read(7), 0
            if i + rep > alphabet:
                return None
            for _ in range(rep):
                lengths[i] = fill
                i += 1
    return _build_decoder(lengths)


def _read_code_group(br: _Bits, cache_size: int):
    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    group = []
    for a in alphabets:
        dec = _read_prefix_code(br, a)
        if dec is None:
            return None
        group.append(dec)
    return group


def _decode_data(br: _Bits, w: int, h: int, allow_meta: bool,
                 max_pixels: int):
    """Entropy-coded pixel data at (w, h): color-cache-info,
    optional meta-prefix image (main image only), prefix-code groups,
    then the literal / backref / cache-hit stream. Returns a flat
    ARGB uint32 list or None."""
    if w <= 0 or h <= 0 or w * h > max_pixels:
        return None
    cache_bits = 0
    cache = None
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            return None
        cache = [0] * (1 << cache_bits)
    meta = None
    meta_bits = 0
    mw = 0
    ngroups = 1
    if allow_meta and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _decode_data(br, mw, mh, False, max_pixels)
        if meta_img is None:
            return None
        meta = [(px >> 8) & 0xFFFF for px in meta_img]
        ngroups = max(meta) + 1
    groups = []
    for _ in range(ngroups):
        g = _read_code_group(br, (1 << cache_bits) if cache_bits else 0)
        if g is None:
            return None
        groups.append(g)
    n = w * h
    out = [0] * n
    pos = 0
    x = 0
    g = groups[0]
    last_meta_ix = -1
    while pos < n:
        if meta is not None:
            mix = ((pos // w) >> meta_bits) * mw + (x >> meta_bits)
            if mix != last_meta_ix:
                g = groups[meta[mix]]
                last_meta_ix = mix
        s = _read_symbol(br, g[0])
        if s < 256:
            r = _read_symbol(br, g[1])
            bch = _read_symbol(br, g[2])
            a = _read_symbol(br, g[3])
            px = (a << 24) | (r << 16) | (s << 8) | bch
            out[pos] = px
            if cache is not None:
                cache[_hash_pixel(px, cache_bits)] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
        elif s < 280:
            length = _lz_prefix_value(br, s - 256)
            dsym = _read_symbol(br, g[4])
            dcode = _lz_prefix_value(br, dsym)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _PLANE[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                return None
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[_hash_pixel(px, cache_bits)] = px
                pos += 1
                x += 1
                if x == w:
                    x = 0
        else:
            if cache is None or s - 280 >= len(cache):
                return None
            px = cache[s - 280]
            out[pos] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
    return out


def _avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _c_div2(v: int) -> int:
    """C-style truncating division by 2 (Python // floors negatives)."""
    return v // 2 if v >= 0 else -((-v) // 2)


def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(l: int, t: int, tl: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        p_l += abs(tc - tlc)   # |pred - L| == |T - TL| per channel
        p_t += abs(lc - tlc)
    return l if p_l < p_t else t


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        px = 0
        for sh in (24, 16, 8, 0):
            c = _clamp255(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)
                          - ((tl >> sh) & 0xFF))
            px |= c << sh
        return px
    if mode == 13:
        px = 0
        for sh in (24, 16, 8, 0):
            a = (((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)) // 2
            c = _clamp255(a + _c_div2(a - ((tl >> sh) & 0xFF)))
            px |= c << sh
        return px
    return 0xFF000000  # modes > 13 are invalid; treated as black


def _add_pixels(a: int, b: int) -> int:
    return ((((a & 0xFF000000) + (b & 0xFF000000)) & 0xFF000000)
            | (((a & 0x00FF0000) + (b & 0x00FF0000)) & 0x00FF0000)
            | (((a & 0x0000FF00) + (b & 0x0000FF00)) & 0x0000FF00)
            | (((a & 0x000000FF) + (b & 0x000000FF)) & 0x000000FF))


def _inv_predictor(px: list[int], w: int, h: int, bits: int,
                   tiles: list[int]) -> None:
    tw = -(-w // (1 << bits))
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[pos - 1]
            elif x == 0:
                pred = px[pos - w]
            else:
                mode = (tiles[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                # TR of the rightmost column wraps to the first pixel
                # of the current row (contiguous addressing, no special
                # case — matches reference decoders)
                pred = _predict(mode, px[pos - 1], px[pos - w],
                                px[pos - w - 1], px[pos - w + 1])
            px[pos] = _add_pixels(px[pos], pred)


def _int8(v: int) -> int:
    v &= 0xFF
    return v - 256 if v >= 128 else v


def _ct_delta(m: int, c: int) -> int:
    return (_int8(m) * _int8(c)) >> 5


def _inv_color_transform(px: list[int], w: int, h: int, bits: int,
                         tiles: list[int]) -> None:
    tw = -(-w // (1 << bits))
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            cte = tiles[(y >> bits) * tw + (x >> bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            v = px[pos]
            a = v >> 24
            r = (v >> 16) & 0xFF
            g = (v >> 8) & 0xFF
            b = v & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g)) & 0xFF
            b = (b + _ct_delta(r2b, r)) & 0xFF
            px[pos] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(px: list[int]) -> None:
    for i, v in enumerate(px):
        g = (v >> 8) & 0xFF
        r = (((v >> 16) & 0xFF) + g) & 0xFF
        b = ((v & 0xFF) + g) & 0xFF
        px[i] = (v & 0xFF00FF00) | (r << 16) | b


def _palette_width_bits(size: int) -> int:
    return 3 if size <= 2 else 2 if size <= 4 else 1 if size <= 16 else 0


def _inv_color_indexing(px: list[int], packed_w: int, w: int, h: int,
                        width_bits: int, palette: list[int]):
    """Unbundle + palette-lookup; returns the expanded pixel list or
    None on an out-of-range index."""
    psize = len(palette)
    if width_bits == 0:
        out = [0] * (w * h)
        for i, v in enumerate(px):
            ix = (v >> 8) & 0xFF
            if ix >= psize:
                return None
            out[i] = palette[ix]
        return out
    per = 1 << width_bits
    bpp = 8 >> width_bits
    mask = (1 << bpp) - 1
    out = [0] * (w * h)
    for y in range(h):
        row = y * packed_w
        for x in range(w):
            packed = px[row + (x >> width_bits)]
            ix = ((packed >> 8) >> ((x % per) * bpp)) & mask
            if ix >= psize:
                return None
            out[y * w + x] = palette[ix]
    return out


def _decode_stream(br: _Bits, w: int, h: int, max_pixels: int):
    """Decode a (headerless) VP8L image stream at the reader's current
    position: optional transforms, entropy-coded data, inverse
    transforms. Returns the ARGB pixel list or None. Shared by
    :func:`vp8l_pixels` (after the signature/dims header) and
    :func:`alpha_plane` (ALPH chunks carry exactly this stream with
    dimensions implied by the carrying frame)."""
    transforms = []  # (type, data...), in read order
    seen = set()
    cur_w = w
    while br.read_bit():
        t = br.read(2)
        if t in seen:
            return None
        seen.add(t)
        if t in (0, 1):  # predictor / color: tile image
            bits = br.read(3) + 2
            tw = -(-cur_w // (1 << bits))
            th = -(-h // (1 << bits))
            tiles = _decode_data(br, tw, th, False, max_pixels)
            if tiles is None:
                return None
            transforms.append((t, bits, tiles, cur_w))
        elif t == 2:
            transforms.append((2,))
        else:  # color indexing
            psize = br.read(8) + 1
            pal = _decode_data(br, psize, 1, False, max_pixels)
            if pal is None:
                return None
            for i in range(1, psize):  # delta-coded entries
                pal[i] = _add_pixels(pal[i], pal[i - 1])
            width_bits = _palette_width_bits(psize)
            full_w = cur_w
            cur_w = -(-cur_w // (1 << width_bits))
            transforms.append((3, width_bits, pal, full_w, cur_w))
    px = _decode_data(br, cur_w, h, True, max_pixels)
    if px is None:
        return None
    for tr in reversed(transforms):
        if tr[0] == 0:
            _inv_predictor(px, cur_w, h, tr[1], tr[2])
        elif tr[0] == 1:
            _inv_color_transform(px, cur_w, h, tr[1], tr[2])
        elif tr[0] == 2:
            _inv_subtract_green(px)
        else:
            _t, width_bits, pal, full_w, packed_w = tr
            px = _inv_color_indexing(px, packed_w, full_w, h,
                                     width_bits, pal)
            if px is None:
                return None
            cur_w = full_w
    return px


def alpha_plane(data: bytes, w: int, h: int,
                max_pixels: int = 4_000_000):
    """Decode a lossless-compressed ALPH payload (the bytes AFTER the
    1-byte ALPH header) to a flat list of ``w*h`` alpha values — the
    WebP container spec's headerless VP8L image stream whose GREEN
    channel carries the alpha plane — or None."""
    if w * h > max_pixels:
        return None
    try:
        br = _Bits(data)
        px = _decode_stream(br, w, h, max_pixels)
        if px is None:
            return None
        return [(p >> 8) & 0xFF for p in px]
    except (IndexError, ValueError):
        return None


def vp8l_pixels(body: bytes, max_pixels: int = 4_000_000):
    """Decode a VP8L chunk payload (starting at the 0x2F signature) to
    ``(width, height, channels, rows)`` with rows of (r, g, b) /
    (r, g, b, a) tuples — the ``_png_pixels`` contract — or None."""
    if len(body) < 5 or body[0] != 0x2F:
        return None
    try:
        br = _Bits(body[1:])
        w = br.read(14) + 1
        h = br.read(14) + 1
        has_alpha = br.read_bit()
        if br.read(3) != 0:
            return None  # version must be 0
        if w * h > max_pixels:
            return None
        px = _decode_stream(br, w, h, max_pixels)
        if px is None:
            return None
        nch = 4 if has_alpha else 3
        rows = []
        for y in range(h):
            row = []
            for x in range(w):
                v = px[y * w + x]
                r = (v >> 16) & 0xFF
                g = (v >> 8) & 0xFF
                bl = v & 0xFF
                row.append((r, g, bl, v >> 24) if nch == 4
                           else (r, g, bl))
            rows.append(row)
        return w, h, nch, rows
    except (IndexError, ValueError):
        return None


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _write_full_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit one prefix code in the NORMAL form: all 19 code-length-code
    slots written, symbol lengths spelled out one by one (no repeat
    ops) under an equal-weight code over the distinct lengths used."""
    bw.put(0, 1)  # not simple
    used = sorted(set(lengths))
    cl_lengths = [0] * 19
    eq = _equal_weight_lengths(len(used))
    if len(used) == 1:
        cl_lengths[used[0]] = 1  # degenerate: give it SOME length
        # a single-symbol CL code would decode zero bits; spell it as
        # a 1-bit code — incomplete, so pad with a sibling: use length
        # value 15 (never a real length here) as filler
        filler = 15 if used[0] != 15 else 14
        cl_lengths[filler] = 1
    else:
        for s, ln in zip(used, eq):
            cl_lengths[s] = ln
    bw.put(15, 4)  # num_code_lengths = 4 + 15 = 19: all slots
    for s in _CL_ORDER:
        bw.put(cl_lengths[s], 3)
    bw.put(0, 1)  # no max_symbol shortcut
    cl_codes = _canonical_codes(cl_lengths)
    for ln in lengths:
        c_len, c_code = cl_codes[ln]
        bw.put_code(c_code, c_len)


class _Encoder:
    """Symbol writer over one prefix-code group. The simple form can
    only carry 8-bit symbols, so length-prefix (256+) and cache (280+)
    symbols force the normal form even for tiny alphabets."""

    def __init__(self, bw: _BitWriter, hist: list[dict],
                 cache_size: int = 0):
        self.bw = bw
        self.codes = []
        alphabets = [256 + 24 + cache_size, 256, 256, 256, 40]
        for ch, alpha in enumerate(alphabets):
            syms = sorted(hist[ch]) or [0]
            if len(syms) == 1 and syms[0] <= 255:
                bw.put(1, 1)   # simple
                bw.put(0, 1)   # one symbol
                bw.put(1, 1)   # 8-bit form
                bw.put(syms[0], 8)
                self.codes.append({syms[0]: (0, 0)})
            elif len(syms) == 2 and syms[1] <= 255:
                bw.put(1, 1)
                bw.put(1, 1)   # two symbols
                bw.put(1, 1)
                bw.put(syms[0], 8)
                bw.put(syms[1], 8)
                self.codes.append({syms[0]: (1, 0), syms[1]: (1, 1)})
            elif len(syms) == 1:
                # single >255 symbol: normal form; the decoder's
                # single-symbol table consumes zero bits per symbol
                lengths = [0] * alpha
                lengths[syms[0]] = 1
                _write_full_code(bw, lengths)
                self.codes.append({syms[0]: (0, 0)})
            else:
                eq = _equal_weight_lengths(len(syms))
                lengths = [0] * alpha
                for s, ln in zip(syms, eq):
                    lengths[s] = ln
                _write_full_code(bw, lengths)
                self.codes.append(_canonical_codes(lengths))

    def emit(self, channel: int, sym: int) -> None:
        ln, code = self.codes[channel][sym]
        if ln:
            self.bw.put_code(code, ln)


def _collect_stream(pixels: list[int], w: int, cache_bits: int,
                    row_copy: str | None):
    """Turn an ARGB pixel list into a (op, ...) stream: ('lit', px),
    ('copy', length, dist_code), ('cache', index). ``row_copy``:
    None, 'direct' (distance w as direct code), or 'plane' (plane
    code (0,1))."""
    ops = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    n = len(pixels)
    h = n // w
    pos = 0
    for y in range(h):
        if (row_copy and y > 0
                and pixels[(y - 1) * w:y * w] == pixels[y * w:(y + 1) * w]):
            dcode = 1 if row_copy == "plane" else 120 + w
            ops.append(("copy", w, dcode))
            if cache is not None:
                for px in pixels[y * w:(y + 1) * w]:
                    cache[_hash_pixel(px, cache_bits)] = px
            pos += w
            continue
        for x in range(w):
            px = pixels[pos]
            if cache is not None:
                hx = _hash_pixel(px, cache_bits)
                if cache[hx] == px:
                    ops.append(("cache", hx))
                    pos += 1
                    continue
                cache[hx] = px
            ops.append(("lit", px))
            pos += 1
    return ops


def encode_vp8l(
    width: int,
    height: int,
    rows: list[list[tuple]],
    *,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_cte: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    row_copy: str | None = None,
    alpha: bool = False,
) -> bytes:
    """VP8L chunk payload for an RGB(A) raster (fixture generator, the
    ``encode_png``/``encode_jpeg`` pattern). Options exercise decoder
    paths: forward ``subtract_green`` / uniform-mode predictor /
    uniform color transform (cte = (g2r, g2b, r2b)) / color-indexing
    ``palette`` (bundles when <= 16 colors), a color ``cache_bits``
    cache, and LZ row copies via 'direct' or 'plane' distance codes.
    Transforms compose in the written order; the decoder must invert
    them in reverse."""
    px = []
    for row in rows:
        for p in row:
            r, g, b = p[0], p[1], p[2]
            a = p[3] if len(p) > 3 else 255
            px.append((a << 24) | (r << 16) | (g << 8) | b)

    bw = _BitWriter()
    bw.put(width - 1, 14)
    bw.put(height - 1, 14)
    bw.put(1 if alpha else 0, 1)
    bw.put(0, 3)  # version

    cur_w = width

    def emit_entropy_image(values: list[int], w_: int, h_: int) -> None:
        """entropy-coded image: no cache, one group, all literals."""
        bw.put(0, 1)  # no color cache
        hist = [dict() for _ in range(5)]
        for v in values:
            hist[0][(v >> 8) & 0xFF] = 1
            hist[1][(v >> 16) & 0xFF] = 1
            hist[2][v & 0xFF] = 1
            hist[3][v >> 24] = 1
        enc = _Encoder(bw, hist)
        for v in values:
            enc.emit(0, (v >> 8) & 0xFF)
            enc.emit(1, (v >> 16) & 0xFF)
            enc.emit(2, v & 0xFF)
            enc.emit(3, v >> 24)

    # --- transforms, forward-applied in written order ---
    if predictor_mode is not None:
        bw.put(1, 1)
        bw.put(0, 2)  # predictor
        bits = 3  # 8x8 tiles
        bw.put(bits - 2, 3)
        tw = -(-cur_w // (1 << bits))
        th = -(-height // (1 << bits))
        tiles = [(0xFF << 24) | (predictor_mode << 8)] * (tw * th)
        emit_entropy_image(tiles, tw, th)
        res = [0] * len(px)
        for y in range(height):
            for x in range(cur_w):
                pos = y * cur_w + x
                if pos == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[pos - 1]
                elif x == 0:
                    pred = px[pos - cur_w]
                else:
                    pred = _predict(predictor_mode, px[pos - 1],
                                    px[pos - cur_w], px[pos - cur_w - 1],
                                    px[pos - cur_w + 1])
                res[pos] = _sub_pixels(px[pos], pred)
        px = res
    if color_cte is not None:
        bw.put(1, 1)
        bw.put(1, 2)  # color transform
        bits = 3
        bw.put(bits - 2, 3)
        g2r, g2b, r2b = color_cte
        tw = -(-cur_w // (1 << bits))
        th = -(-height // (1 << bits))
        cte = (0xFF << 24) | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) \
            | (g2r & 0xFF)
        emit_entropy_image([cte] * (tw * th), tw, th)
        out = []
        for v in px:
            a = v >> 24
            r = (v >> 16) & 0xFF
            g = (v >> 8) & 0xFF
            b = v & 0xFF
            nr = (r - _ct_delta(g2r, g)) & 0xFF
            nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            out.append((a << 24) | (nr << 16) | (g << 8) | nb)
        px = out
    if subtract_green:
        bw.put(1, 1)
        bw.put(2, 2)
        out = []
        for v in px:
            g = (v >> 8) & 0xFF
            r = (((v >> 16) & 0xFF) - g) & 0xFF
            b = ((v & 0xFF) - g) & 0xFF
            out.append((v & 0xFF00FF00) | (r << 16) | b)
        px = out
    if palette:
        pal = sorted(set(px))
        if len(pal) > 256:
            raise ValueError("palette requires <= 256 distinct colors")
        bw.put(1, 1)
        bw.put(3, 2)
        bw.put(len(pal) - 1, 8)
        deltas = [pal[0]] + [_sub_pixels(pal[i], pal[i - 1])
                             for i in range(1, len(pal))]
        emit_entropy_image(deltas, len(pal), 1)
        ix_of = {c: i for i, c in enumerate(pal)}
        width_bits = _palette_width_bits(len(pal))
        per = 1 << width_bits
        bpp = 8 >> width_bits
        packed_w = -(-cur_w // per)
        out = []
        for y in range(height):
            for xp in range(packed_w):
                g = 0
                for k in range(per):
                    x = xp * per + k
                    if x < cur_w:
                        g |= ix_of[px[y * cur_w + x]] << (k * bpp)
                out.append((0xFF << 24) | (g << 8))
        px = out
        cur_w = packed_w
    bw.put(0, 1)  # end of transforms

    # --- spatially-coded main image ---
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    bw.put(0, 1)  # no meta-prefix image
    ops = _collect_stream(px, cur_w, cache_bits, row_copy)
    hist = [dict() for _ in range(5)]
    for op in ops:
        if op[0] == "lit":
            v = op[1]
            hist[0][(v >> 8) & 0xFF] = 1
            hist[1][(v >> 16) & 0xFF] = 1
            hist[2][v & 0xFF] = 1
            hist[3][v >> 24] = 1
        elif op[0] == "copy":
            lcode, _, _ = _lz_prefix_encode(op[1])
            dcode, _, _ = _lz_prefix_encode(op[2])
            hist[0][256 + lcode] = 1
            hist[4][dcode] = 1
        else:
            hist[0][280 + op[1]] = 1
    enc = _Encoder(bw, hist, (1 << cache_bits) if cache_bits else 0)
    for op in ops:
        if op[0] == "lit":
            v = op[1]
            enc.emit(0, (v >> 8) & 0xFF)
            enc.emit(1, (v >> 16) & 0xFF)
            enc.emit(2, v & 0xFF)
            enc.emit(3, v >> 24)
        elif op[0] == "copy":
            lcode, lextra, lbits = _lz_prefix_encode(op[1])
            enc.emit(0, 256 + lcode)
            if lbits:
                bw.put(lextra, lbits)
            dcode, dextra, dbits = _lz_prefix_encode(op[2])
            enc.emit(4, dcode)
            if dbits:
                bw.put(dextra, dbits)
        else:
            enc.emit(0, 280 + op[1])
    return b"\x2f" + bw.bytes()


def _sub_pixels(a: int, b: int) -> int:
    return ((((a & 0xFF000000) - (b & 0xFF000000)) & 0xFF000000)
            | (((a & 0x00FF0000) - (b & 0x00FF0000)) & 0x00FF0000)
            | (((a & 0x0000FF00) - (b & 0x0000FF00)) & 0x0000FF00)
            | (((a & 0x000000FF) - (b & 0x000000FF)) & 0x000000FF))


def encode_webp_vp8l(width: int, height: int, rows: list[list[tuple]],
                     **kw) -> bytes:
    """Full .webp container around :func:`encode_vp8l` (correct RIFF
    size = total length - 8)."""
    chunk = encode_vp8l(width, height, rows, **kw)
    pad = b"\x00" if len(chunk) & 1 else b""
    payload = (b"WEBP" + b"VP8L" + len(chunk).to_bytes(4, "little")
               + chunk + pad)
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload

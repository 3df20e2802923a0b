"""Round 13: JPEG/PNG tiers differentially verified against the system
libjpeg(-turbo) and libpng (the VP8-tier treatment extended to the r9
JPEG and PNG decoders, which until now had fixture-only parity).

A tiny C shim (tools/codec_shim/codec_shim.c) exposes the reference
decoders/encoders through a flat ABI; it is compiled on demand here
and the whole module skips when gcc or the dev headers are absent.

What "agree" means per format:
- PNG is lossless and bit-specified -> libpng-encoded streams (its own
  filter heuristics) must decode BIT-EXACTLY in the pure-Python tier,
  and our encoded fixtures must decode bit-exactly in libpng.
- JPEG decoding is NOT bit-specified (T.81 allows IDCT tolerance), so
  cross-implementation agreement is bounded: max |diff| <= 3 per
  sample and mean |diff| < 0.15 against libjpeg's JDCT_ISLOW with
  non-fancy upsampling (the documented nearest-neighbor convention of
  this tier). Structural bugs (wrong Huffman, scan script, restart,
  upsample geometry, color order) produce diffs of tens and fail
  loudly. Both directions run: our encoder's streams through libjpeg,
  and libjpeg-encoded streams (real quant tables, optimized Huffman,
  jpeg_simple_progression scan scripts) through our decoder.
"""

from __future__ import annotations

import ctypes
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from aggo_spark.operators import multimodal as M

_SRC = Path(__file__).resolve().parent.parent / "tools" / "codec_shim" \
    / "codec_shim.c"


def _build_shim(tmpdir: Path):
    if shutil.which("gcc") is None:
        return None
    for hdr in ("/usr/include/jpeglib.h", "/usr/include/png.h"):
        if not Path(hdr).exists():
            return None
    so = tmpdir / "codec_shim.so"
    try:
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", "-o", str(so), str(_SRC),
             "-ljpeg", "-lpng"],
            check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    sh = ctypes.CDLL(str(so))
    u8pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))
    ip = ctypes.POINTER(ctypes.c_int)
    sh.shim_jpeg_decode.restype = ctypes.c_int
    sh.shim_jpeg_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int, ip, ip, ip, u8pp]
    sh.shim_jpeg_encode.restype = ctypes.c_int
    sh.shim_jpeg_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u8pp, ctypes.POINTER(ctypes.c_ulong)]
    sh.shim_png_decode.restype = ctypes.c_int
    sh.shim_png_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ip, ip, u8pp]
    sh.shim_png_encode.restype = ctypes.c_int
    sh.shim_png_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, u8pp,
        ctypes.POINTER(ctypes.c_size_t)]
    sh.shim_free.argtypes = [ctypes.c_void_p]
    return sh


@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    sh = _build_shim(tmp_path_factory.mktemp("codec_shim"))
    if sh is None:
        pytest.skip("gcc or libjpeg/libpng dev headers unavailable")
    return sh


def _lib_jpeg_decode(sh, jpg: bytes, fancy: int = 0):
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    p = ctypes.POINTER(ctypes.c_uint8)()
    if sh.shim_jpeg_decode(jpg, len(jpg), fancy, ctypes.byref(w),
                           ctypes.byref(h), ctypes.byref(c),
                           ctypes.byref(p)):
        return None
    n = w.value * h.value * c.value
    arr = np.ctypeslib.as_array(p, shape=(n,)).copy().reshape(
        h.value, w.value, c.value)
    sh.shim_free(p)
    return arr


def _lib_jpeg_encode(sh, img: np.ndarray, q: int, prog: int, sub420: int):
    h, w = img.shape[:2]
    p = ctypes.POINTER(ctypes.c_uint8)()
    ln = ctypes.c_ulong()
    rc = sh.shim_jpeg_encode(img.tobytes(), w, h, q, prog, sub420,
                             ctypes.byref(p), ctypes.byref(ln))
    assert rc == 0
    out = ctypes.string_at(p, ln.value)
    sh.shim_free(p)
    return out


def _lib_png_decode(sh, png: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = ctypes.POINTER(ctypes.c_uint8)()
    if sh.shim_png_decode(png, len(png), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(p)):
        return None
    n = w.value * h.value * 4
    arr = np.ctypeslib.as_array(p, shape=(n,)).copy().reshape(
        h.value, w.value, 4)
    sh.shim_free(p)
    return arr


def _lib_png_encode(sh, rgba: np.ndarray):
    h, w = rgba.shape[:2]
    p = ctypes.POINTER(ctypes.c_uint8)()
    ln = ctypes.c_size_t()
    rc = sh.shim_png_encode(rgba.tobytes(), w, h, ctypes.byref(p),
                            ctypes.byref(ln))
    assert rc == 0
    out = ctypes.string_at(p, ln.value)
    sh.shim_free(p)
    return out


def _my_jpeg_pixels(jpg: bytes):
    d = M.jpeg_pixel_decode(jpg, with_pixels=True)
    return None if d is None else d["pixels"]


MAX_TOL = 3
MEAN_TOL = 0.15


class TestJpegDifferential:
    @pytest.mark.parametrize("subsamp", ["444", "420"])
    @pytest.mark.parametrize("progressive", [False, True])
    @pytest.mark.parametrize("wh", [(32, 24), (17, 13), (64, 48)])
    def test_our_streams_through_libjpeg(self, shim, subsamp, progressive,
                                         wh):
        w, h = wh
        rng = np.random.RandomState(w * h)
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for ri in (0, 3):
            jpg = M.encode_jpeg(image=img, subsampling=subsamp,
                                progressive=progressive,
                                restart_interval=ri)
            ref = _lib_jpeg_decode(shim, jpg)
            assert ref is not None, "libjpeg rejected our stream"
            mine = _my_jpeg_pixels(jpg)
            diff = np.abs(ref.astype(int) - mine.astype(int))
            assert diff.max() <= MAX_TOL, (subsamp, progressive, ri)
            assert diff.mean() < MEAN_TOL

    @pytest.mark.parametrize("q", [50, 80, 95])
    @pytest.mark.parametrize("progressive", [0, 1])
    @pytest.mark.parametrize("sub420", [0, 1])
    def test_libjpeg_streams_through_ours(self, shim, q, progressive,
                                          sub420):
        h, w = 40, 56
        rng = np.random.RandomState(q + progressive * 7 + sub420 * 13)
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        img = np.stack([np.broadcast_to((x * 3 + y * 2) % 256, (h, w)),
                        np.broadcast_to((x + y * 5) % 256, (h, w)),
                        np.broadcast_to((x * 7 + y) % 256, (h, w))],
                       -1).astype(int)
        img = np.clip(img + rng.randint(-20, 20, img.shape),
                      0, 255).astype(np.uint8)
        jpg = _lib_jpeg_encode(shim, img, q, progressive, sub420)
        mine = _my_jpeg_pixels(jpg)
        assert mine is not None, "our decoder rejected a libjpeg stream"
        ref = _lib_jpeg_decode(shim, jpg, fancy=0)
        diff = np.abs(ref.astype(int) - mine.astype(int))
        assert diff.max() <= MAX_TOL, (q, progressive, sub420)
        assert diff.mean() < MEAN_TOL

    def test_grayscale(self, shim):
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (20, 28)).astype(np.uint8)
        jpg = M.encode_jpeg(image=img)
        ref = _lib_jpeg_decode(shim, jpg)
        mine = _my_jpeg_pixels(jpg)
        diff = np.abs(ref.astype(int).squeeze() - mine.astype(int).squeeze())
        assert diff.max() <= MAX_TOL

    def test_both_reject_corrupt(self, shim):
        junk = b"\xff\xd8\xff\xdb" + bytes(range(64))
        assert _lib_jpeg_decode(shim, junk) is None
        assert M.jpeg_pixel_decode(junk) is None


class TestPngDifferential:
    @pytest.mark.parametrize("wh", [(20, 30), (1, 1), (64, 48), (33, 7)])
    def test_libpng_streams_decode_bit_exact(self, shim, wh):
        w, h = wh
        rng = np.random.RandomState(w + h * 101)
        rgba = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
        png = _lib_png_encode(shim, rgba)
        px = M._png_pixels(png)
        assert px is not None
        pw, ph, nch, rows = px
        assert (pw, ph, nch) == (w, h, 4)
        arr = np.array([[list(p) for p in row] for row in rows],
                       dtype=np.uint8)
        assert (arr == rgba).all()

    def test_smooth_image_exercises_filters(self, shim):
        # gradients push libpng toward Sub/Up/Paeth row filters
        w, h = 48, 40
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        rgba = np.stack(
            [np.broadcast_to((x * 5) % 256, (h, w)),
             np.broadcast_to((y * 5) % 256, (h, w)),
             np.broadcast_to((x + y) % 256, (h, w)),
             np.broadcast_to((x * 2 + y * 3) % 256, (h, w))],
            -1).astype(np.uint8)
        png = _lib_png_encode(shim, rgba)
        _, _, _, rows = M._png_pixels(png)
        arr = np.array([[list(p) for p in row] for row in rows],
                       dtype=np.uint8)
        assert (arr == rgba).all()

    def test_our_fixtures_through_libpng(self, shim):
        png = M.encode_png(16, 8, (10, 200, 30))
        ref = _lib_png_decode(shim, png)
        assert ref is not None and ref.shape == (8, 16, 4)
        assert (ref[..., :3] == np.array([10, 200, 30])).all()
        assert (ref[..., 3] == 255).all()

    def test_both_reject_corrupt(self, shim):
        junk = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
        assert _lib_png_decode(shim, junk) is None
        assert M.png_decode(junk) is None

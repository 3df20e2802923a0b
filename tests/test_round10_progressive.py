"""Progressive (SOF2) JPEG pixel decode — r9 verdict Next #6.

The decoder accumulates quantized coefficients across spectral-selection
and successive-approximation scans (T.81 G.1.2) and reconstructs through
the SAME dequant/IDCT/upsample/color tail as baseline, so for any image
the progressive encoding must decode to bit-identical channel means and
phash as the baseline encoding (reference behavior: aggo treats image
bytes as opaque; the decode tier is this repo's multimodal superset).

No Spark session needed — the codec is the pure kernel that runs inside
the mapInPandas batches.
"""

import numpy as np
import pytest

from aggo_spark.operators.multimodal import (
    encode_jpeg,
    encode_jpeg_header,
    jpeg_decode,
    jpeg_pixel_decode,
)


def _eq(a: dict, b: dict) -> bool:
    return (a["channel_means"] == b["channel_means"]
            and a["phash"] == b["phash"]
            and a["width"] == b["width"]
            and a["height"] == b["height"]
            and a["channels"] == b["channels"])


class TestProgressiveDecode:
    def test_solid_color_exact_means(self):
        # identity quant + solid color: DCT->quant->IDCT round-trips
        # exactly; the means are the pure YCbCr round-trip arithmetic
        # (the q40 oracle contract), identical to the baseline tier
        base = jpeg_pixel_decode(encode_jpeg(9, 7, (200, 30, 90)))
        prog = jpeg_pixel_decode(
            encode_jpeg(9, 7, (200, 30, 90), progressive=True))
        assert prog is not None
        assert _eq(base, prog)
        assert prog["channel_means"] == [200.0, 31.0, 90.0]

    @pytest.mark.parametrize("subsampling", ["444", "420"])
    def test_arbitrary_image_matches_baseline(self, subsampling):
        rng = np.random.RandomState(42)
        img = rng.randint(0, 256, (21, 37, 3)).astype(np.uint8)
        base = jpeg_pixel_decode(
            encode_jpeg(image=img, subsampling=subsampling))
        prog = jpeg_pixel_decode(
            encode_jpeg(image=img, subsampling=subsampling,
                        progressive=True))
        assert base is not None and prog is not None
        assert _eq(base, prog)

    def test_grayscale(self):
        rng = np.random.RandomState(7)
        g = rng.randint(0, 256, (13, 19)).astype(np.uint8)
        base = jpeg_pixel_decode(encode_jpeg(image=g))
        prog = jpeg_pixel_decode(encode_jpeg(image=g, progressive=True))
        assert base is not None and prog is not None
        assert _eq(base, prog)
        assert prog["channels"] == 1

    def test_nontrivial_quant(self):
        # quantization exercises multi-bit coefficient magnitudes through
        # both the first pass (value >> 1) and the refinement bit
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        q = list(range(1, 65))
        base = jpeg_pixel_decode(encode_jpeg(image=img, quant=[q, q]))
        prog = jpeg_pixel_decode(
            encode_jpeg(image=img, quant=[q, q], progressive=True))
        assert base is not None and prog is not None
        assert _eq(base, prog)

    def test_restart_intervals(self):
        # RSTn markers inside progressive scans: DC predictors and EOB
        # runs reset per T.81 (units = MCUs interleaved, blocks otherwise)
        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
        base = jpeg_pixel_decode(encode_jpeg(image=img))
        prog = jpeg_pixel_decode(
            encode_jpeg(image=img, restart_interval=3, progressive=True))
        assert base is not None and prog is not None
        assert _eq(base, prog)

    def test_420_odd_dims(self):
        # odd dims + 2x2 sampling: MCU padding blocks are coded in the
        # interleaved DC scan but NOT in the non-interleaved AC scans
        # (T.81 A.2.2) — dims that don't divide the MCU grid catch any
        # block-grid mismatch between the two scan kinds
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (17, 23, 3)).astype(np.uint8)
        base = jpeg_pixel_decode(encode_jpeg(image=img, subsampling="420"))
        prog = jpeg_pixel_decode(
            encode_jpeg(image=img, subsampling="420", progressive=True))
        assert base is not None and prog is not None
        assert _eq(base, prog)


class TestProgressiveScanScripts:
    """Real-world scan shapes: spectral-band splits and multi-level
    successive approximation (mozjpeg-style scripts). Every combination
    must reconstruct the exact baseline coefficients."""

    @pytest.fixture(scope="class")
    def img(self):
        return np.random.RandomState(21).randint(
            0, 256, (19, 29, 3)).astype(np.uint8)

    def _base(self, img, **kw):
        return jpeg_pixel_decode(encode_jpeg(image=img, **kw))

    def test_band_split(self, img):
        base = self._base(img)
        prog = self._base(img, progressive=True, ac_bands=((1, 5), (6, 63)))
        assert _eq(base, prog)

    def test_deep_approximation_chain(self, img):
        base = self._base(img)
        assert _eq(base, self._base(img, progressive=True, first_al=2))
        assert _eq(base, self._base(img, progressive=True, first_al=3,
                                    ac_bands=((1, 2), (3, 9), (10, 63))))

    def test_no_approximation(self, img):
        # first_al=0: pure spectral selection, no refinement scans
        base = self._base(img)
        assert _eq(base, self._base(img, progressive=True, first_al=0))

    def test_420_deep_with_restarts(self, img):
        base = self._base(img, subsampling="420")
        prog = self._base(img, subsampling="420", progressive=True,
                          first_al=2, ac_bands=((1, 5), (6, 63)),
                          restart_interval=4)
        assert _eq(base, prog)

    def test_band_gap_raises(self, img):
        with pytest.raises(ValueError, match="partition"):
            encode_jpeg(image=img, progressive=True,
                        ac_bands=((1, 5), (7, 63)))

    def test_cross_block_eob_runs(self):
        # mostly-flat image: AC bands are zero across long block runs,
        # so the encoder folds them into EOBn symbols (2^n + extra) and
        # the decoder's eobrun skip/tail paths do the work — the shape
        # real progressive files are full of
        img = np.full((64, 96, 3), 128, dtype=np.uint8)
        img[5:9, 10:14] = [200, 40, 90]
        base = jpeg_pixel_decode(encode_jpeg(image=img))
        prog = jpeg_pixel_decode(encode_jpeg(image=img, progressive=True))
        assert _eq(base, prog)

    def test_eob_runs_with_refinement_bits(self):
        # scattered dots on flat ground + Al=2 chain: refinement scans
        # carry correction bits BUFFERED ACROSS the EOB run (the jcphuff
        # BE machinery), consumed by the decoder's per-block tail loops
        rng = np.random.RandomState(33)
        img = np.full((48, 72, 3), 77, dtype=np.uint8)
        for _ in range(12):
            y, x = rng.randint(0, 48), rng.randint(0, 72)
            img[y, x] = rng.randint(0, 256, 3)
        base = jpeg_pixel_decode(encode_jpeg(image=img, subsampling="420"))
        prog = jpeg_pixel_decode(
            encode_jpeg(image=img, subsampling="420", progressive=True,
                        restart_interval=3, first_al=2))
        assert _eq(base, prog)  # restarts also break runs mid-scan

    def test_long_run_flat_gray(self):
        g = np.full((80, 80), 10, dtype=np.uint8)
        g[0, 0] = 255
        base = jpeg_pixel_decode(encode_jpeg(image=g))
        prog = jpeg_pixel_decode(
            encode_jpeg(image=g, progressive=True,
                        ac_bands=((1, 1), (2, 63))))
        assert _eq(base, prog)


class TestProgressiveFallback:
    def test_header_only_sof2_stays_header_tier(self):
        m = jpeg_decode(encode_jpeg_header(40, 30, progressive=True))
        assert m is not None
        assert (m["width"], m["height"]) == (40, 30)
        assert m["channel_means"] is None and m["phash"] is None

    def test_truncated_scan_falls_back_to_header(self):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
        full = encode_jpeg(image=img, progressive=True)
        m = jpeg_decode(full[:len(full) // 2])
        assert m is not None
        assert m["width"] == 24 and m["height"] == 16
        assert m["channel_means"] is None  # honest: never fabricated

    def test_pixel_budget_refuses_forged_dims(self):
        big = encode_jpeg_header(60000, 60000, progressive=True)
        m = jpeg_decode(big)
        assert m is not None and m["channel_means"] is None
        assert m["width"] == 60000

    def test_scan_count_bound(self):
        # forged file repeating one scan hundreds of times must fall
        # back to the header tier, not do O(scans x blocks) work
        full = bytearray(encode_jpeg(8, 8, (10, 20, 30), progressive=True))
        eoi = bytes(full[-2:])
        assert eoi == b"\xff\xd9"
        body = bytes(full[:-2])
        # locate the last SOS segment and replicate it 100 times
        idx = body.rindex(b"\xff\xda")
        repeated = body + body[idx:] * 100 + eoi
        m = jpeg_decode(bytes(repeated))
        assert m is not None
        assert m["channel_means"] is None

    def test_corruption_fuzz_never_crashes(self):
        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
        buf = bytearray(encode_jpeg(image=img, progressive=True))
        for _ in range(150):
            pos = rng.randint(2, len(buf))
            old = buf[pos]
            buf[pos] = rng.randint(0, 256)
            jpeg_decode(bytes(buf))  # None or a dict; never raises
            buf[pos] = old

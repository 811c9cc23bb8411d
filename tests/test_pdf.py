"""PDF page source (north-rule 'PDF/layout parse' capability).

Writer+parser subset roundtrip, xref/trailer resolution, error taxonomy
mapping, and the #page=N media_ref addressing through _ocr_one.
"""

import numpy as np
import pytest

from ppocr_spark.config import PPOCRConfig
from ppocr_spark.pipeline import _ocr_one
from ppocr_spark.png import encode_gray
from ppocr_spark.render import render_page
from ppocr_spark.sources.pdf import (
    PdfError,
    decode_pdf_page,
    encode_pdf,
    is_pdf,
    pdf_page_count,
    split_page_ref,
)
from ppocr_spark.status import StatusCode


class TestContainer:
    def test_roundtrip_exact(self):
        rng = np.random.default_rng(7)
        pages = [
            rng.integers(0, 256, (37, 53), dtype=np.uint8),
            rng.integers(0, 256, (120, 80), dtype=np.uint8),
            np.full((16, 16), 200, dtype=np.uint8),
        ]
        blob = encode_pdf(pages)
        assert is_pdf(blob)
        assert pdf_page_count(blob) == 3
        for i, p in enumerate(pages):
            assert np.array_equal(decode_pdf_page(blob, i + 1), p)

    def test_deterministic_bytes(self):
        pages = [np.arange(64, dtype=np.uint8).reshape(8, 8)]
        assert encode_pdf(pages) == encode_pdf(pages)

    def test_page_out_of_range(self):
        blob = encode_pdf([np.zeros((8, 8), dtype=np.uint8)])
        with pytest.raises(PdfError):
            decode_pdf_page(blob, 2)
        with pytest.raises(PdfError):
            decode_pdf_page(blob, 0)

    def test_corrupt_rejected(self):
        with pytest.raises(PdfError):
            decode_pdf_page(b"%PDF-1.4 garbage", 1)
        with pytest.raises(PdfError):
            decode_pdf_page(b"\x89PNG not a pdf", 1)
        blob = encode_pdf([np.zeros((8, 8), dtype=np.uint8)])
        with pytest.raises(PdfError):
            decode_pdf_page(blob[: len(blob) // 2], 1)

    def test_empty_pages_rejected(self):
        with pytest.raises(PdfError):
            encode_pdf([])
        with pytest.raises(PdfError):
            encode_pdf([np.zeros((0, 8), dtype=np.uint8)])


class TestPageRef:
    def test_split(self):
        assert split_page_ref("doc.pdf#page=3") == ("doc.pdf", 3)
        assert split_page_ref("img_0001") == ("img_0001", None)
        assert split_page_ref("a#page=x") == ("a#page=x", None)
        assert split_page_ref("") == ("", None)


class TestOcrDispatch:
    def test_pdf_page_ocr(self):
        cfg = PPOCRConfig()
        img1, _ = render_page(["alpha beta gamma"])
        img2, _ = render_page(["delta epsilon"])
        blob = encode_pdf([img1, img2])
        r1 = _ocr_one(blob, cfg, page=1)
        r2 = _ocr_one(blob, cfg, page=2)
        assert r1["code"] == int(StatusCode.OK)
        assert r2["code"] == int(StatusCode.OK)
        assert r1["text"] != r2["text"]
        # default page = 1
        assert _ocr_one(blob, cfg)["text"] == r1["text"]

    def test_bad_page_maps_to_read_fail(self):
        cfg = PPOCRConfig()
        img, _ = render_page(["alpha beta"])
        blob = encode_pdf([img])
        assert _ocr_one(blob, cfg, page=5)["code"] == int(
            StatusCode.PATH_READ_FAIL
        )

    def test_page_ref_into_png_fails(self):
        cfg = PPOCRConfig()
        img, _ = render_page(["alpha beta"])
        png = encode_gray(img)
        assert _ocr_one(png, cfg, page=2)["code"] == int(
            StatusCode.PATH_READ_FAIL
        )
        assert _ocr_one(png, cfg, page=1)["code"] == int(StatusCode.OK)

    def test_corrupt_pdf_maps_to_read_fail(self):
        cfg = PPOCRConfig()
        assert _ocr_one(b"%PDF-1.4 junk", cfg, page=1)["code"] == int(
            StatusCode.PATH_READ_FAIL
        )


class TestPropertyRoundtrip:
    def test_hypothesis_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from hypothesis.extra.numpy import arrays

        @settings(max_examples=25, deadline=None)
        @given(
            st.lists(
                arrays(
                    np.uint8,
                    st.tuples(
                        st.integers(1, 40), st.integers(1, 40)
                    ),
                ),
                min_size=1,
                max_size=4,
            )
        )
        def roundtrip(pages):
            blob = encode_pdf(pages)
            assert pdf_page_count(blob) == len(pages)
            for i, p in enumerate(pages):
                assert np.array_equal(decode_pdf_page(blob, i + 1), p)

        roundtrip()


class TestEndobjInStream:
    def test_object_at_skips_stream_payload(self):
        """A FlateDecode payload may contain the literal 'endobj'; the
        object scanner must skip /Length bytes before searching for the
        terminator instead of truncating the object."""
        from ppocr_spark.sources.pdf import _object_at

        payload = b"\x00\x01endobj\x02\x03trailing"
        body = (
            b"5 0 obj\n<< /Length %d >>\nstream\n" % len(payload)
            + payload
            + b"\nendstream\nendobj\n"
        )
        data = b"%PDF-1.4\n" + body + b"6 0 obj\n<< >>\nendobj\n"
        off = data.find(b"5 0 obj")
        got = _object_at(data, off, 5)
        assert payload in got  # full payload survives
        assert got.rstrip().endswith(b"endstream")

    def test_object_without_stream_unaffected(self):
        from ppocr_spark.sources.pdf import _object_at

        # object 7 has no stream; object 8 after it does — the scanner
        # must not skip into object 8's stream
        data = (
            b"%PDF-1.4\n7 0 obj\n<< /Type /Page >>\nendobj\n"
            b"8 0 obj\n<< /Length 4 >>\nstream\nabcd\nendstream\nendobj\n"
        )
        off = data.find(b"7 0 obj")
        got = _object_at(data, off, 7)
        assert b"/Type /Page" in got and b"stream" not in got

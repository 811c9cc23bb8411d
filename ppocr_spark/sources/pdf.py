"""Minimal deterministic PDF container: writer + page parser.

North-rule text-tier capability (*PDF/layout parse*): media spans may
reference a single page of a multi-page PDF (``media_ref = "doc.pdf#page=N"``,
1-based), mirroring the reference's one-image-per-request unit
(cpp/src/task.cpp:141-212) with the page as the request unit.

Scope is an honest, from-scratch subset of PDF 1.4 — exactly what the
writer emits and any conforming producer of the same shape:

- one 8-bit /DeviceGray /FlateDecode image XObject per page, drawn 1:1
- object graph: Catalog → Pages → [Page → (Contents, XObject)]
- cross-reference table + trailer written and *used*: the parser resolves
  the trailer's /Root through the xref (it does not assume object order),
  walks /Kids, and decompresses each page's image

Like the reference's byte-sniffing ``imread_u8``
(cpp/src/task_linux.cpp:106-107), callers dispatch on the ``%PDF-`` magic
(``is_pdf``); decode failures map onto the same status-code taxonomy as
image decode failures.
"""

from __future__ import annotations

import re
import zlib

import numpy as np


class PdfError(ValueError):
    pass


MAGIC = b"%PDF-"


def is_pdf(data: bytes) -> bool:
    return bytes(data[:5]) == MAGIC


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def encode_pdf(pages: list[np.ndarray]) -> bytes:
    """Grayscale uint8 page images → a valid single-file PDF."""
    if not pages:
        raise PdfError("no pages")
    out = bytearray()
    offsets: dict[int, int] = {}

    def obj(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode())
        out.extend(body)
        out.extend(b"\nendobj\n")

    out.extend(b"%PDF-1.4\n%\xd0\xd1\xd2\xd3\n")
    n = len(pages)
    # object numbering: 1 Catalog, 2 Pages, then per page i (0-based):
    # 3+3i Page, 4+3i Contents, 5+3i Image
    kids = " ".join(f"{3 + 3 * i} 0 R" for i in range(n))
    obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, f"<< /Type /Pages /Count {n} /Kids [{kids}] >>".encode())
    for i, img in enumerate(pages):
        img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
        if img.ndim != 2 or img.size == 0:
            raise PdfError("pages must be non-empty 2-D grayscale")
        h, w = img.shape
        pg, ct, im = 3 + 3 * i, 4 + 3 * i, 5 + 3 * i
        obj(
            pg,
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
                f"/Contents {ct} 0 R /Resources << /XObject "
                f"<< /Im0 {im} 0 R >> >> >>"
            ).encode(),
        )
        content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
        obj(
            ct,
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content
            + b"\nendstream",
        )
        data = zlib.compress(img.tobytes(), 6)
        head = (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            f"/Filter /FlateDecode /Length {len(data)} >>\nstream\n"
        ).encode()
        obj(im, head + data + b"\nendstream")

    nobj = 2 + 3 * n
    xref_at = len(out)
    out.extend(f"xref\n0 {nobj + 1}\n".encode())
    out.extend(b"0000000000 65535 f \n")
    for k in range(1, nobj + 1):
        out.extend(f"{offsets[k]:010d} 00000 n \n".encode())
    out.extend(
        f"trailer\n<< /Size {nobj + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# parser (subset reader with real xref/reference resolution)
# ---------------------------------------------------------------------------

_NUM_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_KEY_INT_RE = {
    k: re.compile(rb"/" + k + rb"\s+(\d+)")
    for k in (b"Width", b"Height", b"Length", b"BitsPerComponent")
}


def _xref_offsets(data: bytes) -> dict[int, int]:
    sx = data.rfind(b"startxref")
    if sx < 0:
        raise PdfError("no startxref")
    m = re.search(rb"startxref\s+(\d+)", data[sx:])
    if not m:
        raise PdfError("bad startxref")
    at = int(m.group(1))
    if not data[at : at + 4] == b"xref":
        raise PdfError("xref table not at startxref")
    m = re.match(rb"xref\s+(\d+)\s+(\d+)\s*", data[at:])
    if not m:
        raise PdfError("bad xref header")
    first, count = int(m.group(1)), int(m.group(2))
    pos = at + m.end()
    offsets: dict[int, int] = {}
    for k in range(count):
        row = data[pos + 20 * k : pos + 20 * k + 20]
        if len(row) < 18:
            raise PdfError("truncated xref")
        if row[17:18] == b"n":
            offsets[first + k] = int(row[:10])
    return offsets


def _object_at(data: bytes, off: int, num: int) -> bytes:
    m = re.match(rb"(\d+)\s+0\s+obj\b", data[off:])
    if not m or int(m.group(1)) != num:
        raise PdfError(f"object {num} not at xref offset")
    # a FlateDecode stream payload is arbitrary bytes and may contain the
    # literal 'endobj' — skip past the declared /Length before searching
    # for the real terminator, or a valid image object gets truncated
    search_from = off + m.end()
    naive_end = data.find(b"endobj", search_from)
    sm = re.search(rb"stream\r?\n", data[search_from:])
    # the stream keyword must belong to THIS object (precede the first
    # endobj candidate) — otherwise it's a later object's stream and the
    # first endobj is genuine
    if sm and naive_end >= 0 and search_from + sm.start() < naive_end:
        ln = _KEY_INT_RE[b"Length"].search(
            data[search_from : search_from + sm.start()]
        )
        if ln:
            search_from = search_from + sm.end() + int(ln.group(1))
    end = data.find(b"endobj", search_from)
    if end < 0:
        raise PdfError("unterminated object")
    return data[off + m.end() : end]


def _trailer_root(data: bytes) -> int:
    t = data.rfind(b"trailer")
    if t < 0:
        raise PdfError("no trailer")
    m = re.search(rb"/Root\s+(\d+)\s+0\s+R", data[t:])
    if not m:
        raise PdfError("no /Root")
    return int(m.group(1))


def _stream_payload(body: bytes) -> bytes:
    m = re.search(rb"stream\r?\n", body)
    if not m:
        raise PdfError("object has no stream")
    start = m.end()
    ln = _KEY_INT_RE[b"Length"].search(body[: m.start()])
    if not ln:
        raise PdfError("stream without /Length")
    return body[start : start + int(ln.group(1))]


def pdf_page_count(data: bytes) -> int:
    data = bytes(data)
    if not is_pdf(data):
        raise PdfError("bad magic")
    offsets = _xref_offsets(data)
    root = _object_at(data, offsets[_trailer_root(data)], _trailer_root(data))
    m = re.search(rb"/Pages\s+(\d+)\s+0\s+R", root)
    if not m:
        raise PdfError("catalog has no /Pages")
    pages = _object_at(data, offsets[int(m.group(1))], int(m.group(1)))
    kids = re.search(rb"/Kids\s*\[([^\]]*)\]", pages)
    if not kids:
        raise PdfError("no /Kids")
    return len(_NUM_REF_RE.findall(kids.group(1)))


def decode_pdf_page(data: bytes, page: int) -> np.ndarray:
    """1-based page → grayscale uint8 array. Raises PdfError on anything
    outside the supported subset (maps to PATH_READ_FAIL upstream)."""
    data = bytes(data)
    if not is_pdf(data):
        raise PdfError("bad magic")
    offsets = _xref_offsets(data)
    rootnum = _trailer_root(data)
    root = _object_at(data, offsets[rootnum], rootnum)
    m = re.search(rb"/Pages\s+(\d+)\s+0\s+R", root)
    if not m:
        raise PdfError("catalog has no /Pages")
    pnum = int(m.group(1))
    pages_obj = _object_at(data, offsets[pnum], pnum)
    kids_m = re.search(rb"/Kids\s*\[([^\]]*)\]", pages_obj)
    if not kids_m:
        raise PdfError("no /Kids")
    kids = [int(g) for g in _NUM_REF_RE.findall(kids_m.group(1))]
    if not 1 <= page <= len(kids):
        raise PdfError(f"page {page} out of range 1..{len(kids)}")
    pg = _object_at(data, offsets[kids[page - 1]], kids[page - 1])
    im_m = re.search(rb"/Im0\s+(\d+)\s+0\s+R", pg)
    if not im_m:
        raise PdfError("page has no /Im0 XObject")
    inum = int(im_m.group(1))
    img_obj = _object_at(data, offsets[inum], inum)
    if b"/Subtype /Image" not in img_obj:
        raise PdfError("XObject is not an image")
    if b"/ColorSpace /DeviceGray" not in img_obj:
        raise PdfError("unsupported colorspace")
    if b"/Filter /FlateDecode" not in img_obj:
        raise PdfError("unsupported filter")
    w_m = _KEY_INT_RE[b"Width"].search(img_obj)
    h_m = _KEY_INT_RE[b"Height"].search(img_obj)
    b_m = _KEY_INT_RE[b"BitsPerComponent"].search(img_obj)
    if not (w_m and h_m and b_m) or int(b_m.group(1)) != 8:
        raise PdfError("unsupported image parameters")
    w, h = int(w_m.group(1)), int(h_m.group(1))
    try:
        raw = zlib.decompress(_stream_payload(img_obj))
    except zlib.error as e:  # corrupt stream
        raise PdfError(f"flate error: {e}") from e
    if len(raw) != w * h:
        raise PdfError("image payload size mismatch")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w)


# ---------------------------------------------------------------------------
# media_ref page addressing
# ---------------------------------------------------------------------------

_PAGE_REF_RE = re.compile(r"^(.*?)#page=(\d+)$")


def split_page_ref(media_ref: str) -> tuple[str, int | None]:
    """'doc.pdf#page=3' → ('doc.pdf', 3); plain refs → (ref, None)."""
    m = _PAGE_REF_RE.match(media_ref or "")
    if not m:
        return media_ref, None
    return m.group(1), int(m.group(2))

"""Pluggable OCR kernel with a deterministic stub.

The reference OCRs with pytesseract (``pdf_extractor.py:84-97``,
``image_extractor.py:29-36``).  Tesseract/PIL/pdf2image are absent in
this runtime (and often on locked-down clusters), so the kernel is a
module-level hook: production swaps in a Tesseract-backed callable via
``set_ocr_kernel``; the default stub deterministically recovers the
ground-truth text the synthetic fixtures embed in their payloads:

- PNG stub payloads carry a standard ``tEXt`` chunk with keyword
  ``gt`` whose value is the OCR ground truth.
- synthetic "scanned" PDFs carry per-page comment lines
  ``%OCRPAGE:<base64>``.

Both stubs raise on payloads without embedded ground truth, which maps
to the reference's error-string semantics upstream.
"""

from __future__ import annotations

import base64
import re
import struct
from collections.abc import Callable

_OCRPAGE_RE = re.compile(rb'%OCRPAGE:([A-Za-z0-9+/=]+)')

PNG_MAGIC = b'\x89PNG\r\n\x1a\n'


def _png_text_chunks(data: bytes) -> dict[str, str]:
    """Parse tEXt chunks from a PNG byte stream (PNG spec §11.3.4.3)."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG: bad signature")
    chunks: dict[str, str] = {}
    pos = len(PNG_MAGIC)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack('>I', data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if ctype == b'tEXt' and b'\x00' in body:
            key, _, val = body.partition(b'\x00')
            chunks[key.decode('latin-1')] = val.decode('latin-1')
        pos += 12 + length  # len + type + body + crc
        if ctype == b'IEND':
            break
    return chunks


def stub_ocr_image(data: bytes) -> str:
    """Deterministic stand-in for ``pytesseract.image_to_string``."""
    chunks = _png_text_chunks(data)
    if 'gt' not in chunks:
        raise ValueError("image has no recoverable text")
    return chunks['gt']


def stub_ocr_pdf_pages(data: bytes, max_pages: int) -> list[str]:
    """Deterministic stand-in for ``pdf2image.convert_from_path`` +
    per-page ``pytesseract.image_to_string`` (reference :88-95)."""
    texts = [base64.b64decode(m.group(1)).decode('utf-8')
             for m in _OCRPAGE_RE.finditer(data)]
    return texts[:max_pages]


# Hooks — production replaces these with Tesseract-backed callables.
_ocr_image: Callable[[bytes], str] = stub_ocr_image
_ocr_pdf_pages: Callable[[bytes, int], list[str]] = stub_ocr_pdf_pages


def set_ocr_kernel(image_fn: Callable[[bytes], str] | None = None,
                   pdf_pages_fn: Callable[[bytes, int], list[str]] | None = None) -> None:
    global _ocr_image, _ocr_pdf_pages
    if image_fn is not None:
        _ocr_image = image_fn
    if pdf_pages_fn is not None:
        _ocr_pdf_pages = pdf_pages_fn


def ocr_image(data: bytes) -> str:
    return _ocr_image(data)


def ocr_pdf_pages(data: bytes, max_pages: int) -> list[str]:
    return _ocr_pdf_pages(data, max_pages)

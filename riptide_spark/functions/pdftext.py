"""Minimal deterministic PDF text extraction (E18/S7) + fixture writer.

The reference extracts PDF text with pdfium
(``/root/reference/crates/riptide-pdf/src/processor.rs:642-760``): per-page
text appended with a trailing newline, per-page image objects counted into
``pdf:image:{i}`` media placeholders, title/author/producer/subject lifted
from the document info dictionary, quality 85, reading time
``max(words/200, 1)`` (``utils.rs:117-121``).

pdfium (and pypdf) are not in this container, so this module vendors a
small from-scratch parser for the classic-PDF subset the engine's own
fixture writer produces — plus any similarly simple real-world PDF:

* objects located by ``N G obj … endobj`` scan (no xref dependence — more
  robust than xref on linearized/appended files);
* page tree walked from ``/Root → /Pages → /Kids`` (document page order),
  falling back to object-number order of ``/Type /Page`` objects;
* content streams raw or ``/FlateDecode`` (zlib);
* text operators ``Tj`` ``'`` ``"`` ``TJ`` with literal-string escapes
  (``\\n`` ``\\(`` octal …) and hex strings; ``T*``/``Td``/``TD``/``'``
  start a new line;
* images counted as ``/XObject`` resources with ``/Subtype /Image``;
* the info dictionary's Title/Author/Producer/Subject strings.

Byte convention: literal strings are written/decoded as UTF-8 (real PDFs
use font encodings — out of scope; the convention is deterministic and
round-trips the fixture writer exactly, which is what the structure oracle
pins).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field


class PdfInvalid(ValueError):
    """Raised when bytes are not a parseable classic PDF."""


# ---------------------------------------------------------------------------
# Fixture writer — deterministic minimal PDFs for tests and driver queries.
# ---------------------------------------------------------------------------


def _escape_literal(text: str) -> bytes:
    out = (
        text.replace("\\", "\\\\")
        .replace("(", "\\(")
        .replace(")", "\\)")
        .replace("\r", "\\r")
        .replace("\n", "\\n")
    )
    return out.encode("utf-8")


def build_minimal_pdf(
    pages: list[str],
    images_per_page: int = 0,
    info: dict[str, str] | None = None,
    compress: bool = False,
) -> bytes:
    """Write a deterministic classic PDF: one content stream per page, one
    ``Tj`` per page, optional 1×1 image XObjects, optional Flate
    compression, optional /Info dictionary (Title/Author/Producer/Subject).
    """
    objects: list[bytes] = []  # 1-indexed object bodies (without N 0 obj wrapper)

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    catalog_num = add(b"")  # placeholder, patched after pages node exists
    pages_num = add(b"")

    page_nums: list[int] = []
    image_counter = 0
    for text in pages:
        stream = b"BT /F1 12 Tf 72 720 Td (" + _escape_literal(text) + b") Tj ET"
        filt = b""
        if compress:
            stream = zlib.compress(stream, 6)
            filt = b" /Filter /FlateDecode"
        content_num = add(
            b"<< /Length " + str(len(stream)).encode() + filt + b" >>\n"
            b"stream\n" + stream + b"\nendstream"
        )
        xobj_entries = []
        for _ in range(images_per_page):
            img_num = add(
                b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
                b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 1 >>\n"
                b"stream\n\x00\nendstream"
            )
            xobj_entries.append(
                f"/Im{image_counter} {img_num} 0 R".encode()
            )
            image_counter += 1
        resources = b"<< /Font << /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >>"
        if xobj_entries:
            resources += b" /XObject << " + b" ".join(xobj_entries) + b" >>"
        resources += b" >>"
        page_num = add(
            b"<< /Type /Page /Parent " + str(pages_num).encode() + b" 0 R "
            b"/MediaBox [0 0 612 792] /Contents " + str(content_num).encode() + b" 0 R "
            b"/Resources " + resources + b" >>"
        )
        page_nums.append(page_num)

    kids = b"[" + b" ".join(f"{n} 0 R".encode() for n in page_nums) + b"]"
    objects[pages_num - 1] = (
        b"<< /Type /Pages /Kids " + kids + b" /Count " + str(len(page_nums)).encode() + b" >>"
    )
    objects[catalog_num - 1] = (
        b"<< /Type /Catalog /Pages " + str(pages_num).encode() + b" 0 R >>"
    )

    info_num = None
    if info:
        entries = b""
        for key in ("Title", "Author", "Producer", "Subject"):
            if key in info:
                entries += (
                    b"/" + key.encode() + b" (" + _escape_literal(info[key]) + b") "
                )
        info_num = add(b"<< " + entries + b">>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    trailer = b"trailer\n<< /Size " + str(len(objects) + 1).encode()
    trailer += b" /Root " + str(catalog_num).encode() + b" 0 R"
    if info_num:
        trailer += b" /Info " + str(info_num).encode() + b" 0 R"
    trailer += b" >>\nstartxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    out += trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_NAME_STR = rb"/(Title|Author|Producer|Subject)\s*\(((?:[^()\\]|\\.)*)\)"


@dataclass
class PdfPage:
    text: str
    image_count: int


@dataclass
class PdfDoc:
    pages: list[PdfPage] = field(default_factory=list)
    info: dict[str, str] = field(default_factory=dict)

    @property
    def text(self) -> str:
        """processor.rs:692-696: per-page text, each followed by '\\n'."""
        return "".join(p.text + "\n" for p in self.pages)

    @property
    def image_count(self) -> int:
        return sum(p.image_count for p in self.pages)


def validate_pdf_header(data: bytes) -> None:
    """utils.rs:129-140 subset: length and magic."""
    if len(data) < 8:
        raise PdfInvalid("File too small to be a valid PDF")
    if not data.startswith(b"%PDF-"):
        raise PdfInvalid("File does not start with PDF magic bytes")


# `\b` pins the full integer (no backtracking into a prefix of the object
# number), the lookahead rejects the `N G R` indirect-reference form.
_DIRECT_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R\b)")
_INDIRECT_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R\b")


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """Object bodies by number (last definition wins, as with appended
    updates). Sequential scan: stream payloads are skipped via /Length, so
    binary stream bytes that happen to contain ``obj``/``endobj`` (routine
    with Flate data) can neither truncate an object nor fake a new one."""
    objects: dict[int, bytes] = {}
    pos = 0
    while True:
        match = _OBJ_RE.search(data, pos)
        if match is None:
            break
        start = match.end()
        search_from = start
        d = _dict_of(data[start : start + 8192])
        if d:
            # A direct /Length only — `/Length 12 0 R` is an indirect
            # reference whose integer is an object NUMBER, not a byte count;
            # trusting it mis-skips the stream (ADVICE r2). Indirect lengths
            # fall back to the endstream scan from the payload start.
            length = re.search(_DIRECT_LENGTH_RE, d)
            indirect = None if length else re.search(_INDIRECT_LENGTH_RE, d)
            stream_at = data.find(b"stream", start)
            if (length or indirect) and stream_at != -1 and stream_at < start + 8192:
                payload = stream_at + len(b"stream")
                if data[payload : payload + 2] == b"\r\n":
                    payload += 2
                elif data[payload : payload + 1] in (b"\n", b"\r"):
                    payload += 1
                if length:
                    search_from = payload + int(length.group(1))
                else:
                    es = data.find(b"endstream", payload)
                    if es != -1:
                        search_from = es
        end = data.find(b"endobj", search_from)
        if end == -1:
            break
        objects[int(match.group(1))] = data[start:end]
        pos = end + len(b"endobj")
    return objects


def _dict_of(body: bytes) -> bytes:
    """The object's top-level << … >> dictionary (balanced)."""
    start = body.find(b"<<")
    if start == -1:
        return b""
    depth = 0
    i = start
    while i < len(body) - 1:
        if body[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif body[i : i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


def _stream_of(body: bytes, objects: dict[int, bytes] | None = None) -> bytes | None:
    idx = body.find(b"stream")
    if idx == -1:
        return None
    start = idx + len(b"stream")
    if body[start : start + 2] == b"\r\n":
        start += 2
    elif body[start : start + 1] in (b"\n", b"\r"):
        start += 1
    # /Length is authoritative — binary payloads may legitimately end in
    # EOL bytes or contain 'endstream'. An indirect `/Length N 0 R` is
    # resolved through the object table when available; only without any
    # usable length do we fall back to the endstream scan + single-EOL trim.
    d = _dict_of(body)
    length = _DIRECT_LENGTH_RE.search(d)
    if length:
        return body[start : start + int(length.group(1))]
    indirect = _INDIRECT_LENGTH_RE.search(d)
    if indirect and objects is not None:
        target = objects.get(int(indirect.group(1)), b"")
        value = re.match(rb"\s*(\d+)\s*$", target)
        if value:
            return body[start : start + int(value.group(1))]
    end = body.rfind(b"endstream")
    if end == -1:
        return None
    raw = body[start:end]
    if raw.endswith(b"\r\n"):
        raw = raw[:-2]
    elif raw.endswith((b"\n", b"\r")):
        raw = raw[:-1]
    return raw


def _content_bytes(body: bytes, objects: dict[int, bytes] | None = None) -> bytes:
    raw = _stream_of(body, objects)
    if raw is None:
        return b""
    if b"/FlateDecode" in _dict_of(body):
        try:
            return zlib.decompress(raw)
        except zlib.error as exc:
            raise PdfInvalid(f"Bad FlateDecode stream: {exc}") from exc
    return raw


def _unescape_literal(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x5C and i + 1 < len(raw):  # backslash
            nxt = raw[i + 1]
            mapped = {
                ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
                ord("b"): b"\b", ord("f"): b"\f",
                ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
            }.get(nxt)
            if mapped is not None:
                out += mapped
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                digits = b""
                while j < len(raw) and len(digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    digits += bytes([raw[j]])
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            if nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < len(raw) and raw[i] == 0x0A:
                    i += 1
                continue
            out.append(nxt)
            i += 2
            continue
        out.append(b)
        i += 1
    return out.decode("utf-8", errors="replace")


_NEWLINE_OPS = {b"T*", b"Td", b"TD"}


def extract_page_text(content: bytes) -> str:
    """Tokenize a content stream; collect show-text operators.

    ``Tj`` appends its string; ``TJ`` appends each string element of its
    array; ``'`` and ``\"`` move to the next line then show. ``T*``, ``Td``
    and ``TD`` start a new line when text has already been emitted (a
    pdfium-style linearization, pinned by the fixture round-trip)."""
    parts: list[str] = []
    pending: list[str] = []  # strings seen since the last operator
    i, n = 0, len(content)

    def newline() -> None:
        if parts and not parts[-1].endswith("\n"):
            parts.append("\n")

    while i < n:
        c = content[i]
        if c == 0x28:  # '(' literal string with nesting
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth:
                b = content[j]
                if b == 0x5C and j + 1 < n:
                    buf += content[j : j + 2]
                    j += 2
                    continue
                if b == 0x28:
                    depth += 1
                elif b == 0x29:
                    depth -= 1
                    if depth == 0:
                        break
                buf.append(b)
                j += 1
            pending.append(_unescape_literal(bytes(buf)))
            i = j + 1
            continue
        if c == 0x3C and content[i : i + 2] != b"<<":  # '<' hex string
            j = content.find(b">", i + 1)
            if j == -1:
                break
            hexdigits = re.sub(rb"\s", b"", content[i + 1 : j])
            if len(hexdigits) % 2:
                hexdigits += b"0"
            try:
                pending.append(bytes.fromhex(hexdigits.decode("ascii")).decode("utf-8", "replace"))
            except ValueError:
                pass
            i = j + 1
            continue
        if c == 0x3C:  # '<<' dictionary — skip balanced
            depth = 0
            while i < n - 1:
                if content[i : i + 2] == b"<<":
                    depth += 1
                    i += 2
                elif content[i : i + 2] == b">>":
                    depth -= 1
                    i += 2
                    if depth == 0:
                        break
                else:
                    i += 1
            continue
        match = re.match(rb"[A-Za-z'\"*]+", content[i:])
        if match:
            op = match.group(0)
            if op == b"Tj":
                parts.extend(pending)
            elif op == b"TJ":
                parts.extend(pending)
            elif op in (b"'", b'"'):
                newline()
                parts.extend(pending)
            elif op in _NEWLINE_OPS:
                newline()
            pending.clear()
            i += len(op)
            continue
        i += 1
    return "".join(parts)


def _resolve(objects: dict[int, bytes], token: bytes) -> bytes:
    """Resolve ``N 0 R`` to the object body, else return the token."""
    ref = _REF_RE.match(token.strip())
    if ref:
        return objects.get(int(ref.group(1)), b"")
    return token


def _page_numbers(objects: dict[int, bytes], data: bytes) -> list[int]:
    """Page object numbers in page-tree order (Kids walk), falling back to
    object-number order of /Type /Page objects."""
    root_pages: int | None = None
    for body in objects.values():
        d = _dict_of(body)
        if b"/Type" in d and b"/Catalog" in d:
            m = re.search(rb"/Pages\s+(\d+)\s+0\s+R", d)
            if m:
                root_pages = int(m.group(1))
            break
    ordered: list[int] = []

    def walk(num: int, seen: set[int]) -> None:
        if num in seen:
            return
        seen.add(num)
        body = objects.get(num)
        if body is None:
            return
        d = _dict_of(body)
        if b"/Page" in d and b"/Pages" not in d and b"/Kids" not in d:
            ordered.append(num)
            return
        kids = re.search(rb"/Kids\s*\[([^\]]*)\]", d)
        if kids:
            for m in _REF_RE.finditer(kids.group(1)):
                walk(int(m.group(1)), seen)

    if root_pages is not None:
        walk(root_pages, set())
    if not ordered:
        for num in sorted(objects):
            d = _dict_of(objects[num])
            if re.search(rb"/Type\s*/Page\b", d) and b"/Kids" not in d:
                ordered.append(num)
    return ordered


def _page_images(objects: dict[int, bytes], page_dict: bytes) -> int:
    xobj = re.search(rb"/XObject\s*<<(.*?)>>", page_dict, re.DOTALL)
    if not xobj:
        return 0
    count = 0
    for m in _REF_RE.finditer(xobj.group(1)):
        body = objects.get(int(m.group(1)), b"")
        if re.search(rb"/Subtype\s*/Image\b", _dict_of(body)):
            count += 1
    return count


def _page_content(objects: dict[int, bytes], page_dict: bytes) -> bytes:
    m = re.search(rb"/Contents\s+(\d+\s+0\s+R|\[[^\]]*\])", page_dict)
    if not m:
        return b""
    token = m.group(1)
    if token.startswith(b"["):
        return b"".join(
            _content_bytes(objects.get(int(r.group(1)), b""), objects)
            for r in _REF_RE.finditer(token)
        )
    return _content_bytes(_resolve(objects, token), objects)


def parse_pdf(data: bytes) -> PdfDoc:
    """Parse a classic PDF into per-page text + image counts + info dict.

    Raises :class:`PdfInvalid` on non-PDF bytes or unparseable structure
    (the caller maps that to the reference's fallback error document)."""
    validate_pdf_header(data)
    objects = _scan_objects(data)
    if not objects:
        raise PdfInvalid("No PDF objects found")
    page_nums = _page_numbers(objects, data)
    if not page_nums:
        raise PdfInvalid("No pages found")

    doc = PdfDoc()
    for num in page_nums:
        page_dict = _dict_of(objects[num])
        content = _page_content(objects, page_dict)
        doc.pages.append(
            PdfPage(
                text=extract_page_text(content),
                image_count=_page_images(objects, page_dict),
            )
        )

    info_ref = re.search(rb"/Info\s+(\d+)\s+0\s+R", data)
    if info_ref:
        body = objects.get(int(info_ref.group(1)), b"")
        for m in re.finditer(_NAME_STR, _dict_of(body)):
            doc.info[m.group(1).decode()] = _unescape_literal(m.group(2))
    return doc

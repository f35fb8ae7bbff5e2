#!/usr/bin/env python3
"""Generate the LZWDecode golden fixture for SimplePdfSpec.

Contains BOTH an LZW encoder and an independent decoder implementing
the PDF/TIFF early-change width rule (width chosen from the decoder's
table size BEFORE each read: <511 -> 9 bits, <1023 -> 10, <2047 -> 11,
else 12 — the rule production PDF readers use). The script self-checks
encoder->decoder round-trips before writing the fixture, so the Scala
decoder is validated against an implementation that is itself
round-trip-consistent.

Run from the repo root:  python3 scripts/make_lzw_pdf.py
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "pdf")

CLEAR, EOD = 256, 257


def _width(table_len: int) -> int:
    return 9 if table_len < 511 else 10 if table_len < 1023 else 11 if table_len < 2047 else 12


def lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table = [bytes([i]) for i in range(256)] + [None, None]
    prev = None
    bitbuf = nbits = pos = 0
    while True:
        w = _width(len(table))
        while nbits < w:
            if pos >= len(data):
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - w)) & ((1 << w) - 1)
        nbits -= w
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [None, None]
            prev = None
        elif code == EOD:
            return bytes(out)
        elif prev is None:
            x = table[code]
            out += x
            prev = x
        else:
            if code < len(table):
                x = table[code]
                table.append(prev + x[:1])
            else:
                x = prev + prev[:1]
                table.append(x)
            out += x
            prev = x


def lzw_encode(data: bytes) -> bytes:
    bits: list[tuple[int, int]] = []
    # explicit model of the DECODER's table: length (drives the width
    # chosen before each code) and whether it holds a prev string (the
    # first code after a CLEAR appends nothing)
    dec_len = 258
    dec_prev = False

    def emit(code: int) -> None:
        nonlocal dec_len, dec_prev
        bits.append((code, _width(dec_len)))
        if code == CLEAR:
            dec_len, dec_prev = 258, False
        elif code != EOD:
            if dec_prev:
                dec_len += 1
            dec_prev = True

    emit(CLEAR)
    d = {bytes([i]): i for i in range(256)}
    next_code = 258
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in d:
            w = wc
        else:
            emit(d[w])
            if next_code < 4096:
                d[wc] = next_code
                next_code += 1
            else:
                # table full: emit a mid-stream CLEAR and reset, as
                # conforming PDF writers do — without it the decoder
                # keeps appending per code and the widths desync
                emit(CLEAR)
                d = {bytes([i]): i for i in range(256)}
                next_code = 258
            w = bytes([ch])
    if w:
        emit(d[w])
    emit(EOD)
    # pack MSB-first
    buf = bytearray()
    acc = nacc = 0
    for code, width in bits:
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            buf.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
    if nacc:
        buf.append((acc << (8 - nacc)) & 0xFF)
    return bytes(buf)


CONTENT = (
    b"BT /F1 12 Tf 72 720 Td (LZW page body text with repeats: "
    b"the cat the cat the cat sat.) Tj ET")


def main() -> None:
    # self-check on the fixture payload and on adversarial inputs,
    # including a deterministic high-entropy payload large enough to
    # fill the 4096-entry table and force mid-stream CLEARs
    noisy = bytes(((i * 1103515245 + 12345) >> 16) & 0xFF for i in range(20000))
    for probe in (CONTENT, b"", b"a", b"ab" * 2000, bytes(range(256)) * 20, noisy):
        assert lzw_decode(lzw_encode(probe)) == probe, "round-trip failed"
    os.makedirs(OUT, exist_ok=True)
    enc = lzw_encode(CONTENT)
    doc = (
        b"%PDF-1.2\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        + b"4 0 obj << /Length %d /Filter /LZWDecode >> stream\n" % len(enc)
        + enc + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n")
    path = os.path.join(OUT, "lzw.pdf")
    with open(path, "wb") as f:
        f.write(doc)
    print(f"wrote {path} ({len(doc)} bytes)")


if __name__ == "__main__":
    main()

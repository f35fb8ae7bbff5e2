#!/usr/bin/env python3
"""Generate golden encrypted-PDF fixtures for SimplePdfSpec.

Independent (python, spec-faithful) implementation of the ISO 32000-1
and 32000-2 standard security handlers, so the Scala decryptor is
verified against a SECOND implementation of the spec rather than
against itself. Produces, under src/test/resources/pdf/:

  plain.pdf      — the unencrypted twin (two pages, page 2 FlateDecode)
  rc4_40.pdf     — V1 R2, RC4 40-bit
  rc4_128.pdf    — V2 R3, RC4 128-bit
  aesv2.pdf      — V4 R4, AES-128-CBC (/CF /StdCF /CFM /AESV2)
  aes256_r5.pdf  — V5 R5, AES-256 (/CFM /AESV3, plain-SHA-256 /U hash)
  aes256.pdf     — V5 R6, AES-256 (/CFM /AESV3, hardened 2.B /U hash)

All use the EMPTY user password (owner password "owner") — the
transparent-open case pdfminer handles for the reference corpus.

Run from the repo root:  python3 scripts/make_encrypted_pdf.py
(dev tooling only — the library itself never shells out to python)
"""
import hashlib
import os
import struct
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "pdf")

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA,
    0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE,
    0x64, 0x53, 0x69, 0x7A])


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    x = y = 0
    for b in data:
        x = (x + 1) & 0xFF
        y = (y + s[x]) & 0xFF
        s[x], s[y] = s[y], s[x]
        out.append(b ^ s[(s[x] + s[y]) & 0xFF])
    return bytes(out)


def md5(b: bytes) -> bytes:
    return hashlib.md5(b).digest()


def pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = md5(pad_pw(owner_pw))
    if r >= 3:
        for _ in range(50):
            key = md5(key)
    key = key[:n]
    out = rc4(key, pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key), out)
    return out


def file_key(user_pw: bytes, o: bytes, p: int, id0: bytes, r: int, n: int) -> bytes:
    """Algorithm 2 (EncryptMetadata true)."""
    m = hashlib.md5()
    m.update(pad_pw(user_pw))
    m.update(o)
    m.update(struct.pack("<i", p))
    m.update(id0)
    key = m.digest()
    if r >= 3:
        for _ in range(50):
            key = md5(key[:n])
    return key[:n]


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4/5: the /U entry."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, md5(PAD + id0))
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def obj_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1 per-object key."""
    m = hashlib.md5()
    m.update(key)
    m.update(struct.pack("<I", num)[:3])
    m.update(struct.pack("<I", gen)[:2])
    if aes:
        m.update(b"sAlT")
    return m.digest()[: min(len(key) + 5, 16)]


def aes_encrypt(key: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    iv = bytes(range(1, 17))  # fixed IV: fixtures must be byte-stable
    padlen = 16 - len(data) % 16
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return iv + enc.update(data + bytes([padlen]) * padlen) + enc.finalize()


CONTENT1 = (
    b"BT /F1 12 Tf 72 720 Td (Encrypted page one body text.) Tj "
    b"0 -14 Td (Second line with \\(escapes\\) kept.) Tj ET")
CONTENT2 = b"BT 72 720 Td (Encrypted page two via flate.) Tj ET"


def hash_2b(pw: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6); plain SHA-256 for R5."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    K = hashlib.sha256(pw + salt + udata).digest()
    if r == 5:
        return K
    i = 0
    while True:
        K1 = (pw + K + udata) * 64
        enc = Cipher(algorithms.AES(K[:16]), modes.CBC(K[16:32])).encryptor()
        E = enc.update(K1) + enc.finalize()
        K = [hashlib.sha256, hashlib.sha384, hashlib.sha512][sum(E[:16]) % 3](E).digest()
        i += 1
        if i >= 64 and E[-1] <= i - 32:
            return K[:32]


def make_enc_v5(r: int) -> dict:
    """V5 AES-256 (AESV3): /U self-validating hash + salts, file key
    wrapped in /UE; owner-side /O and /OE generated properly with the
    owner password even though the empty-user open path never reads
    them."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    def cbc0(key: bytes, data: bytes) -> bytes:
        enc = Cipher(algorithms.AES(key), modes.CBC(b"\x00" * 16)).encryptor()
        return enc.update(data) + enc.finalize()

    fk = bytes(range(32))  # fixed file key: fixtures must be byte-stable
    vs, ks = bytes(range(8)), bytes(range(8, 16))
    u = hash_2b(b"", vs, b"", r) + vs + ks
    ue = cbc0(hash_2b(b"", ks, b"", r), fk)
    ovs, oks = bytes(range(16, 24)), bytes(range(24, 32))
    o = hash_2b(b"owner", ovs, u, r) + ovs + oks
    oe = cbc0(hash_2b(b"owner", oks, u, r), fk)
    d = (b"/V 5 /R %d /Length 256 /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
         b"/StmF /StdCF /StrF /StdCF /OE <%s> /UE <%s>"
         % (r, oe.hex().encode(), ue.hex().encode()))
    return {"key": fk, "aes": True, "o": o, "u": u, "p": -3904, "dict": d, "v5": True}


def build(out_name: str, enc: dict | None) -> None:
    id0 = bytes.fromhex("0123456789abcdef0123456789abcdef")
    flate2 = zlib.compress(CONTENT2)

    def protect(num: int, data: bytes) -> bytes:
        if enc is None:
            return data
        if enc.get("v5"):
            return aes_encrypt(enc["key"], data)  # V5: file key, no per-object derivation
        k = obj_key(enc["key"], num, 0, enc["aes"])
        return aes_encrypt(k, data) if enc["aes"] else rc4(k, data)

    s5 = protect(5, CONTENT1)
    s6 = protect(6, flate2)
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n",
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n",
        b"5 0 obj << /Length %d >> stream\n" % len(s5) + s5 + b"\nendstream endobj\n",
        b"6 0 obj << /Length %d /Filter /FlateDecode >> stream\n" % len(s6)
        + s6 + b"\nendstream endobj\n",
    ]
    trailer = b"trailer << /Root 1 0 R /ID [<%s> <%s>] " % (id0.hex().encode(), id0.hex().encode())
    if enc is not None:
        objs.append(
            b"7 0 obj << /Filter /Standard %s /O <%s> /U <%s> /P %d >> endobj\n"
            % (enc["dict"], enc["o"].hex().encode(), enc["u"].hex().encode(), enc["p"]))
        trailer += b"/Encrypt 7 0 R "
    trailer += b">>\n%%EOF\n"
    body = b"%PDF-1.6\n" + b"".join(objs) + trailer
    path = os.path.join(OUT, out_name)
    with open(path, "wb") as f:
        f.write(body)
    print(f"wrote {path} ({len(body)} bytes)")


def make_enc(r: int, v: int, nbits: int, aes: bool) -> dict:
    p = -3904  # typical print-allowed permission mask
    n = nbits // 8
    id0 = bytes.fromhex("0123456789abcdef0123456789abcdef")
    o = compute_o(b"owner", b"", r, n)
    key = file_key(b"", o, p, id0, r, n)
    u = compute_u(key, id0, r)
    if v < 4:
        d = b"/V %d /R %d /Length %d" % (v, r, nbits)
    else:
        d = (b"/V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
             b"/StmF /StdCF /StrF /StdCF")
    return {"key": key, "aes": aes, "o": o, "u": u, "p": p, "dict": d}


def build_objstm(out_name: str, enc: dict | None) -> None:
    """PDF 1.5 layout: page + font dicts packed in a Flate ObjStm
    (encrypted when enc is set), content stream top-level. Exercises
    the decrypt -> inflate -> expand ordering against this independent
    writer."""
    id0 = bytes.fromhex("0123456789abcdef0123456789abcdef")
    content = b"BT /F1 12 Tf 72 720 Td (Text from an object stream page.) Tj ET"

    def protect(num: int, data: bytes) -> bytes:
        if enc is None:
            return data
        k = obj_key(enc["key"], num, 0, enc["aes"])
        return aes_encrypt(k, data) if enc["aes"] else rc4(k, data)

    # embedded objects: 1 = catalog, 2 = pages, 3 = page, 6 = font
    emb = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 6 0 R >> >> /Contents 4 0 R >>"),
        (6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    offs, body = [], b""
    for num, d in emb:
        offs.append((num, len(body)))
        body += d + b" "
    header = b" ".join(b"%d %d" % p for p in offs) + b" "
    payload = zlib.compress(header + body)
    s5 = protect(5, payload)
    s4 = protect(4, content)
    objs = [
        b"5 0 obj << /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >> stream\n"
        % (len(emb), len(header), len(s5)) + s5 + b"\nendstream endobj\n",
        b"4 0 obj << /Length %d >> stream\n" % len(s4) + s4 + b"\nendstream endobj\n",
    ]
    trailer = b"trailer << /Root 1 0 R /ID [<%s> <%s>] " % (id0.hex().encode(), id0.hex().encode())
    if enc is not None:
        objs.append(
            b"7 0 obj << /Filter /Standard %s /O <%s> /U <%s> /P %d >> endobj\n"
            % (enc["dict"], enc["o"].hex().encode(), enc["u"].hex().encode(), enc["p"]))
        trailer += b"/Encrypt 7 0 R "
    trailer += b">>\n%%EOF\n"
    body_all = b"%PDF-1.6\n" + b"".join(objs) + trailer
    path = os.path.join(OUT, out_name)
    with open(path, "wb") as f:
        f.write(body_all)
    print(f"wrote {path} ({len(body_all)} bytes)")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    build("plain.pdf", None)
    build("rc4_40.pdf", make_enc(r=2, v=1, nbits=40, aes=False))
    build("rc4_128.pdf", make_enc(r=3, v=2, nbits=128, aes=False))
    build("aesv2.pdf", make_enc(r=4, v=4, nbits=128, aes=True))
    build("aes256_r5.pdf", make_enc_v5(r=5))
    build("aes256.pdf", make_enc_v5(r=6))
    build_objstm("objstm.pdf", None)
    build_objstm("objstm_rc4.pdf", make_enc(r=3, v=2, nbits=128, aes=False))


if __name__ == "__main__":
    main()

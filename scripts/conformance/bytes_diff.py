#!/usr/bin/env python3
"""Differential BYTE-DECODE oracle: run the reference's real encoding sniff
and decode (ts_strip'd, under node via ref_bytes_dump.mjs) and ours
(graft.tools.BytesDiffDump) over raw byte corpora — BOMs, transport
overrides, meta prescan spellings, windows-1252 high bytes, UTF-16
payloads, malformed UTF-8 — and compare (decoded text, encoding, sniff
source) exactly. This is the layer parseBytes/parseStream build on.

Usage: python3 scripts/conformance/ts_strip.py   # once, builds /tmp/refjs
       python3 scripts/conformance/bytes_diff.py
Env: BYTES_DIFF_SEED=0x... varies the fuzz half.
"""
import base64
import json
import os
import random
import subprocess
import sys
import tempfile


def corpus():
    cases = []  # (bytes, transport-or-None)

    def add(b, t=None):
        cases.append((b, t))

    texts = [b"<p>hello</p>", b"plain", b"", b"<h1>T\xc3\xa9st</h1>",
             b"a\xe2\x82\xacb", b"x" * 20000]
    boms = [b"\xef\xbb\xbf", b"\xfe\xff", b"\xff\xfe", b""]
    for t in texts:
        for bom in boms:
            add(bom + t)
            add(bom + t, "utf-8")
            add(bom + t, "ISO-8859-1")
    # transport labels incl. junk and aliases
    for lbl in ["utf-8", "UTF-8", " utf-8 ", "windows-1252", "latin1",
                "iso8859-1", "us-ascii", "utf-16le", "UTF-16BE", "bogus-enc",
                "", "csISOLatin1"]:
        add(b"<p>t\xe9xt</p>", lbl)
    # meta charset spellings
    metas = [
        b"<meta charset=utf-8>", b"<meta charset='utf-8'>",
        b'<meta charset="windows-1252">', b"<meta CHARSET=UTF-8>",
        b"<meta charset = utf-8 >", b"<meta charset=latin1>",
        b"<meta charset=bogus>", b"<meta name=x charset=utf-8>",
        b'<meta http-equiv="Content-Type" content="text/html; charset=utf-8">',
        b"<meta http-equiv=content-type content='text/html;charset=windows-1252'>",
        b"<meta http-equiv=CONTENT-TYPE content=\"charset=utf-8\">",
        b"<meta content='charset=utf-8' http-equiv=content-type>",
        b"<!-- <meta charset=utf-8> -->",
        b"<!--\n<meta charset=utf-8>\n-->\n<meta charset=windows-1252>",
        b"<script><meta charset=utf-8></script>",
        b"<meta charset=utf-16le>", b"<meta charset=UTF-16BE>",
        b"<meta charset=x-user-defined>",
    ]
    for mb in metas:
        add(b"<head>" + mb + b"</head><body>t\xe9xt")
        add(b"<head>" + mb + b"</head>", "utf-16le")
    # meta beyond the 16KB prescan window
    add(b" " * 16500 + b"<meta charset=utf-8>t\xe9xt")
    add(b" " * 16300 + b"<meta charset=utf-8>t\xe9xt")
    # utf-16 payloads with and without BOM
    u = "<p>héllo ☃</p>"
    add(b"\xff\xfe" + u.encode("utf-16-le"))
    add(b"\xfe\xff" + u.encode("utf-16-be"))
    add(u.encode("utf-16-le"), "utf-16le")
    add(u.encode("utf-16-be"), "utf-16be")
    add(u.encode("utf-16-le")[:-1], "utf-16le")  # odd length
    # malformed utf-8 under a utf-8 ruling
    bad = [b"\x80", b"\xc3", b"\xc3\x28", b"\xe0\x80", b"\xe0\x80\x80",
           b"\xf0\x28\x8c\x28", b"\xf8\xa1\xa1", b"\xed\xa0\x80",
           b"\xf4\x90\x80\x80", b"\xc0\xaf", b"\xbf\xbf"]
    for b in bad:
        add(b"\xef\xbb\xbf" + b"a" + b + b"z")
        add(b"a" + b + b"z", "utf-8")
        add(b"<meta charset=utf-8>a" + b + b"z")
    # windows-1252 high bytes incl. undefined slots
    add(bytes(range(0x7f, 0x100)))
    add(bytes(range(0x7f, 0x100)), "windows-1252")

    seed0 = int(os.environ.get("BYTES_DIFF_SEED", "0xB17E5"), 16)
    rng = random.Random(seed0)

    # meta-prescan fuzz: the prescan algorithm's corners (spellings, quote
    # styles, http-equiv content parsing, comments incl. unterminated,
    # rawtext-ish containers, multiple competing metas, junk values)
    meta_bits = [
        b"<meta charset=", b"<META CHARSET=", b"<meta  charset =",
        b"<meta foo=bar charset=", b"<meta http-equiv=content-type content=\"text/html; charset=",
        b"<meta http-equiv='Content-Type' content='charset=",
        b"<meta content=\"charset=", b"<meta charset charset=",
    ]
    enc_vals = [b"utf-8", b"'utf-8'", b'"utf-8"', b"windows-1252", b"latin1",
                b"UTF-8 ", b" utf-8", b"bogus", b"utf-16le", b"x-user-defined",
                b"utf8", b"", b"'utf-8", b"utf-8'"]
    wrappers = [b"", b"<!-- ", b"<!--", b"<script>", b"<title>", b"<p x=y>",
                b"<!-- -->", b"<!--x--!>", b"</", b"<"]
    closers = [b">", b" >", b"/>", b"", b" foo=bar>"]
    pre_noise = [b"", b"\x00", b"\xc3\xa9", b"<p>text</p>", b"<!--noise-->",
                 b"<not-meta charset=utf-8>", b"\xff"]
    for _ in range(int(os.environ.get("BYTES_DIFF_META_FUZZ", "1200"))):
        parts = [rng.choice(pre_noise)]
        for _ in range(rng.randint(1, 3)):
            parts.append(rng.choice(wrappers))
            parts.append(rng.choice(meta_bits) + rng.choice(enc_vals) +
                         rng.choice(closers))
            parts.append(rng.choice(pre_noise))
        parts.append(b"t\xe9xt tail")
        add(b"".join(parts))
    frag_pool = [b"<p>", b"</p>", b"text ", b"\xc3\xa9", b"\xe2\x98\x83",
                 b"\x80", b"\xc3", b"\xff", b"\xfe", b"\x00", b"\x9d",
                 b"<meta charset=utf-8>", b"<meta charset=windows-1252>",
                 b"\xef\xbb\xbf", b"<!--x-->", b"\xed\xa0\x80", b"\xf0\x9f\x98\x80"]
    transports = [None, None, None, "utf-8", "windows-1252", "utf-16le", "junk"]
    for _ in range(int(os.environ.get("BYTES_DIFF_FUZZ", "2000"))):
        n = rng.randint(1, 12)
        payload = b"".join(rng.choice(frag_pool) for _ in range(n))
        add(payload, rng.choice(transports))
    return cases


def main():
    inputs = corpus()
    print(f"{len(inputs)} byte cases")
    payload = "\n".join(
        json.dumps({"b": base64.b64encode(b).decode(), "t": t})
        for b, t in inputs) + "\n"

    with tempfile.NamedTemporaryFile("w", suffix=".jsonl", delete=False) as f:
        f.write(payload)
        path = f.name

    ref = subprocess.run(
        ["node", "scripts/conformance/ref_bytes_dump.mjs"],
        input=payload, capture_output=True, text=True, check=True).stdout
    ours = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.BytesDiffDump {path}"],
        capture_output=True, text=True, check=True).stdout
    our_lines = [l.replace("[info] ", "").strip() for l in ours.splitlines()
                 if l.startswith("[info] ") and
                 all(ch.isalnum() or ch in "+/=" for ch in l.replace("[info] ", "").strip())
                 and len(l.replace("[info] ", "").strip()) > 0]
    ref_lines = [l.strip() for l in ref.splitlines() if l.strip()]
    our_lines = our_lines[-len(inputs):]
    assert len(ref_lines) == len(inputs), (len(ref_lines), len(inputs))
    assert len(our_lines) == len(inputs), (len(our_lines), len(inputs))

    mismatches = 0
    for i, (r, o) in enumerate(zip(ref_lines, our_lines)):
        rj = json.loads(base64.b64decode(r).decode())
        oj = json.loads(base64.b64decode(o).decode())
        if rj == oj:
            continue
        mismatches += 1
        if mismatches <= 30:
            b, t = inputs[i]
            print(f"--- MISMATCH case {i}: bytes={b[:80]!r} transport={t!r}")
            print(f"    ref:  {json.dumps(rj)[:400]}")
            print(f"    ours: {json.dumps(oj)[:400]}")
    print(f"{mismatches} mismatches / {len(inputs)} cases")
    os.unlink(path)
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()

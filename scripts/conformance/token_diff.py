#!/usr/bin/env python3
"""Differential tokenizer oracle: tokenize the same adversarial corpus with
the reference's vendored parse5 Tokenizer and our Scala tokenizer, compare
canonical merged token streams.

Usage: python3 scripts/conformance/token_diff.py  (from the repo root,
after `sbt -batch compile`).
"""
import base64
import subprocess
import sys
import tempfile
import os

from tree_diff import corpus  # same corpus as the tree oracle


def main():
    inputs = corpus()
    print(f"{len(inputs)} corpus cases")
    payload = "\n".join(
        base64.b64encode(c.encode()).decode() for c in inputs) + "\n"

    with tempfile.NamedTemporaryFile("w", suffix=".b64", delete=False) as f:
        f.write(payload)
        path = f.name

    ref = subprocess.run(
        ["node", "scripts/conformance/ref_token_dump.mjs"],
        input=payload, capture_output=True, text=True, check=True).stdout
    ours = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.TokenDiffDump {path}"],
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
        rt = base64.b64decode(r).decode()
        ot = base64.b64decode(o).decode()
        if rt != ot:
            mismatches += 1
            if mismatches <= 8:
                print(f"--- MISMATCH case {i}: {inputs[i]!r}")
                print("ref:  " + rt.replace("\n", "\nref:  "))
                print("ours: " + ot.replace("\n", "\nours: "))
    print(f"{mismatches} mismatches / {len(inputs)} cases")
    os.unlink(path)
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

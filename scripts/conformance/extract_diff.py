#!/usr/bin/env python3
"""Differential EXTRACTION oracle: run the reference's real public API
(type-stripped to plain JS by ts_strip.py, executed by node via
ref_extract_dump.mjs) and our Scala engine (graft.tools.ExtractDiffDump)
over a deterministic extraction-focused corpus, and compare every public
extraction surface structurally: visibleText under each option toggle,
visibleTextTokens, provenance tokens, textContent, outline and chunk.

This is the second-opinion oracle for the layer the parse5-only tree diff
cannot reach (reference src/public/mod.ts:1035-1500, :1616-1782).

Usage: python3 scripts/conformance/ts_strip.py   # once, builds /tmp/refjs
       python3 scripts/conformance/extract_diff.py
Run from the repo root. Requires `sbt -batch compile` beforehand.
Env: EXTRACT_DIFF_SEED=0x... varies the fuzz half of the corpus.
"""
import base64
import json
import os
import random
import subprocess
import sys
import tempfile


def corpus():
    cases = [
        # whitespace normalization + breaks
        "<p>a  b\tc\nd</p><p>e</p>",
        "<div>one<br>two<br><br>three</div>",
        "<p>lead</p>   <p>trail</p>",
        "a<b> b</b> c<i>d </i>e",
        "<span> x </span><span>y</span> <span> z</span>",
        # pre / textarea preservation (incl. nesting + inheritance)
        "<pre>  keep\n\tthis  </pre><p>collapse  this</p>",
        "<div><pre>a  b<span>c  d</span></pre></div>",
        "<pre><code>line1\nline2</code></pre>tail",
        "<textarea>  raw\ntext  </textarea>after",
        "<table><tr><td><textarea>a  b</textarea><td>c  d</table>",
        "<pre>outer<div>block  in  pre</div>tail</pre>",
        # hidden subtrees
        "<p>vis</p><div hidden>gone</div><p>vis2</p>",
        "<div hidden=false>still hidden (boolean attr)</div>x",
        "<div hidden=''>hidden empty</div>y",
        "<div style='display:none'>dn</div><div style='DISPLAY: NONE'>dn2</div>z",
        "<div style='display :none;color:red'>dn3</div>w",
        "<div style='visibility:hidden'>vh</div><div style='visibility: hidden ;'>vh2</div>v",
        "<div aria-hidden=true>ah</div><div aria-hidden=TRUE>ah2</div>u",
        "<div aria-hidden=false>shown</div><div aria-hidden=1>shown2</div>t",
        "<div aria-hidden>shown3</div><div aria-hidden=''>shown4</div>s",
        "<p>a<span hidden>b<b>c</b></span>d</p>",
        "<head><style>css</style><script>js</script><title>t</title></head><body>b",
        "<template><p>templated</p></template>after-template",
        # control values
        "<img alt='pic one'><img alt=''><img>",
        "<input value='typed'><input type=hidden value=h><input type=password value=p>",
        "<input type=submit value=Go><input type=button>",
        "<button>press <b>me</b></button>",
        "<select><option>one</option><option selected>two</option></select>",
        # accessible-name fallback
        "<div aria-label='label-a'></div><div aria-label='label-b'>content wins</div>",
        "<a href=x title='tip'></a><a href=y title='tip2'>text</a>",
        "<img aria-label=al alt=alt-wins>",
        # noscript
        "<noscript><p>no js</p></noscript>after",
        "<head><noscript><meta charset=x><p>head-noscript</p></noscript></head>body",
        "<noscript><noscript>nested</noscript></noscript>t",
        # tables: tabs between cells, newlines between rows, nesting
        "<table><tr><td>a<td>b<tr><td>c<td>d</table>",
        "<table><tr><th>h1<th>h2<tr><td>v1<td>v2</table>",
        "<table><tr><td><table><tr><td>inner</table><td>outer2</table>",
        "<table><caption>cap</caption><tr><td>c1</table>",
        "<table><tr><td><p>para in cell</p><td>c2</table>",
        "<table><tr></tr><tr><td></td><td>x</td></tr></table>",
        # paragraph/block breaks + headings (outline)
        "<h1>top</h1><p>p1</p><h2>mid</h2><p>p2</p><h3>deep</h3>",
        "<h1>a<b>b</b></h1><div><h2>nested h</h2></div>",
        "<article><h1>art</h1><section><h2>sec</h2><p>body</p></section></article>",
        # chunking boundaries (big text)
        "<div>" + "word " * 3000 + "</div>",
        "".join(f"<p>para {i} {'x' * 200}</p>" for i in range(60)),
        # entities + unicode
        "<p>&amp; &lt;tag&gt; &nbsp;nb&nbsp;sp &#x2603;&#9731;</p>",
        "<p>&not;in &notin; mid&amptext</p>",
        "<p>a&#0;b</p>",
        # misnesting interplay with extraction
        "<p><b>one<i>two</b>three</i>four</p>",
        "<table>foster<tr><td>cell</table>",
        "<a>1<div>2<a>3</a></div></a>",
        "<ul><li>i1<li>i2<ol><li>j1</ul>",
        # rawtext / rcdata
        "<title>ti<b>tle</title><p>after</p>",
        "<style>p{}</style><xmp>literal <b>x</b></xmp>tail",
        "<script>var x='<p>no</p>';</script>visible",
        "<iframe><p>hidden-ish</p></iframe>shown",
        "<plaintext>rest <b>of</b> file",
        # svg / math text
        "<svg><text>svg text</text><desc>desc text</desc></svg>tail",
        "<math><mi>x</mi><mo>+</mo><mn>1</mn></math>t",
        "<svg><foreignObject><p>html in svg</p></foreignObject></svg>",
        # definition lists, blockquote, address
        "<dl><dt>term<dd>def<dt>term2<dd>def2</dl>",
        "<blockquote><p>quote</p></blockquote>after",
        # empty and edge documents
        # NB: the empty document "" is excluded — it base64s to a blank
        # line both dumps skip; empty-input behavior is unit-tested instead.
        " ", "\n\t ", "<p></p>", "<div><span></span></div>",
        "just text no tags",
        "<body hidden>whole body hidden</body>",
        # br/hr soup
        "<br><br><br>", "a<hr>b", "<p>a</p><br><p>b</p>",
        # deeply nested inline
        "<b><i><u><s><em><strong>deep</strong></em></s></u></i></b>",
        # chars in a table mode over an open <template>: template is NOT a
        # table-structure tag, so text must NOT enter "in table text"
        # (regression: seed 0xD00D02 found IN_ROW chars over template
        # buffering where parse5 takes the anything-else path)
        "<template><td>c</td>&amp;x</template>tail",
        "<table><template>t<td>c</td>x</template></table>",
    ]
    # EOF truncation sweep over the first, hand-written half
    base = list(cases)
    for tpl in base:
        if len(tpl) > 8:
            cases.append(tpl[: len(tpl) * 2 // 3])

    # structured fuzz: random nesting over extraction-relevant vocabulary
    seed0 = int(os.environ.get("EXTRACT_DIFF_SEED", "0xE17AC7"), 16)
    rng = random.Random(seed0)
    tags = ["div", "p", "span", "b", "i", "a", "ul", "li", "h1", "h2", "h3",
            "table", "tr", "td", "th", "tbody", "caption", "pre", "code",
            "textarea", "button", "select", "option", "noscript", "template",
            "blockquote", "article", "section", "em", "strong", "ruby", "rt",
            "dl", "dt", "dd", "title", "style", "script", "svg", "math",
            "mi", "mtext", "desc", "iframe", "xmp", "form", "label"]
    attrs = [" hidden", " hidden=hidden", " hidden=false", " aria-hidden=true",
             " aria-hidden=false", " aria-hidden=''", " aria-hidden=TRUE",
             " style=display:none", " style='display: none'",
             " style='visibility:hidden'", " style=color:red",
             " aria-label=lbl", " title=tip", " class=c", " id=i", ""]
    voids = ["<br>", "<hr>", "<img alt='va'>", "<img alt=''>", "<img>",
             "<input value=iv>", "<input type=hidden value=hv>",
             "<input type=checkbox>", "<wbr>"]
    texts = ["alpha", "beta  gamma", " lead", "trail ", "a\tb", "x\ny",
             "&amp;", "&nbsp;", "&#x41;", "&notin;", "mixed &lt;case&gt;",
             "  ", "\t\n", "words words words"]
    def rand_case():
        parts = []
        opens = []
        for _ in range(rng.randint(8, 34)):
            r = rng.random()
            if r < 0.34:
                t = rng.choice(tags)
                parts.append(f"<{t}{rng.choice(attrs)}>")
                opens.append(t)
            elif r < 0.52 and opens:
                parts.append(f"</{opens.pop(rng.randrange(len(opens)))}>")
            elif r < 0.60:
                parts.append(f"</{rng.choice(tags)}>")
            elif r < 0.72:
                parts.append(rng.choice(voids))
            else:
                parts.append(rng.choice(texts))
        return "".join(parts)
    for _ in range(int(os.environ.get("EXTRACT_DIFF_FUZZ", "4000"))):
        cases.append(rand_case())

    profile = os.environ.get("EXTRACT_DIFF_PROFILE", "")

    # EXTRACT_DIFF_PROFILE=errors: constructs chosen to exercise every corner
    # of the public parse-error surface — doctype soup, comment soup, attr
    # quote/equals soup, entity families (numeric validation, legacy
    # no-semicolon, absent digits), NUL injection, CDATA in HTML vs foreign,
    # self-closing non-void tags, head/noscript structure errors.
    if profile == "errors":
        rng = random.Random(seed0 ^ 0xE44052)
        frags = [
            "<!DOCTYPE html>", "<!DOCTYPE html >", "<!doctype HTML>",
            "<!DOCTYPE>", "<!DOCTYPE  html PUBLIC 'x'>", "<!DOCTYPEhtml>",
            "<!DOCTYPE html SYSTEM 'about:legacy-compat'>",
            "<!DOCTYPE bogus>", "<!DOCTYPE html PUBLIC>",
            "<!-- ok -->", "<!-->", "<!--->", "<!--x--!>", "<!--x--x-->",
            "<! bogus>", "<?php ?>", "</>", "</ x>", "<![CDATA[y]]>",
            "<b/>", "<div/>", "<br/>", "<img/>", "<svg/>", "<svg><rect/></svg>",
            "<svg><![CDATA[z]]></svg>", "<math><mi/></math>",
            "&#0;", "&#x0;", "&#;", "&#x;", "&#xG;", "&#xD800;", "&#x110000;",
            "&#1;", "&#13;", "&#xFDD0;", "&#xFFFF;", "&#150;", "&#xA0;",
            "&amp", "&ampx", "&amp;", "&notin", "&noti;", "&bogusref;", "&",
            "&#999999999999;",
            "<b a=>", "<b =c>", "<b 'q'=1>", "<b a a=2>", "<b a='x' a='y'>",
            "<b a=\"1\"b=2>", "<b a='1'b>", "</b a=1>", "</b/>",
            "<head><noscript><p>x</p></noscript></head>",
            "<head><noscript><noscript></head>",
            "<head><head>", "<head></head><head>", "<body><head>",
            "<html><head></head><body></body></html><title>t</title>",
            "</body></body>", "</html></html>", "</head></head>",
            "<template></template></template>", "<template><td>",
            "text\x00text", "<b>\x00</b>", "<svg>\x00</svg>", "<title>\x00</title>",
            "<svg>\x00\x00</svg>", "<svg>a\x00\x00b</svg>", "<svg>\x00\x00",
            "<math>\x00\x00<mi>m</mi></math>", "\x00\x00",
            "<textarea>\x00", "<style>\x00</style>", "<!--\x00-->", "<b a\x00=1>",
            "<b a='\x00'>", "<b\x00c=1>", "<!DOCTYPE ht\x00ml>",
            "x<3", "x<=", "a<>b", "<p", "</p", "<p a", "<p a='x",
        ]
        texts2 = ["t", " ", "<p>p</p>", "<table><td>c</table>", ""]
        def errors_case():
            parts = []
            for _ in range(rng.randint(2, 10)):
                parts.append(rng.choice(frags) if rng.random() < 0.7
                             else rng.choice(texts2))
            return "".join(parts) or "x"
        for _ in range(3000):
            cases.append(errors_case())

    # EXTRACT_DIFF_PROFILE=unicode: exotic whitespace and format characters
    # woven through text, entities, pre blocks and element edges — hunts
    # divergences in the normalization passes' character classes (segment
    # collapse, output collapse, JS-trim) and in provenance merging.
    if profile == "unicode":
        rng = random.Random(seed0 ^ 0x00A0FEFF)
        ws = ["\u00a0", "\u1680", "\u2000", "\u2003", "\u2009", "\u200a",
              "\u2028", "\u2029", "\u202f", "\u205f", "\u3000", "\ufeff",
              "\u200b", "\u200e", "\u2060", "\x0b", "\x1c", "\x1f", "\x7f",
              "&nbsp;", "&#x2028;", "&#xfeff;", "&#x200b;", "&NonBreakingSpace;",
              "&ThinSpace;", "&ZeroWidthSpace;", "&#x3000;"]
        words = ["aleph", "bet", "été", "你好", "x"]
        wraps = ["p", "div", "span", "b", "pre", "textarea", "td", "li", "h2"]
        def unicode_case():
            parts = []
            for _ in range(rng.randint(4, 18)):
                r = rng.random()
                if r < 0.45:
                    parts.append(rng.choice(ws))
                elif r < 0.7:
                    parts.append(rng.choice(words))
                else:
                    t = rng.choice(wraps)
                    inner = "".join(rng.choice(ws + words)
                                    for _ in range(rng.randint(1, 5)))
                    parts.append(f"<{t}>{inner}</{t}>")
            return "".join(parts)
        for _ in range(3000):
            cases.append(unicode_case())

    # EXTRACT_DIFF_PROFILE=hidden: adversarial hidden/aria-hidden/style
    # values — whitespace-padded and cased truthiness strings, style
    # declarations with comments/spacing/uppercase, nested visibility flips.
    if profile == "hidden":
        rng = random.Random(seed0 ^ 0x41D0E5)
        hid = [" hidden", " hidden=''", " hidden=false", " hidden=FALSE",
               " hidden=no", " hidden=0", " hidden=' '", " hidden=until-found",
               " aria-hidden=true", " aria-hidden=' true '", " aria-hidden=TRUE",
               " aria-hidden=1", " aria-hidden='1 '", " aria-hidden=yes",
               " aria-hidden=0", " aria-hidden=false", " aria-hidden=''",
               " aria-hidden='\ttrue\n'", " aria-hidden",
               " aria-hidden='\u00a0true\u00a0'", " aria-hidden='\u00a01\u00a0'",
               " aria-hidden='\u2028true'", " aria-hidden='\ufefffalse'",
               " hidden='\u00a0'",
               " style=display:none", " style='display:none;'",
               " style='display : none'", " style='DISPLAY:NONE'",
               " style='display:\tnone'", " style='color:red;display:none'",
               " style='display:inline'", " style='visibility:hidden'",
               " style='visibility: hidden'", " style='visibility:visible'",
               " style='content-visibility:hidden'",
               " style='content-visibility: hidden ;'",
               " style='--display:none'", " style='xdisplay:none'",
               " style='display:\u00a0none'", " style='\u2028display:none'",
               " style='visibility:\u00a0\u00a0hidden'",
               " style", " style=''", ""]
        tags2 = ["div", "span", "p", "b", "li", "td", "section", "em"]
        def hidden_case():
            parts = []
            depth = 0
            for _ in range(rng.randint(6, 24)):
                r = rng.random()
                if r < 0.45:
                    t = rng.choice(tags2)
                    parts.append(f"<{t}{rng.choice(hid)}>")
                    depth += 1
                elif r < 0.65 and depth > 0:
                    parts.append(f"</{rng.choice(tags2)}>")
                    depth -= 1
                else:
                    parts.append(rng.choice(["vis", "ible", " text ", "&amp;"]))
            return "".join(parts)
        for _ in range(3000):
            cases.append(hidden_case())

    # EXTRACT_DIFF_PROFILE=controls: img/input/button/select permutations —
    # alt/value/aria-label/title present, empty, whitespace-only; input
    # types cased and padded; accname fallback interplay.
    if profile == "controls":
        rng = random.Random(seed0 ^ 0xC0117301)
        ctl = []
        for alt in ["alt=pic", "alt=''", "alt='  '", "ALT=up", "alt='a  b'", ""]:
            for extra in ["", " aria-label=al", " title=ti"]:
                ctl.append(f"<img {alt}{extra}>")
        for ty in ["", "type=text", "type=hidden", "type=HIDDEN", "type=' hidden'",
                   "type='\u00a0hidden'", "type='hidden\u00a0'",
                   "type=submit", "type=SUBMIT", "type=button", "type=reset",
                   "type=checkbox", "type=password", "type=unknown"]:
            for v in ["", "value=v", "value=''", "value='  '", "value='a b'"]:
                for extra in ["", " aria-label=lbl", " aria-label=''",
                              " aria-label='  '", " aria-label='\u00a0'",
                              " aria-label='\u00a0lbl\u00a0'", " title=tip"]:
                    ctl.append(f"<input {ty} {v}{extra}>")
        ctl += ["<button>press</button>", "<button value=bv></button>",
                "<button><img alt=inner></button>", "<button>  </button>",
                "<select><option>o1<option value=x>o2</select>",
                "<select multiple><option selected>s</select>",
                "<textarea>ta  content</textarea>", "<textarea></textarea>",
                "<a title=only-title></a>", "<a title=''>t</a>",
                "<a aria-label=only-label></a>", "<label for=x></label>"]
        def controls_case():
            parts = []
            for _ in range(rng.randint(3, 12)):
                r = rng.random()
                if r < 0.6:
                    parts.append(rng.choice(ctl))
                else:
                    parts.append(rng.choice(["t1 ", " t2", "<p>para</p>",
                                             "<div>block</div>", "&nbsp;"]))
            return "".join(parts)
        for _ in range(3000):
            cases.append(controls_case())

    # EXTRACT_DIFF_PROFILE=prewrap: whitespace-preservation flow — pre /
    # textarea nesting with blocks, tables and breaks inside, CRLF/FF/tab
    # soup, leading-newline-after-<pre> handling, xmp/listing/plaintext.
    if profile == "prewrap":
        rng = random.Random(seed0 ^ 0x9E3EA7)
        openers = ["<pre>", "<pre>\n", "<pre>\r\n", "<textarea>", "<textarea>\n",
                   "<listing>", "<xmp>", "<pre><code>", "<td><pre>"]
        fillers = ["  a  b  ", "\t\t", "\n\n\n", "x\r\ny", "\f\f", "   ",
                   "line1\nline2", "&#9;tab-ent", "&#10;nl-ent", "w",
                   "<div>block-in-pre</div>", "<br>", "<span>  s  </span>",
                   "<table><tr><td>t1<td>t2</table>", "<p>p-in-pre</p>"]
        closers = ["</pre>", "</textarea>", "</listing>", "</xmp>",
                   "</code></pre>", "</pre></td>", ""]
        def prewrap_case():
            parts = []
            for _ in range(rng.randint(2, 8)):
                parts.append(rng.choice(openers))
                for _ in range(rng.randint(1, 5)):
                    parts.append(rng.choice(fillers))
                parts.append(rng.choice(closers))
                parts.append(rng.choice(["tail  sp", " ", "<p>between</p>", ""]))
            return "".join(parts)
        for _ in range(3000):
            cases.append(prewrap_case())

    return cases


FIELDS = ["vt_default", "vt_keep_hidden", "vt_no_controls", "vt_accname",
          "vt_no_trim", "tokens", "prov", "text_content", "outline", "chunks",
          "chunks_small", "serialize", "frags", "spans", "errors",
          "frag_spans", "frag_errors", "transitions", "patch", "budget_probe", "tok_facade"]


def main():
    inputs = corpus()
    print(f"{len(inputs)} corpus cases")
    payload = "\n".join(
        base64.b64encode(c.encode()).decode() for c in inputs) + "\n"

    with tempfile.NamedTemporaryFile("w", suffix=".b64", delete=False) as f:
        f.write(payload)
        path = f.name

    ref = subprocess.run(
        ["node", "scripts/conformance/ref_extract_dump.mjs"],
        input=payload, capture_output=True, text=True, check=True).stdout
    ours = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.ExtractDiffDump {path}"],
        capture_output=True, text=True, check=True).stdout
    our_lines = [l.replace("[info] ", "").strip() for l in ours.splitlines()
                 if l.startswith("[info] ") and
                 all(ch.isalnum() or ch in "+/=" for ch in l.replace("[info] ", "").strip())
                 and len(l.replace("[info] ", "").strip()) > 0]
    ref_lines = [l.strip() for l in ref.splitlines() if l.strip()]
    our_lines = our_lines[-len(inputs):]
    assert len(ref_lines) == len(inputs), (len(ref_lines), len(inputs))
    assert len(our_lines) == len(inputs), (len(our_lines), len(inputs))

    only = [f for f in os.environ.get("EXTRACT_DIFF_ONLY", "").split(",") if f]
    mismatches = 0
    by_field = {}
    for i, (r, o) in enumerate(zip(ref_lines, our_lines)):
        rj = json.loads(base64.b64decode(r).decode())
        oj = json.loads(base64.b64decode(o).decode())
        if only:
            rj = {k: rj.get(k) for k in only}
            oj = {k: oj.get(k) for k in only}
        if rj == oj:
            continue
        mismatches += 1
        for k in FIELDS + ["error"]:
            if rj.get(k) != oj.get(k):
                by_field[k] = by_field.get(k, 0) + 1
        if mismatches <= 40:
            print(f"--- MISMATCH case {i}: {inputs[i][:300]!r}")
            for k in FIELDS + ["error"]:
                rv, ov = rj.get(k), oj.get(k)
                if rv != ov:
                    print(f"  field {k}:")
                    print(f"    ref:  {json.dumps(rv)[:500]}")
                    print(f"    ours: {json.dumps(ov)[:500]}")
    print(f"{mismatches} mismatches / {len(inputs)} cases")
    if by_field:
        print("per-field:", json.dumps(by_field, sort_keys=True))
    os.unlink(path)
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()



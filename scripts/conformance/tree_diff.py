#!/usr/bin/env python3
"""Differential tree-construction oracle: parse a deterministic adversarial
corpus with BOTH the reference's vendored parse5 (node, plain JS) and our
Scala engine, compare html5lib-normalized trees line by line.

Usage: python3 scripts/conformance/tree_diff.py [--corpus-only]
Run from the repo root. Requires `sbt -batch compile` beforehand.
"""
import base64
import itertools
import subprocess
import sys
import tempfile
import os

WORDS = ["alpha", "beta", "gamma"]


def corpus():
    cases = []
    t = "payload"
    base_templates = [
        # misnesting / adoption agency
        "<p><b>one<i>two</b>three</i>four</p>",
        "<b><p>x</b>y</p>",
        "<a href=1>x<div>y<a href=2>z</a></div></a>",
        "<b><b><b>deep<i>mix</b></b>tail</i></b>",
        "<em><p>a</em>b</p>",
        # tables / foster parenting
        "<table>text<tr><td>cell</td></tr></table>",
        "<table><div>foster</div><tbody><tr><td>a</table>",
        "<table><caption>c</caption><colgroup><col><tr><td>x</table>",
        "<table><tr><td><table><tr><td>nested</table></table>",
        "<table><tbody><tr><th>h<td>d</table>",
        # lists / implied ends
        "<ul><li>a<li>b<ol><li>c</ul>",
        "<dl><dt>t<dd>d<dt>t2</dl>",
        # headings / paragraphs
        "<h1>a<h2>b</h1>c</h2>",
        "<p>a<p>b<div>c<p>d</div>",
        # formatting reconstruction
        "<p><b>x</p><p>still bold</p>",
        "<nobr>a<nobr>b</nobr>c",
        # foreign content
        "<svg><g><circle r=1 /></g><foreignObject><p>html</p></foreignObject></svg>",
        "<math><mi>x</mi><annotation-xml encoding='text/html'><p>y</p></annotation-xml></math>",
        "<svg><desc><b>bold</b></desc><text>t</text></svg>",
        "<p><svg><tspan>a</tspan></svg>b</p>",
        "<svg><script>s</script></svg>after",
        "<math><mtext><b>html-in-math</b></mtext></math>",
        # head / body structure
        "<head><meta charset=x><title>t</title></head><body>b",
        "<html lang=en><body class=c>x",
        "x<head>y</head>z",
        # comments / doctype / cdata / bogus
        "<!doctype html><!-- c --><p>x</p><!-- tail -->",
        "<!DOCTYPE html PUBLIC \"-//W3C//DTD HTML 4.01//EN\"><p>q</p>",
        "<?php bogus ?><p>x</p>",
        "<!-->empty<p>x</p>",
        "<![CDATA[not cdata in html]]><p>x</p>",
        "<svg><![CDATA[real cdata]]></svg>",
        # rawtext / rcdata / script escapes
        "<title>a<b>not-tag</b></title><p>x</p>",
        "<textarea><p>literal</p></textarea>",
        "<style>p { color: red }</style><p>x</p>",
        "<script><!-- <script>inner</script> --></script><p>after</p>",
        "<xmp><b>x</b></xmp>",
        "<iframe><p>t</p></iframe>",
        # entities
        "<p>&amp; &notin; &not;in &#150; &#x41; &amp &fake;</p>",
        "<p title='&quot;q&quot;'>attr &ampersand</p>",
        # frameset
        "<frameset><frame src=a><frameset rows=1><frame></frameset></frameset><noframes>nf</noframes>",
        # template (content is opaque in both normalizers; structure still checked)
        "<div><template><tr><td>t</td></tr></template></div>",
        # button / form / fieldset
        "<form><button>a<button>b</form>",
        "<form><form><input type=hidden name=x></form>",
        # void / self-closing
        "<br/><img src=a alt=b><hr><input value='v'/>",
        "<p>a<br>b</p>",
        # attributes edge cases
        "<div a=1 a=2 b = 'x' c=\"y\" d>t</div>",
        "<div =bogus>x</div>",
        "<div a"
    ]
    for tpl in base_templates:
        cases.append(tpl)
        # EOF-truncation sweep: every prefix length at thirds
        for frac in (3, 2):
            cases.append(tpl[: len(tpl) // frac])
    # doctype quirks variants
    for d in ["", "<!doctype html>",
              "<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 3.2 Final//EN\">"]:
        cases.append(d + "<table>q<td>x</td></table>")

    # seeded structured fuzz: random (mis)nesting over a vocabulary heavy in
    # special elements, with unclosed/stray tags and entity fragments
    import random
    seed0 = int(os.environ.get('TREE_DIFF_SEED', '0xC0FFEE42'), 16)
    rng = random.Random(seed0)  # second half below reseeds
    tags = ["div", "p", "b", "i", "a", "span", "table", "tr", "td", "th",
            "tbody", "ul", "li", "h1", "h3", "em", "nobr", "button", "form",
            "svg", "math", "mi", "title", "textarea", "pre", "code", "dd",
            "dt", "caption", "colgroup", "col", "br", "img", "template",
            "select", "option", "optgroup", "ruby", "rt", "rp", "frameset",
            "noscript", "object", "marquee", "applet", "foreignObject",
            "mtext", "desc", "style", "script", "head", "body", "html"]
    frags = ["&amp;", "&notin", "&#65;", "&#x2603;", "<!-- c -->", "x y", "z",
             "&#0;", "&#xD800;", "<![CDATA[d]]>", "<?pi?>", "<!doctype html>"]
    def rand_case():
        parts = []
        opens = []
        for _ in range(rng.randint(6, 28)):
            r = rng.random()
            if r < 0.42:
                t = rng.choice(tags)
                attrs = ""
                if rng.random() < 0.3:
                    attrs = f" {rng.choice(['a', 'class', 'id', 'hidden'])}={rng.randint(0, 9)}"
                parts.append(f"<{t}{attrs}>")
                opens.append(t)
            elif r < 0.68 and opens:
                # close a RANDOM open tag (often misnested)
                parts.append(f"</{opens.pop(rng.randrange(len(opens)))}>")
            elif r < 0.8:
                parts.append(f"</{rng.choice(tags)}>")  # stray close
            else:
                parts.append(rng.choice(frags))
        return "".join(parts)
    for _ in range(3000):
        cases.append(rand_case())
    rng = random.Random(seed0 ^ 0x9E3779B9)
    for _ in range(3000):
        cases.append(rand_case())

    # TREE_DIFF_PROFILE=wild appends a gnarlier generation: mixed-case tag
    # and attribute names (exercises the interner fallback paths
    # differentially), CR/CRLF injection, NULs inside names/attrs/text,
    # duplicate attributes, quote soup, and longer documents.
    if os.environ.get('TREE_DIFF_PROFILE') == 'wild':
        rng = random.Random(seed0 ^ 0x5DEECE66D)
        def wild_name(base):
            # randomly uppercase some letters
            return "".join(
                ch.upper() if ch.isalpha() and rng.random() < 0.4 else ch
                for ch in base)
        attr_vals = ["1", "x y", "", "a&amp;b", "a\tb", "<braces>", "it's",
                     'say "hi"', "a\rb", "a\r\nb"]
        def wild_case():
            parts = []
            for _ in range(rng.randint(10, 40)):
                r = rng.random()
                if r < 0.40:
                    t = wild_name(rng.choice(tags))
                    attrs = []
                    for _ in range(rng.randint(0, 4)):
                        an = wild_name(rng.choice(
                            ["a", "class", "id", "hidden", "data-x", "style", "a"]))
                        if rng.random() < 0.3:
                            attrs.append(f" {an}")
                        else:
                            v = rng.choice(attr_vals)
                            q = rng.choice(['"', "'", ""])
                            if q == "" and (" " in v or "\t" in v or '"' in v
                                            or "'" in v or v == ""):
                                q = '"'
                            if q == '"' and '"' in v:
                                q = "'"
                            attrs.append(f" {an}={q}{v}{q}")
                    parts.append(f"<{t}{''.join(attrs)}>")
                elif r < 0.62:
                    parts.append(f"</{wild_name(rng.choice(tags))}>")
                elif r < 0.72:
                    parts.append(rng.choice(frags))
                elif r < 0.80:
                    parts.append(rng.choice(["\r", "\r\n", "\x00", "a\x00b",
                                             "<\x00", "</\x00", "< x", "</ x"]))
                elif r < 0.90:
                    # half-open constructs
                    parts.append(rng.choice(
                        ["<div", "<div a", "<div a=", "<div a='x", "<div a=\"x",
                         "</div", "<!-", "<!--", "<![CDATA[", "<!doctype"]))
                else:
                    parts.append(rng.choice(["plain words here", "&#x41;&#66;",
                                             "mid&notit;text", "t\r\nnext"]))
            return "".join(parts)
        for _ in range(3000):
            cases.append(wild_case())

    # TREE_DIFF_PROFILE=foreign: SVG/MathML soup — integration points (HTML
    # and MathML-text), breakout tags, <font> with/without color/face/size,
    # adjusted tag/attr names in mixed case, self-closing foreign elements,
    # templates inside foreign content, CDATA, NULs, and </rt>-style strays.
    if os.environ.get('TREE_DIFF_PROFILE') == 'foreign':
        rng = random.Random(seed0 ^ 0x1F83D9AB)
        f_opens = ["<svg>", "<math>", "<svg><g>", "<math><mrow>",
                   "<foreignObject>", "<foreignobject>", "<FOREIGNOBJECT>",
                   "<desc>", "<title>", "<annotation-xml>",
                   "<annotation-xml encoding='text/html'>",
                   "<annotation-xml encoding='application/xhtml+xml'>",
                   "<annotation-xml encoding='TEXT/HTML'>",
                   "<annotation-xml encoding='text/plain'>",
                   "<mi>", "<mo>", "<mn>", "<ms>", "<mtext>",
                   "<template>", "<table>", "<tr>", "<td>", "<caption>",
                   "<select>", "<option>", "<ruby>", "<rt>", "<rp>",
                   "<textPath>", "<textpath>", "<clipPath>", "<lineargradient>",
                   "<altGlyph>", "<glyphref>", "<animateMotion>"]
        f_closes = ["</svg>", "</math>", "</g>", "</mrow>", "</foreignObject>",
                    "</desc>", "</title>", "</annotation-xml>", "</mi>",
                    "</mtext>", "</template>", "</table>", "</tr>", "</td>",
                    "</select>", "</rt>", "</rp>", "</ruby>", "</option>",
                    "</p>", "</body>", "</html>", "</caption>"]
        f_break = ["<b>", "<div>", "<p>", "<table>", "<img>", "<br>", "<hr>",
                   "<h1>", "<li>", "<meta>", "<pre>", "<sub>", "<nobr>",
                   "<font color=red>", "<font face=arial>", "<font size=3>",
                   "<font a=b>", "<font>", "<FONT COLOR=x>", "<embed>",
                   "<span>", "<code>", "<center>", "<listing>", "<strike>"]
        f_self = ["<circle/>", "<g/>", "<path d='M0 0'/>", "<mi/>",
                  "<foreignObject/>", "<rect width=1 height=1/>",
                  "<use xlink:href='#a'/>", "<template/>", "<svg/>", "<math/>"]
        f_text = ["x", "a b", "&amp;", "&notin;", "&#0;", "\x00", "a\x00b",
                  "<![CDATA[cd]]>", "<![CDATA[cd", "<!-- c -->", "&#x41;",
                  "<?pi?>"]
        f_attr = [" xlink:href='u'", " xml:lang=en", " xmlns='s'",
                  " xmlns:xlink='x'", " XLINK:HREF='u'", " definitionURL=d",
                  " viewBox='0 0 1 1'", " viewbox='0 0 1 1'", ""]
        def foreign_case():
            parts = []
            for _ in range(rng.randint(6, 26)):
                r = rng.random()
                if r < 0.34:
                    o = rng.choice(f_opens)
                    if o.endswith(">") and rng.random() < 0.25 and "=" not in o:
                        o = o[:-1] + rng.choice(f_attr) + ">"
                    parts.append(o)
                elif r < 0.56:
                    parts.append(rng.choice(f_closes))
                elif r < 0.70:
                    parts.append(rng.choice(f_break))
                elif r < 0.80:
                    parts.append(rng.choice(f_self))
                else:
                    parts.append(rng.choice(f_text))
            case = "".join(parts)
            if rng.random() < 0.3:
                case = case[: rng.randint(1, len(case))]
            return case
        for _ in range(3000):
            cases.append(foreign_case())

    # TREE_DIFF_PROFILE=decl: markup-declaration and rawtext-escape soup —
    # comment terminators (--!>, <!-->, <!--->), doctype public/system id
    # variants and bogus doctypes, CDATA endings, script double-escape
    # state machine, RCDATA/rawtext end-tag near-misses.
    if os.environ.get('TREE_DIFF_PROFILE') == 'decl':
        rng = random.Random(seed0 ^ 0x2545F491)
        decl_bits = [
            "<!-- c -->", "<!-->", "<!--->", "<!-- c --!>", "<!-- c --!",
            "<!-- a -- b -->", "<!-- <!-- -->", "<!--<",  "<!--<!",
            "<!-- c ->", "<!---->", "<!a>", "<![CDATA[x]]>", "<![CDATA[x]>",
            "<![CDATA[x]", "<![cdata[x]]>", "<!doctype html>",
            "<!DOCTYPE html PUBLIC 'a' 'b'>", "<!DOCTYPE html SYSTEM 'sys'>",
            "<!DOCTYPE html PUBLIC>", "<!DOCTYPE html PUBLIC 'unterminated",
            "<!doctype html x y>", "<!doctype>", "<!DOCTYPE  html  >",
            "<!DOCTYPE html SYSTEM \"s\" junk>",
            "<?pi data?>", "</>", "<//>", "</ >",
        ]
        raw_bits = [
            "<script>a<b</script>", "<script><!--x--></script>",
            "<script><!--<script>y</script>--></script>",
            "<script><!--<script>y--></script>z</script>",
            "<script><!--<script></scr</script>ipt>--></script>",
            "<style>a{<}</style>", "<title>a</titl></title>",
            "<textarea></textare></textarea>", "<xmp><b></xm</xmp>",
            "<script></scrIPT >", "<script></script x>", "<script></script/>",
            "<title>&amp;</title>", "<noframes>x</noframes>",
            "<iframe>y</iframe>", "<noscript><p>n</noscript>",
            "<plaintext>rest", "<script><!--</script>-->after",
        ]
        body_bits = ["<p>t</p>", "x y", "<div>", "</div>", "<table><td>c</table>"]
        def decl_case():
            parts = []
            for _ in range(rng.randint(4, 14)):
                r = rng.random()
                if r < 0.45:
                    parts.append(rng.choice(decl_bits))
                elif r < 0.8:
                    parts.append(rng.choice(raw_bits))
                else:
                    parts.append(rng.choice(body_bits))
            case = "".join(parts)
            # EOF-truncation arm: half the cases get chopped mid-construct
            if rng.random() < 0.5:
                case = case[: rng.randint(1, len(case))]
            return case
        for _ in range(3000):
            cases.append(decl_case())

    # TREE_DIFF_PROFILE=tables: table-algorithm storm — nested tables,
    # caption/colgroup/col placement, the form-element-pointer special case,
    # the <input type=hidden> in-table exception (exact-match, so a trailing
    # space or different value DOES foster-parent), pending-table-character
    # runs (whitespace-only stays, anything else fosters), formatting
    # elements open across table boundaries (foster + AFE interplay),
    # select-in-table, template-in-table, stray section/row end tags, and an
    # EOF-truncation arm for the in-table end-location walks.
    if os.environ.get('TREE_DIFF_PROFILE') == 'tables':
        rng = random.Random(seed0 ^ 0x71AB1E5)
        t_open = ["<table>", "<table><tbody>", "<table><tr>", "<TABLE>",
                  "<table><caption>", "<table><colgroup>", "<div><table>",
                  "<form><table>", "<b><table>", "<i><nobr><table>",
                  "<table><template>", "<select><table>", "<table><select>",
                  "<td><table>", "<table><tr><td><table>"]
        t_bits = ["<td>x", "<th>y", "<tr>", "</tr>", "</td>", "</th>",
                  "<tbody>", "</tbody>", "<tfoot>", "<thead>", "<TBODY>",
                  "<caption>c</caption>", "<caption>", "</caption>",
                  "<colgroup><col>", "<col>", "<col span=2>", "</colgroup>",
                  "<form>", "<form a=1>", "</form>", "<form><input>",
                  "<input type=hidden>", "<input TYPE=HIDDEN>",
                  "<input type='hidden '>", "<input type=hiddenx>",
                  "<input>", "<input type=text>",
                  "<style>s{}</style>", "<script>t</script>",
                  "<template><tr><td>u</td></tr></template>",
                  "loose", "a b", "   ", " \t\n", "&#65;", "&nbsp;x",
                  "<b>f</b>", "<b>", "</b>", "<a href=1>l</a>",
                  "<table>", "</table>", "<svg><desc>d</desc></svg>",
                  "<math><mi>m</mi></math>", "<div>fostered</div>",
                  "<p>pp", "<li>item", "<button>bt</button>",
                  "<tr hidden=false>", "<td colspan=2>"]
        def tables_case():
            parts = [rng.choice(t_open)]
            for _ in range(rng.randint(4, 18)):
                parts.append(rng.choice(t_bits))
            if rng.random() < 0.6:
                parts.append(rng.choice(["</table>", "</table></table>",
                                         "</form></table>", ""]))
            case = "".join(parts)
            if rng.random() < 0.4:  # EOF mid-table arm
                case = case[: rng.randint(1, len(case))]
            return case
        for _ in range(3000):
            cases.append(tables_case())

    # TREE_DIFF_PROFILE=headframes: document-boundary storm — the before-
    # html / before-head / in-head / in-head-noscript / after-head modes,
    # head metadata elements, <body>/<html> attribute MERGING on repeated
    # tags, the frameset-ok flag (whitespace keeps it, text/br/most starts
    # clear it), frameset replacing body, <noframes> rawtext, frame rows,
    # after-body / after-after-body re-entry, and EOF truncation.
    if os.environ.get('TREE_DIFF_PROFILE') == 'headframes':
        rng = random.Random(seed0 ^ 0x6A09E667)
        hf_prologue = ["", "", "<!doctype html>", "<!DOCTYPE HTML>",
                       "<!-- lead -->", "   \n\t", "early text",
                       "<!doctype html><!-- c -->", "</head>", "</body>",
                       "</html>", "</br>", "<html a=0>", "<head>"]
        hf_head = ["<meta charset=utf-8>", "<meta>", "<META X=1>",
                   "<base href=u>", "<base>", "<basefont>", "<bgsound>",
                   "<link rel=r>", "<title>t</title>", "<title>unclosed",
                   "<title>a<b>c</title>", "<style>s{}</style>",
                   "<style>open", "<script>j()</script>", "<script>open",
                   "<noscript><link></noscript>", "<noscript><p>n</noscript>",
                   "<noscript>", "</noscript>", "<template><td>tc</template>",
                   "<head>", "</head>", "<object>", " \n", "stray head text"]
        hf_bodyhtml = ["<body a=1>", "<body a=2 b=3>", "<BODY B=9 C=4>",
                       "<body>", "<html c=5>", "<HTML C=6 D=7>", "</body>",
                       "</html>", "<body hidden>"]
        hf_frames = ["<frameset>", "<frameset cols='1,*'>", "<FRAMESET>",
                     "<frame src=x>", "<frame>", "</frameset>",
                     "<noframes>raw <b>kept</noframes>", "<noframes>open",
                     "</frame>", "</noframes>"]
        hf_body = ["   ", " \t\n", "text", "<br>", "<b>f</b>", "<div>d</div>",
                   "<p>p", "<img>", "<input type=hidden>", "<wbr>",
                   "<pre>\nx</pre>", "&#x20;", "&nbsp;", "<table><td>t</table>"]
        hf_tail = ["<!-- after -->", "   ", "late text", "<div>late</div>",
                   "</html>", "</body>", "<!doctype html>", "<b>", "</b>"]
        def headframes_case():
            parts = [rng.choice(hf_prologue)]
            for _ in range(rng.randint(2, 7)):
                parts.append(rng.choice(hf_head))
            for _ in range(rng.randint(0, 3)):
                parts.append(rng.choice(hf_bodyhtml))
            pools = [hf_frames, hf_body, hf_bodyhtml, hf_tail]
            for _ in range(rng.randint(3, 12)):
                parts.append(rng.choice(rng.choice(pools)))
            case = "".join(parts)
            if rng.random() < 0.4:
                case = case[: rng.randint(1, len(case))]
            return case
        for _ in range(3000):
            cases.append(headframes_case())

    # TREE_DIFF_PROFILE=afe: active-formatting-elements storm — deep
    # formatting misnesting driving the adoption agency's 8x3 loops, Noah's
    # ark (needs EXACT tag+attr repeats, so attr variety is deliberately
    # tiny), reconstruction across blocks, <a>-implies-</a>, <nobr> scope,
    # marquee/object/applet/template/td/caption scope barriers, and the
    # foster-parenting + AFE interplay across table boundaries.
    if os.environ.get('TREE_DIFF_PROFILE') == 'afe':
        rng = random.Random(seed0 ^ 0xBB67AE85)
        fmt = ["a", "b", "i", "em", "strong", "small", "s", "strike", "tt",
               "u", "code", "font", "nobr"]
        barrier_open = ["<marquee>", "<object>", "<applet>", "<template>",
                        "<button>", "<div>", "<p>", "<address>", "<li>",
                        "<table>", "<table><td>", "<caption>", "<h2>",
                        "<span>"]
        barrier_close = ["</marquee>", "</object>", "</applet>",
                         "</template>", "</button>", "</div>", "</p>",
                         "</address>", "</li>", "</table>", "</td>",
                         "</caption>", "</h2>", "</span>"]
        def afe_case():
            parts = []
            for _ in range(rng.randint(8, 34)):
                r = rng.random()
                if r < 0.34:
                    t = rng.choice(fmt)
                    # tiny attr variety so exact duplicates (Noah's ark) occur
                    a = rng.choice(["", "", "", " x=1", " x=2", " id=k"])
                    parts.append(f"<{t}{a}>")
                elif r < 0.42:
                    # burst of identical opens: trips Noah's ark directly
                    t = rng.choice(fmt)
                    a = rng.choice(["", " x=1"])
                    parts.append(f"<{t}{a}>" * rng.randint(3, 6))
                elif r < 0.62:
                    parts.append(f"</{rng.choice(fmt)}>")
                elif r < 0.74:
                    parts.append(rng.choice(barrier_open))
                elif r < 0.84:
                    parts.append(rng.choice(barrier_close))
                elif r < 0.94:
                    parts.append(rng.choice(["x", "y z", " ", "&amp;", "<br>",
                                             "t1", "<img>"]))
                else:
                    parts.append(rng.choice(["<b><i>", "</b></i>", "<a><a>",
                                             "</a></a>", "<nobr><nobr>",
                                             "<table><b><tr>", "</table>"]))
            case = "".join(parts)
            if rng.random() < 0.25:
                case = case[: rng.randint(1, len(case))]
            return case
        for _ in range(3000):
            cases.append(afe_case())

    # TREE_DIFF_PROFILE=select: select/option/optgroup storm — the
    # in-select insertion mode's implied closes, the tags that close a
    # select from INSIDE (input/keygen/textarea/select), <hr> in select,
    # select-in-table (the InSelectInTable td/tr/table interplay driving
    # the reset-insertion-mode sub-walk), script/template inside select,
    # formatting/foreign noise, and stray closers. The select compat patch
    # has had no dedicated generator shape before this.
    if os.environ.get('TREE_DIFF_PROFILE') == 'select':
        rng = random.Random(seed0 ^ 0x3C6EF372)
        sel_atoms = ["<select>", "</select>", "<option>", "</option>",
                     "<optgroup>", "</optgroup>", "<hr>", "<input>",
                     "<keygen>", "<textarea>", "</textarea>",
                     "<select multiple>", "<option selected>",
                     "<optgroup label=g>", "<script></script>",
                     "<template>", "</template>", "<datalist>",
                     "</datalist>", "<button>", "</button>"]
        tbl_atoms = ["<table>", "</table>", "<tr>", "</tr>", "<td>",
                     "</td>", "<caption>", "</caption>", "<tbody>",
                     "</tbody>", "<th>", "<colgroup>", "<col>"]
        def select_case():
            parts = []
            if rng.random() < 0.5:
                parts.append(rng.choice(["<table>", "<table><tr>",
                                         "<table><td>", "<div>", "<form>"]))
            for _ in range(rng.randint(6, 26)):
                r = rng.random()
                if r < 0.55:
                    parts.append(rng.choice(sel_atoms))
                elif r < 0.72:
                    parts.append(rng.choice(tbl_atoms))
                elif r < 0.86:
                    parts.append(rng.choice(["x", "opt text", " ", "&amp;",
                                             "a b", "\tws"]))
                else:
                    parts.append(rng.choice(["<b>", "</b>", "<p>", "</p>",
                                             "<li>", "<svg>", "</svg>",
                                             "<math>", "</math>"]))
            case = "".join(parts)
            if rng.random() < 0.2:
                case = case[: rng.randint(1, len(case))]
            return case
        for _ in range(3000):
            cases.append(select_case())

    # TREE_DIFF_PROFILE=entattr: entity-in-attribute storm — legacy
    # no-semicolon named references and the attribute-suppression rule (a
    # legacy match whose next char is [=a-zA-Z0-9] inside an attribute
    # value must NOT decode: vendored entities decode path), numeric refs
    # with windows-1252 remaps, bare/truncated refs hard against value and
    # tag terminators, across double/single/unquoted values — with the same
    # refs emitted in TEXT as the decode contrast.
    if os.environ.get('TREE_DIFF_PROFILE') == 'entattr':
        rng = random.Random(seed0 ^ 0xA54FF53A)
        refs = ["&amp", "&amp;", "&AMP", "&AMP;", "&not", "&notin",
                "&notin;", "&notindot", "&lt", "&ltx", "&gt", "&gt=",
                "&copy", "&copy1", "&cent", "&para", "&times", "&timesb",
                "&timesb;", "&divide", "&frac12", "&there4", "&#65",
                "&#65;", "&#x41", "&#X41;", "&#151;", "&#151", "&#0;",
                "&#xD800;", "&#x110000;", "&#;", "&#", "&#x", "&", "&&",
                "&a", "&aamp;", "&curren", "&curren;", "&szlig", "&szlig;",
                "&eacute", "&eacutex", "&Eacute"]
        tails = ["", "=", "a", "1", "Z", ";", " ", "-"]
        def entattr_case():
            parts = []
            for _ in range(rng.randint(4, 18)):
                r = rng.random()
                ref = rng.choice(refs) + rng.choice(tails)
                if r < 0.42:
                    q = rng.choice(['"', "'", ""])
                    v = rng.choice(["", "x"]) + ref + \
                        rng.choice(["", "y", rng.choice(refs)])
                    if q == "" and (" " in v or '"' in v or "'" in v
                                    or v == ""):
                        q = '"'
                    if q and q in v:
                        v = v.replace(q, "")
                    an = rng.choice(["href", "title", "data-x", "value",
                                     "alt"])
                    parts.append(f"<a {an}={q}{v}{q}>")
                elif r < 0.60:
                    parts.append(ref)  # same refs in TEXT: decode contrast
                elif r < 0.72:
                    parts.append(rng.choice(["<p>", "</p>", "</a>", "<b>",
                                             "</b>", "x ",
                                             "<div title=&notin>",
                                             "<div title=&notin;x>"]))
                elif r < 0.84:
                    # ref hard against the unquoted value terminator
                    parts.append(f"<i t={rng.choice(refs)}>")
                else:
                    parts.append(
                        f"<u t='{rng.choice(refs)}'" +
                        rng.choice([">", " >", "/>"]))
            case = "".join(parts)
            if rng.random() < 0.15:
                case = case[: rng.randint(1, len(case))]
            return case
        for _ in range(3000):
            cases.append(entattr_case())

    # TREE_DIFF_PROFILE=quirks: document-mode matrix storm — the WHATWG
    # quirky public-id PREFIX list (case-insensitive, prefix-extended),
    # the limited-quirks prefixes, the prefixes whose verdict flips on
    # system-id PRESENCE (HTML 4.01 Frameset/Transitional), the quirky
    # ibm system id, about:legacy-compat, malformed/force-quirks doctypes,
    # and non-html doctype names — each followed by probes where the mode
    # is TREE-VISIBLE (quirks keeps <table> inside an open <p>; standards
    # closes the p first).
    if os.environ.get('TREE_DIFF_PROFILE') == 'quirks':
        rng = random.Random(seed0 ^ 0x510E527F)
        quirky_pub = [
            "+//Silmaril//dtd html Pro v0r11 19970101//",
            "-//AS//DTD HTML 3.0 asWedit + extensions//",
            "-//AdvaSoft Ltd//DTD HTML 3.0 asWedit + extensions//",
            "-//IETF//DTD HTML 2.0 Level 1//", "-//IETF//DTD HTML 2.0//",
            "-//IETF//DTD HTML 3.0//", "-//IETF//DTD HTML Strict//",
            "-//IETF//DTD HTML//", "-//Metrius//DTD Metrius Presentational//",
            "-//Microsoft//DTD Internet Explorer 2.0 HTML//",
            "-//Netscape Comm. Corp.//DTD HTML//",
            "-//O'Reilly and Associates//DTD HTML 2.0//",
            "-//SQ//DTD HTML 2.0 HoTMetaL + extensions//",
            "-//Spyglass//DTD HTML 2.0 Extended//",
            "-//Sun Microsystems Corp.//DTD HotJava HTML//",
            "-//W3C//DTD HTML 3 1995-03-24//", "-//W3C//DTD HTML 3.2 Final//",
            "-//W3C//DTD HTML 3.2//", "-//W3C//DTD HTML 3.2S Draft//",
            "-//W3C//DTD HTML 4.0 Frameset//",
            "-//W3C//DTD HTML 4.0 Transitional//",
            "-//W3C//DTD W3 HTML//", "-//W3O//DTD W3 HTML 3.0//",
            "-//WebTechs//DTD Mozilla HTML 2.0//",
        ]
        exact_pub = ["-//W3O//DTD W3 HTML Strict 3.0//EN//",
                     "-/W3C/DTD HTML 4.0 Transitional/EN", "HTML"]
        limited_pub = ["-//W3C//DTD XHTML 1.0 Frameset//",
                       "-//W3C//DTD XHTML 1.0 Transitional//"]
        dual_pub = ["-//W3C//DTD HTML 4.01 Frameset//",
                    "-//W3C//DTD HTML 4.01 Transitional//"]
        sysids = ["", ' "http://www.w3.org/TR/html4/loose.dtd"',
                  " 'x'", ' "about:legacy-compat"',
                  ' "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd"']
        def mangle(s):
            return "".join(
                ch.upper() if rng.random() < 0.35 else ch.lower()
                if rng.random() < 0.5 else ch for ch in s)
        def mk_doctype():
            r = rng.random()
            if r < 0.10:
                return rng.choice(["", "<!doctype html>", "<!DOCTYPE HTML>",
                                   "<!doctype html SYSTEM 'about:legacy-compat'>",
                                   "<!doctype htm>", "<!doctype xhtml>",
                                   "<!doctype html PUBLIC>", "<!doctype"])
            pub = rng.choice(quirky_pub + exact_pub + limited_pub + dual_pub)
            if rng.random() < 0.5:
                pub = mangle(pub)
            if rng.random() < 0.4 and not pub.endswith(("//", "EN")):
                pub += rng.choice(["EN", "EN//4.0", "xyz"])
            elif rng.random() < 0.3:
                pub += rng.choice(["EN", "junk tail", ""])
            q = rng.choice(['"', "'"])
            if q in pub:
                q = '"' if q == "'" else "'"
            sysid = rng.choice(sysids)
            kw = rng.choice(["PUBLIC", "public", "PuBlIc"])
            name = rng.choice(["html", "HTML", "Html"])
            return f"<!DOCTYPE {name} {kw} {q}{pub}{q}{sysid}>"
        probes = [
            "<p>x<table><td>y</td></table>z",
            "<p><b>f</b><table><tr><td>c</td></tr></table>tail",
            "<p>a<p>b<table></table>",
            "<form><p><table><td><p>inner</table>",
            "<p><table><caption>cap</caption></table>",
            "x<table>loose<td>t</table>",
        ]
        def quirks_case():
            parts = [mk_doctype()]
            if rng.random() < 0.2:
                parts.append("<!-- lead -->")
            parts.append(rng.choice(probes))
            if rng.random() < 0.3:
                parts.append(rng.choice(probes))
            case = "".join(parts)
            if rng.random() < 0.1:
                case = case[: rng.randint(1, len(case))]
            return case
        for _ in range(3000):
            cases.append(quirks_case())
    return cases


def main():
    inputs = corpus()
    print(f"{len(inputs)} corpus cases")
    payload = "\n".join(
        base64.b64encode(c.encode()).decode() for c in inputs) + "\n"

    with tempfile.NamedTemporaryFile("w", suffix=".b64", delete=False) as f:
        f.write(payload)
        path = f.name

    ref = subprocess.run(
        ["node", "scripts/conformance/ref_tree_dump.mjs"],
        input=payload, capture_output=True, text=True, check=True).stdout
    ours = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.TreeDiffDump {path}"],
        capture_output=True, text=True, check=True).stdout
    # sbt prefixes [info]; extract base64 lines between markers
    our_lines = [l.replace("[info] ", "").strip() for l in ours.splitlines()
                 if l.startswith("[info] ") and
                 all(ch.isalnum() or ch in "+/=" for ch in l.replace("[info] ", "").strip())
                 and len(l.replace("[info] ", "").strip()) > 0]
    ref_lines = [l.strip() for l in ref.splitlines() if l.strip()]
    # our_lines may include stray info output; take the last N lines
    our_lines = our_lines[-len(inputs):]
    assert len(ref_lines) == len(inputs), (len(ref_lines), len(inputs))
    assert len(our_lines) == len(inputs), (len(our_lines), len(inputs))

    mismatches = 0
    for i, (r, o) in enumerate(zip(ref_lines, our_lines)):
        rt = base64.b64decode(r).decode()
        ot = base64.b64decode(o).decode()
        if rt != ot:
            mismatches += 1
            print(f"--- MISMATCH case {i}: {inputs[i]!r}")
            print("ref:  " + rt.replace("\n", "\nref:  "))
            print("ours: " + ot.replace("\n", "\nours: "))
    print(f"{mismatches} mismatches / {len(inputs)} cases")
    os.unlink(path)
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Differential fragment-parsing oracle: parse (context, html) pairs with the
reference's fragment machinery (createFragmentContext + vendored parse5
getFragmentParser) and our parseFragment, compare normalized trees.

Usage: python3 scripts/conformance/fragment_diff.py  (repo root, compiled).
"""
import base64
import subprocess
import sys
import tempfile
import os


def corpus():
    contexts = ["div", "td", "tr", "tbody", "table", "select", "option",
                "svg", "math", "mi", "title", "script", "style", "textarea",
                "head", "body", "html", "frameset", "template", "caption",
                "colgroup", "p", "button", "foreignObject", "ul", "dl"]
    snippets = [
        "plain text",
        "<p>a</p><p>b</p>",
        "<td>cell</td><td>two</td>",
        "<tr><td>r</td></tr>",
        "<li>1<li>2",
        "<option>a<option>b",
        "<b>x<i>y</b>z</i>",
        "<table><td>t</table>",
        "<circle r=1/><g><rect/></g>",
        "<mi>m</mi><mrow>r</mrow>",
        "raw </oops> & &amp; text",
        "<!-- c --><div>d</div>",
        "<col span=2>",
        "<caption>cap</caption>x",
        "<frame src=f><frameset></frameset>",
        "<script>if (a<b) x()</script>",
        "a<br>b<img src=x>",
    ]
    cases = []
    for c in contexts:
        for s in snippets:
            cases.append((c, s))

    # seeded fuzz snippets per context (FRAG_DIFF_SEED to sweep fresh seeds)
    import random
    rng = random.Random(int(os.environ.get('FRAG_DIFF_SEED', '0x517CC1B7'), 16))
    tags = ["div", "p", "b", "i", "a", "span", "table", "tr", "td", "ul",
            "li", "svg", "math", "mi", "option", "caption", "col", "dd",
            "template", "br", "img", "g", "text", "mrow"]
    frags = ["&amp;", "&notin", "&#65;", "<!-- c -->", "x y", "</done>"]
    def rand_snippet():
        parts = []
        for _ in range(rng.randint(3, 9)):
            r = rng.random()
            if r < 0.45:
                parts.append(f"<{rng.choice(tags)}>")
            elif r < 0.7:
                parts.append(f"</{rng.choice(tags)}>")
            else:
                parts.append(rng.choice(frags))
        return "".join(parts)
    for _ in range(40):
        s = rand_snippet()
        for c in contexts:
            cases.append((c, s))

    # FRAG_DIFF_PROFILE=wild: mixed-case tags/attrs, CR/CRLF, NULs,
    # half-open constructs inside every fragment context
    if os.environ.get('FRAG_DIFF_PROFILE') == 'wild':
        def wild_name(base):
            return "".join(
                ch.upper() if ch.isalpha() and rng.random() < 0.4 else ch
                for ch in base)
        def wild_snippet():
            parts = []
            for _ in range(rng.randint(4, 12)):
                r = rng.random()
                if r < 0.35:
                    attrs = ""
                    if rng.random() < 0.5:
                        attrs = f" {wild_name('class')}='x y' {wild_name('id')}"
                    parts.append(f"<{wild_name(rng.choice(tags))}{attrs}>")
                elif r < 0.6:
                    parts.append(f"</{wild_name(rng.choice(tags))}>")
                elif r < 0.72:
                    parts.append(rng.choice(frags))
                elif r < 0.84:
                    parts.append(rng.choice(["\r", "\r\n", "\x00", "a\x00b",
                                             "< x", "</ x", "<div a='x"]))
                else:
                    parts.append(rng.choice(["words go here", "t\r\nnext"]))
            return "".join(parts)
        for _ in range(40):
            s = wild_snippet()
            for c in contexts:
                cases.append((c, s))

    # FRAG_DIFF_PROFILE=foreign: foreign-content snippets (integration
    # points, breakout tags, adjusted attrs, self-closing foreign elements,
    # CDATA) inside an EXTENDED context list that covers the MathML-text and
    # HTML integration-point contexts plus rawtext-ish contexts.
    if os.environ.get('FRAG_DIFF_PROFILE') == 'foreign':
        f_contexts = contexts + ["annotation-xml", "desc", "mtext", "ms",
                                 "mo", "mn", "noscript", "optgroup", "rt",
                                 "rp", "ruby", "tfoot", "thead", "g",
                                 "text", "mrow"]
        f_bits = ["<svg>", "</svg>", "<math>", "</math>", "<mi>x</mi>",
                  "<foreignObject><p>h</p></foreignObject>",
                  "<annotation-xml encoding='text/html'><div>d</div></annotation-xml>",
                  "<annotation-xml>plain</annotation-xml>",
                  "<use xlink:href='#a'/>", "<g xml:lang=en>",
                  "<circle/>", "<font color=red>c</font>", "<font a=b>f</font>",
                  "<b>break</b>", "<table><td>t</table>", "<template>t</template>",
                  "<![CDATA[cd]]>", "&#0;", "\x00", "<desc><b>d</b></desc>",
                  "</foreignObject>", "</annotation-xml>", "</mtext>",
                  "<mtext><span>s</span></mtext>", "<p>para", "</rt>x",
                  "<select><option>o", "<textPath xlink:href='#p'>tp</textPath>"]
        def foreign_snippet():
            parts = []
            for _ in range(rng.randint(2, 8)):
                parts.append(rng.choice(f_bits))
            s = "".join(parts)
            if rng.random() < 0.25:
                s = s[: rng.randint(1, len(s))]
            return s
        for _ in range(40):
            s = foreign_snippet()
            for c in f_contexts:
                cases.append((c, s))

    # FRAG_DIFF_PROFILE=tables: table-soup snippets (form pointer, the
    # <input type=hidden> exception, pending-table-character runs, nested
    # tables, caption/colgroup, template rows, formatting across the table)
    # concentrated on the TABLE-FAMILY contexts where the reset-insertion-
    # mode machinery and foster parenting interact with fragment fabrication.
    if os.environ.get('FRAG_DIFF_PROFILE') == 'tables':
        t_contexts = ["td", "th", "tr", "tbody", "tfoot", "thead", "table",
                      "caption", "colgroup", "template", "div", "form",
                      "select", "body"]
        t_bits = ["<td>x", "<th>y</th>", "<tr>", "</tr>", "</td>",
                  "<tbody>", "</tbody>", "<tfoot>", "<thead>",
                  "<caption>c</caption>", "</caption>", "<colgroup><col>",
                  "<col span=2>", "</colgroup>", "<form>", "</form>",
                  "<form><input>", "<input type=hidden>",
                  "<input TYPE=HIDDEN>", "<input type='hidden '>",
                  "<input>", "<style>s{}</style>", "<script>t</script>",
                  "<template><tr><td>u</td></tr></template>",
                  "loose", "   ", " \t\n", "&#65;", "<b>f</b>", "<b>",
                  "<a href=1>l</a>", "<table>", "</table>",
                  "<table><td>n</table>", "<div>fostered</div>",
                  "<tr hidden=false>", "<td colspan=2>", "</tbody>x",
                  "<select><option>o</select>", "<svg><desc>d</desc></svg>"]
        def tables_snippet():
            parts = []
            for _ in range(rng.randint(3, 12)):
                parts.append(rng.choice(t_bits))
            s = "".join(parts)
            if rng.random() < 0.35:
                s = s[: rng.randint(1, len(s))]
            return s
        for _ in range(60):
            s = tables_snippet()
            for c in t_contexts:
                cases.append((c, s))

    # FRAG_DIFF_PROFILE=afe: active-formatting-elements storm in fragment
    # contexts — the context element fabricates the open-element stack, so
    # adoption-agency scope walks, Noah's ark (exact tag+attr repeats), and
    # reconstruction all run against a fabricated root. Formatting-element
    # CONTEXTS (b/a/nobr/font) are included: parse5 does NOT seed the AFE
    # list from the context, which is exactly the behavior to pin.
    if os.environ.get('FRAG_DIFF_PROFILE') == 'afe':
        a_contexts = ["div", "b", "a", "nobr", "font", "td", "table",
                      "caption", "p", "button", "object", "marquee",
                      "template", "body"]
        fmt = ["a", "b", "i", "em", "strong", "small", "s", "tt", "u",
               "code", "font", "nobr"]
        def afe_snippet():
            parts = []
            for _ in range(rng.randint(4, 16)):
                r = rng.random()
                if r < 0.32:
                    t = rng.choice(fmt)
                    a = rng.choice(["", "", " x=1", " x=2"])
                    parts.append(f"<{t}{a}>")
                elif r < 0.40:
                    t = rng.choice(fmt)
                    parts.append(f"<{t}>" * rng.randint(3, 5))
                elif r < 0.60:
                    parts.append(f"</{rng.choice(fmt)}>")
                elif r < 0.72:
                    parts.append(rng.choice(["<marquee>", "<object>",
                                             "<button>", "<div>", "<p>",
                                             "<table>", "<td>", "<template>"]))
                elif r < 0.82:
                    parts.append(rng.choice(["</marquee>", "</object>",
                                             "</button>", "</div>", "</p>",
                                             "</table>", "</td>",
                                             "</template>"]))
                else:
                    parts.append(rng.choice(["x", " ", "<br>", "&amp;",
                                             "<a><a>", "</a></a>",
                                             "<table><b><tr>"]))
            s = "".join(parts)
            if rng.random() < 0.25:
                s = s[: rng.randint(1, len(s))]
            return s
        for _ in range(60):
            s = afe_snippet()
            for c in a_contexts:
                cases.append((c, s))

    # FRAG_DIFF_PROFILE=select: select-family contexts — the fabricated
    # open-element stack plus the reset-insertion-mode sub-walk decide
    # whether the parser starts in "in select" / "in select in table", and
    # the in-select implied closes + select-closing tags (input/keygen/
    # textarea/select) + <hr>-in-select all run against that fabrication.
    if os.environ.get('FRAG_DIFF_PROFILE') == 'select':
        s_contexts = ["select", "option", "optgroup", "datalist", "td",
                      "table", "tr", "div", "form", "button", "body",
                      "template", "caption"]
        s_bits = ["<select>", "</select>", "<option>o", "</option>",
                  "<optgroup>", "</optgroup>", "<hr>", "<input>",
                  "<keygen>", "<textarea>t</textarea>", "<textarea>",
                  "<option selected>p", "<optgroup label=g>",
                  "<script>s</script>", "<template><option>q</template>",
                  "<table>", "</table>", "<tr>", "<td>", "</td>",
                  "<caption>", "text", "  ", "&amp;", "<b>f", "</b>",
                  "<svg>", "</svg>", "<select><option>n</select>",
                  "<div>", "</div>", "</tr>", "<p>"]
        def select_snippet():
            parts = []
            for _ in range(rng.randint(3, 12)):
                parts.append(rng.choice(s_bits))
            s = "".join(parts)
            if rng.random() < 0.3:
                s = s[: rng.randint(1, len(s))]
            return s
        for _ in range(60):
            s = select_snippet()
            for c in s_contexts:
                cases.append((c, s))
    return cases


def main():
    inputs = corpus()
    print(f"{len(inputs)} fragment cases")
    payload = "\n".join(
        base64.b64encode(f"{c} {h}".encode()).decode() for c, h in inputs) + "\n"

    with tempfile.NamedTemporaryFile("w", suffix=".b64", delete=False) as f:
        f.write(payload)
        path = f.name

    ref = subprocess.run(
        ["node", "scripts/conformance/ref_fragment_dump.mjs"],
        input=payload, capture_output=True, text=True, check=True).stdout
    ours = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.FragmentDiffDump {path}"],
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
    main()

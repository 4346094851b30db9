#!/usr/bin/env python3
"""Type-stripper for the reference's erasable-TypeScript sources.

The sandbox has no tsc/deno/bun and node 20 cannot strip types, but the
reference's src/ uses only ERASABLE TypeScript (no enums, namespaces,
parameter properties, decorators or arrow generics — verified by grep), so
blanking type syntax with spaces yields runnable ESM JavaScript with
UNCHANGED line/column numbers. That lets the differential oracle run the
reference's real public API (parse / visibleText / tokens / provenance)
under plain node instead of only its vendored parse5 layer.

This is NOT a general TS compiler: it handles exactly the constructs the
reference uses (import/export type, interface, type aliases, param/return/
variable annotations, generics on declarations and call sites followed by
`(`, `as` casts, class field declarations, `readonly`, overload
signatures). Output goes to a THROWAWAY mirror (default /tmp/refjs) and is
never committed.

Usage: python3 scripts/conformance/ts_strip.py [outdir]
"""
import os
import re
import shutil
import sys

SRC = "/root/reference/src"

KEYWORDS_BEFORE_REGEX = {
    "return", "typeof", "instanceof", "in", "of", "new", "delete", "void",
    "throw", "case", "do", "else", "yield", "await",
}
PUNCT_BEFORE_REGEX = {
    "(", ",", "=", ":", "[", "!", "&", "|", "?", "{", "}", ";", "=>",
    "&&", "||", "??", "==", "===", "!=", "!==", "+", "-", "*", "/", "%",
    "<", ">", "<=", ">=", "...",
}

# NOTE: no "<<"/">>" shift tokens — nested generic closers like
# `Map<string, Set<number>>` must lex as two ">" so bracket matching works;
# misreading a rare shift as two ">" is harmless because tokens only guide
# erasure and the source text is preserved.
PUNCTS = [
    "...", "===", "!==", "**=", "=>", "==", "!=", "<=", ">=",
    "&&", "||", "??", "?.", "++", "--", "+=", "-=", "*=", "/=", "%=", "&=",
    "|=", "^=", "**",
]


def lex(src):
    """Tokenize JS/TS enough for type erasure: returns (kind, start, end)."""
    toks = []
    i, n = 0, len(src)
    prev = None  # last significant token text

    def push(kind, s, e):
        nonlocal prev
        toks.append((kind, s, e))
        if kind not in ("ws", "comment"):
            prev = src[s:e]

    while i < n:
        c = src[i]
        if c in " \t\r\n":
            j = i
            while j < n and src[j] in " \t\r\n":
                j += 1
            push("ws", i, j)
            i = j
        elif c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            j = n if j < 0 else j
            push("comment", i, j)
            i = j
        elif c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            j = n if j < 0 else j + 2
            push("comment", i, j)
            i = j
        elif c in "'\"":
            j = i + 1
            while j < n and src[j] != c:
                j += 2 if src[j] == "\\" else 1
            push("string", i, j + 1)
            i = j + 1
        elif c == "`":
            # template literal: handle ${...} nesting and quoted strings
            # inside the embedded expressions
            j = i + 1
            depth = 0  # ${ } nesting
            while j < n:
                ch = src[j]
                if ch == "\\":
                    j += 2
                    continue
                if depth == 0 and ch == "`":
                    j += 1
                    break
                if ch == "$" and j + 1 < n and src[j + 1] == "{":
                    depth += 1
                    j += 2
                    continue
                if depth > 0 and ch == "}":
                    depth -= 1
                elif depth > 0 and ch == "{":
                    depth += 1
                elif depth > 0 and ch in "'\"":
                    q = ch
                    j += 1
                    while j < n and src[j] != q:
                        j += 2 if src[j] == "\\" else 1
                j += 1
            push("template", i, j)
            i = j
        elif c == "/" and (
            prev is None
            or prev in PUNCT_BEFORE_REGEX
            or prev in KEYWORDS_BEFORE_REGEX
        ):
            # regex literal
            j = i + 1
            in_class = False
            while j < n:
                ch = src[j]
                if ch == "\\":
                    j += 2
                    continue
                if ch == "[":
                    in_class = True
                elif ch == "]":
                    in_class = False
                elif ch == "/" and not in_class:
                    break
                j += 1
            j += 1
            while j < n and src[j].isalpha():  # flags
                j += 1
            push("regex", i, j)
            i = j
        elif c.isalpha() or c in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            push("ident", i, j)
            i = j
        elif c.isdigit():
            j = i
            while j < n and (src[j].isalnum() or src[j] in "._"):
                j += 1
            push("num", i, j)
            i = j
        else:
            matched = None
            for p in PUNCTS:
                if src.startswith(p, i):
                    matched = p
                    break
            if matched:
                push("punct", i, i + len(matched))
                i += len(matched)
            else:
                push("punct", i, i + 1)
                i += 1
    return toks


class Stripper:
    def __init__(self, src):
        self.src = src
        self.toks = lex(src)
        self.blank = []  # list of (start, end) char ranges to blank

    def text(self, ti):
        k, s, e = self.toks[ti]
        return self.src[s:e]

    def kind(self, ti):
        return self.toks[ti][0]

    def next_sig(self, ti):
        """Index of next significant token at/after ti."""
        while ti < len(self.toks) and self.kind(ti) in ("ws", "comment"):
            ti += 1
        return ti

    def prev_sig(self, ti):
        ti -= 1
        while ti >= 0 and self.kind(ti) in ("ws", "comment"):
            ti -= 1
        return ti

    def mark(self, ti_from, ti_to):
        """Blank tokens [ti_from, ti_to) preserving newlines."""
        if ti_from >= ti_to:
            return
        s = self.toks[ti_from][1]
        e = self.toks[ti_to - 1][2]
        self.blank.append((s, e))

    # -- type expression scanner ------------------------------------------
    TYPE_CONT = {"|", "&", ".", ",", "=>", "extends", "keyof", "typeof",
                 "readonly", "in", "infer", "?", ":", "is", "asserts"}

    def scan_type(self, ti, stop):
        """Consume a type expression starting at significant token ti.
        `stop` is a set of depth-0 punct texts that end the type when the
        expression is already complete. Returns first index NOT in the type.
        """
        depth = 0
        expecting = True  # expecting an operand (so `{`/`(` belong to type)
        i = self.next_sig(ti)
        while i < len(self.toks):
            t = self.text(i)
            k = self.kind(i)
            if k in ("ws", "comment"):
                i += 1
                continue
            if depth == 0 and not expecting and t in stop:
                return i
            if t in ("<", "(", "[", "{"):
                depth += 1
                expecting = True
            elif t in (">", ")", "]", "}"):
                if depth == 0:
                    return i
                depth -= 1
                expecting = False
            elif t in self.TYPE_CONT or t == ";" and depth > 0:
                expecting = True
            elif k in ("ident", "string", "num", "template"):
                if not expecting and depth == 0:
                    return i
                expecting = False
            else:
                # any other punct at depth 0 ends the type
                if depth == 0:
                    return i
                expecting = True
            i += 1
        return i

    # -- erasure rules ----------------------------------------------------
    def run(self):
        i = 0
        while i < len(self.toks):
            k = self.kind(i)
            if k in ("ws", "comment", "string", "template", "regex", "num"):
                i += 1
                continue
            t = self.text(i)
            if k == "ident":
                if t == "import":
                    i = self.handle_import(i)
                elif t == "export":
                    i = self.handle_export(i)
                elif t == "interface" and self.is_decl_pos(i):
                    i = self.drop_interface(i)
                elif t == "type" and self.is_type_alias(i):
                    i = self.drop_type_alias(i)
                elif t == "function":
                    i = self.handle_function(i)
                elif t in ("const", "let", "var"):
                    i = self.handle_vardecl(i)
                elif t == "as":
                    i = self.handle_as(i)
                elif t == "class":
                    i = self.handle_class(i)
                elif t == "catch":
                    i = self.handle_catch(i)
                else:
                    i = self.maybe_arrow_params(i)
            elif t == "(":
                i = self.maybe_arrow_params(i)
            else:
                i += 1
        return self.apply()

    def is_decl_pos(self, i):
        p = self.prev_sig(i)
        if p < 0:
            return True
        pt = self.text(p)
        return pt in (";", "}", "{", "export") or self.src[
            self.toks[p][2]:self.toks[i][1]].count("\n") > 0

    def is_type_alias(self, i):
        if not self.is_decl_pos(i):
            return False
        j = self.next_sig(i + 1)
        if j >= len(self.toks) or self.kind(j) != "ident":
            return False
        j2 = self.next_sig(j + 1)
        return j2 < len(self.toks) and self.text(j2) in ("=", "<")

    def match_bracket(self, i, open_t, close_t):
        """Token index just after the bracket matching the one at i."""
        depth = 0
        while i < len(self.toks):
            t = self.text(i)
            if t == open_t:
                depth += 1
            elif t == close_t:
                depth -= 1
                if depth == 0:
                    return i + 1
            i += 1
        return i

    def drop_interface(self, i):
        j = i
        while j < len(self.toks) and self.text(j) != "{":
            j += 1
        j = self.match_bracket(j, "{", "}")
        self.mark(i, j)
        return j

    def drop_type_alias(self, i):
        # consume: type Name<...>? = TYPE ;
        j = self.next_sig(i + 1)          # name
        j = self.next_sig(j + 1)
        if self.text(j) == "<":
            j = self.match_bracket(j, "<", ">")
            j = self.next_sig(j)
        # j at '='
        j = self.scan_type(j + 1, {";"})
        if j < len(self.toks) and self.text(j) == ";":
            j += 1
        self.mark(i, j)
        return j

    def handle_import(self, i):
        j = self.next_sig(i + 1)
        if j < len(self.toks) and self.text(j) == "type":
            # import type {...} from '...';
            e = j
            while e < len(self.toks) and self.text(e) != ";":
                e += 1
            self.mark(i, e + 1)
            return e + 1
        # inline `type X` specifiers inside braces
        if j < len(self.toks) and self.text(j) == "{":
            self.strip_inline_type_specifiers(j)
        return i + 1

    def handle_export(self, i):
        j = self.next_sig(i + 1)
        if j < len(self.toks) and self.text(j) == "type":
            e = j
            nxt = self.next_sig(j + 1)
            if nxt < len(self.toks) and self.text(nxt) == "{":
                while e < len(self.toks) and self.text(e) != ";":
                    e += 1
                self.mark(i, e + 1)
                return e + 1
            # export type Name = ...;
            return self.drop_type_alias_from_export(i, j)
        if j < len(self.toks) and self.text(j) == "interface":
            j2 = self.drop_interface(j)
            self.mark(i, j)  # blank the `export` too
            return j2
        if j < len(self.toks) and self.text(j) == "{":
            self.strip_inline_type_specifiers(j)
        return i + 1

    def drop_type_alias_from_export(self, i_export, i_type):
        j = self.drop_type_alias(i_type)
        self.mark(i_export, i_type)
        return j

    def strip_inline_type_specifiers(self, brace_i):
        """Inside an import/export brace list, drop `type Name(, )`."""
        j = brace_i + 1
        while j < len(self.toks) and self.text(j) != "}":
            if self.kind(j) == "ident" and self.text(j) == "type":
                nx = self.next_sig(j + 1)
                if nx < len(self.toks) and self.kind(nx) == "ident":
                    e = nx
                    # possible `as Alias`
                    nx2 = self.next_sig(e + 1)
                    if nx2 < len(self.toks) and self.text(nx2) == "as":
                        e = self.next_sig(nx2 + 1)
                    nx3 = self.next_sig(e + 1)
                    if nx3 < len(self.toks) and self.text(nx3) == ",":
                        e = nx3
                    self.mark(j, e + 1)
                    j = e + 1
                    continue
            j += 1

    def handle_function(self, i):
        """function name<T>(params): Ret {  — or an overload ending `;`."""
        j = self.next_sig(i + 1)
        if j < len(self.toks) and self.text(j) == "*":
            j = self.next_sig(j + 1)
        if j < len(self.toks) and self.kind(j) == "ident":
            j = self.next_sig(j + 1)
        if j < len(self.toks) and self.text(j) == "<":
            j2 = self.match_bracket(j, "<", ">")
            self.mark(j, j2)
            j = self.next_sig(j2)
        if j >= len(self.toks) or self.text(j) != "(":
            return i + 1
        close = self.strip_params(j)
        after = self.next_sig(close)
        if after < len(self.toks) and self.text(after) == ":":
            end = self.scan_type(after + 1, {"{", ";"})
            self.mark(after, end)
            after = end
        after = self.next_sig(after)
        if after < len(self.toks) and self.text(after) == ";":
            # overload signature: drop the whole declaration
            p = self.prev_sig(i)
            start = i
            if p >= 0 and self.text(p) == "export":
                start = p
            self.mark(start, after + 1)
            return after + 1
        return after

    def strip_params(self, open_paren):
        """Strip `?` and `: TYPE` from each top-level param. Returns index
        just after the closing paren."""
        close = self.match_bracket(open_paren, "(", ")")
        j = open_paren + 1
        while j < close - 1:
            t = self.text(j)
            if t in ("(", "[", "{", "<"):
                j = self.match_bracket(
                    j, t, {"(": ")", "[": "]", "{": "}", "<": ">"}[t])
                continue
            if t == "?":
                nx = self.next_sig(j + 1)
                if nx < close and self.text(nx) == ":":
                    end = self.scan_type(nx + 1, {",", ")", "="})
                    self.mark(j, end)
                    j = end
                    continue
                self.mark(j, j + 1)
                j += 1
                continue
            if t == ":":
                end = self.scan_type(j + 1, {",", ")", "="})
                self.mark(j, end)
                j = end
                continue
            if t == "=":
                # default value: skip expression till , or ) at depth 0
                j = self.skip_expr(j + 1, close)
                continue
            j += 1
        return close

    def skip_expr(self, j, close):
        depth = 0
        while j < close:
            t = self.text(j)
            if t in ("(", "[", "{"):
                depth += 1
            elif t in (")", "]", "}"):
                if depth == 0:
                    return j
                depth -= 1
            elif t == "," and depth == 0:
                return j
            elif t == "as" and depth == 0 and self.kind(j) == "ident":
                end = self.scan_type(j + 1, {",", ")", ";", "]", "}"})
                self.mark(j, end)
                j = end
                continue
            j += 1
        return j

    def handle_vardecl(self, i):
        j = self.next_sig(i + 1)
        if j >= len(self.toks):
            return i + 1
        if self.text(j) in ("{", "["):
            j = self.match_bracket(
                j, self.text(j), {"{": "}", "[": "]"}[self.text(j)])
            j = self.next_sig(j)
        elif self.kind(j) == "ident":
            j = self.next_sig(j + 1)
        else:
            return i + 1
        if j < len(self.toks) and self.text(j) == ":":
            end = self.scan_type(j + 1, {"=", ";", ","})
            self.mark(j, end)
            return end
        return i + 1

    def handle_as(self, i):
        p = self.prev_sig(i)
        if p < 0:
            return i + 1
        pk, pt = self.kind(p), self.text(p)
        if pk in ("ident", "string", "template", "num") or pt in (")", "]", "}"):
            # not `import * as x` / `export * as x` / brace specifiers
            if pt in ("*",) or pk == "ident" and pt == "as":
                return i + 1
            # inside import/export braces `X as Y` must be kept — detect by
            # scanning back for an unclosed `{` whose prev is import/export-ish
            if self.in_import_export_braces(i):
                return i + 1
            nx = self.next_sig(i + 1)
            if nx < len(self.toks) and self.text(nx) == "const":
                self.mark(i, nx + 1)
                return nx + 1
            end = self.scan_type(
                i + 1, {",", ")", ";", "]", "}", ":", "?", "==", "===", "!=",
                        "!==", "&&", "||", "+", "-", "*", "/", "??"})
            self.mark(i, end)
            return end
        return i + 1

    def in_import_export_braces(self, i):
        depth = 0
        j = i - 1
        while j >= 0 and i - j < 200:
            t = self.text(j) if self.kind(j) not in ("ws", "comment") else None
            if t == "}":
                depth += 1
            elif t == "{":
                if depth == 0:
                    p = self.prev_sig(j)
                    while p >= 0 and self.kind(p) in ("ws", "comment"):
                        p -= 1
                    pt = self.text(p) if p >= 0 else ""
                    return pt in ("import", "export")
                depth -= 1
            j -= 1
        return False

    def handle_class(self, i):
        """Handle class bodies: field declarations `name: T;` and methods."""
        j = i
        while j < len(self.toks) and self.text(j) != "{":
            if self.text(j) == "implements":
                end = j
                while end < len(self.toks) and self.text(end) != "{":
                    end += 1
                self.mark(j, end)
                j = end
                break
            j += 1
        body_end = self.match_bracket(j, "{", "}")
        k = j + 1
        while k < body_end - 1:
            t = self.text(k)
            kd = self.kind(k)
            if kd in ("ws", "comment"):
                k += 1
                continue
            if t == "readonly":
                nx = self.next_sig(k + 1)
                self.mark(k, nx)
                k = nx
                continue
            if kd == "ident":
                nx = self.next_sig(k + 1)
                if nx < body_end and self.text(nx) == ":":
                    # field declaration with annotation
                    end = self.scan_type(nx + 1, {"=", ";"})
                    self.mark(nx, end)
                    k = end
                    continue
                if nx < body_end and self.text(nx) == "(":
                    close = self.strip_params(nx)
                    after = self.next_sig(close)
                    if after < body_end and self.text(after) == ":":
                        end = self.scan_type(after + 1, {"{", ";"})
                        self.mark(after, end)
                        after = end
                    k = after
                    continue
            if t in ("(", "[", "{"):
                k = self.match_bracket(
                    k, t, {"(": ")", "[": "]", "{": "}"}[t])
                continue
            k += 1
        return j + 1  # re-scan body for nested constructs (as-casts etc.)

    def handle_catch(self, i):
        j = self.next_sig(i + 1)
        if j < len(self.toks) and self.text(j) == "(":
            self.strip_params(j)
        return i + 1

    JS_KEYWORDS = {
        "if", "for", "while", "switch", "catch", "return", "typeof", "new",
        "in", "of", "do", "else", "void", "delete", "await", "yield", "case",
        "throw", "instanceof", "with", "function", "super", "this",
    }

    def maybe_arrow_params(self, i):
        """Detect `(params) =>` or `(params): Ret =>` and strip; also
        call-site generics `ident<T>(` and object-literal/class method
        definitions `name(params): Ret {`."""
        if self.kind(i) == "ident":
            nx = self.next_sig(i + 1)
            if nx < len(self.toks) and self.text(nx) == "<":
                end = self.try_generic_args(nx)
                if end is not None:
                    self.mark(nx, end)
                    return end
            if (nx < len(self.toks) and self.text(nx) == "("
                    and self.text(i) not in self.JS_KEYWORDS):
                p = self.prev_sig(i)
                pt = self.text(p) if p >= 0 else "{"
                if pt in ("{", ",", ";", "}") or pt in ("async", "get",
                                                        "set", "static"):
                    close = self.match_bracket(nx, "(", ")")
                    after = self.next_sig(close)
                    if after < len(self.toks) and self.text(after) == ":":
                        t_end = self.scan_type(after + 1, {"{", ";", ","})
                        if t_end < len(self.toks) and self.text(t_end) == "{":
                            self.mark(after, t_end)
                            self.strip_params(nx)
                            return close
                    elif after < len(self.toks) and self.text(after) == "{":
                        self.strip_params(nx)
                        return close
            return i + 1
        # i is '('
        close = self.match_bracket(i, "(", ")")
        after = self.next_sig(close)
        is_arrow = False
        if after < len(self.toks):
            if self.text(after) == "=>":
                is_arrow = True
            elif self.text(after) == ":":
                t_end = self.scan_type(after + 1, {"=>", ";", ",", ")"})
                if t_end < len(self.toks) and self.text(t_end) == "=>":
                    is_arrow = True
                    self.mark(after, t_end)
        if is_arrow:
            self.strip_params(i)
            return close
        return i + 1

    def try_generic_args(self, lt):
        """If tokens from `<` form generic args followed by `(`, return the
        index just after `>`; else None."""
        depth = 0
        j = lt
        limit = lt + 80
        while j < len(self.toks) and j < limit:
            t = self.text(j)
            k = self.kind(j)
            if k in ("ws", "comment"):
                j += 1
                continue
            if t == "<":
                depth += 1
            elif t == ">":
                depth -= 1
                if depth == 0:
                    nx = self.next_sig(j + 1)
                    if nx < len(self.toks) and self.text(nx) == "(":
                        return j + 1
                    return None
            elif t in ("&&", "||", ";", "{", ")", "=", "+", "-", "*", "/",
                       "==", "===", "!=", "!=="):
                return None
            elif k in ("num", "regex", "template"):
                return None
            j += 1
        return None

    def apply(self):
        out = list(self.src)
        for s, e in self.blank:
            for p in range(s, e):
                if out[p] not in "\n":
                    out[p] = " "
        return "".join(out)


def strip_file(path):
    src = open(path, encoding="utf-8").read()
    return Stripper(src).run()


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refjs"
    if os.path.exists(outdir):
        shutil.rmtree(outdir)
    os.makedirs(outdir)
    with open(os.path.join(outdir, "package.json"), "w") as f:
        f.write('{"type":"module"}\n')
    for root, dirs, files in os.walk(SRC):
        rel = os.path.relpath(root, SRC)
        if rel.split(os.sep)[0:2] == ["internal", "vendor"]:
            continue
        tgt = os.path.join(outdir, rel) if rel != "." else outdir
        os.makedirs(tgt, exist_ok=True)
        for fn in files:
            p = os.path.join(root, fn)
            if fn.endswith(".ts"):
                js = strip_file(p)
                with open(os.path.join(tgt, fn[:-3] + ".js"), "w") as f:
                    f.write(js)
            elif fn.endswith((".js", ".mjs", ".json")):
                shutil.copy(p, os.path.join(tgt, fn))
    # vendor is already plain JS: symlink the whole tree
    vsrc = os.path.join(SRC, "internal", "vendor")
    vdst = os.path.join(outdir, "internal", "vendor")
    if os.path.exists(vsrc) and not os.path.exists(vdst):
        os.symlink(vsrc, vdst)
    print(f"stripped -> {outdir}")


if __name__ == "__main__":
    main()

// Differential-oracle helper (tokenizer): tokenize each input with the
// REFERENCE's vendored parse5 Tokenizer (plain JS) and print a canonical
// rendering of the merged public token stream (adjacent character tokens of
// any class merged, EOF appended — the reference tokenize façade's shape,
// tokenize.ts:68-85,139-259).
//
// stdin:  one base64(html) per line
// stdout: one base64(token lines) per line
import { createInterface } from 'node:readline';
import { Tokenizer } from '/root/reference/src/internal/vendor/parse5/tokenizer/index.js';

function canon(tokens) {
  const out = [];
  for (const t of tokens) {
    if (t.kind === 'chars') {
      if (out.length > 0 && out[out.length - 1].kind === 'chars') {
        out[out.length - 1].data += t.data;
        continue;
      }
    }
    out.push(t);
  }
  return out.map((t) => {
    switch (t.kind) {
      case 'start':
        return `StartTag(${t.name})[${t.attrs.map(([k, v]) => `${k}=${JSON.stringify(v)}`).join(',')}]${t.selfClosing ? '/' : ''}`;
      case 'end': return `EndTag(${t.name})`;
      case 'chars': return `Chars(${JSON.stringify(t.data)})`;
      case 'comment': return `Comment(${JSON.stringify(t.data)})`;
      case 'doctype':
        return `Doctype(${t.name ?? ''},${t.publicId ?? ''},${t.systemId ?? ''},${t.forceQuirks})`;
      default: return 'EOF';
    }
  }).join('\n');
}

function tokenizeOne(html) {
  const tokens = [];
  const errors = [];
  const tok = new Tokenizer({ sourceCodeLocationInfo: false }, {
    onStartTag(t) {
      const attrs = [];
      const seen = new Set();
      for (const a of t.attrs) {
        if (!seen.has(a.name)) { seen.add(a.name); attrs.push([a.name, a.value]); }
      }
      tokens.push({ kind: 'start', name: t.tagName, attrs, selfClosing: t.selfClosing });
    },
    onEndTag(t) { tokens.push({ kind: 'end', name: t.tagName }); },
    onComment(t) { tokens.push({ kind: 'comment', data: t.data }); },
    onDoctype(t) {
      tokens.push({ kind: 'doctype', name: t.name, publicId: t.publicId,
        systemId: t.systemId, forceQuirks: t.forceQuirks });
    },
    onCharacter(t) { tokens.push({ kind: 'chars', data: t.chars }); },
    onWhitespaceCharacter(t) { tokens.push({ kind: 'chars', data: t.chars }); },
    onNullCharacter(t) { tokens.push({ kind: 'chars', data: t.chars }); },
    onParseError(e) { errors.push(`Err(${e.code},${e.startOffset})`); },
    onEof() { tokens.push({ kind: 'eof' }); }
  });
  tok.write(html, true);
  return canon(tokens) + (errors.length ? '\n' + errors.join('\n') : '');
}

const rl = createInterface({ input: process.stdin, terminal: false });
const out = [];
rl.on('line', (line) => {
  const html = Buffer.from(line, 'base64').toString('utf8');
  let result;
  try { result = tokenizeOne(html); }
  catch (e) { result = `THREW: ${e.message}`; }
  out.push(Buffer.from(result, 'utf8').toString('base64'));
});
rl.on('close', () => { process.stdout.write(out.join('\n') + '\n'); });

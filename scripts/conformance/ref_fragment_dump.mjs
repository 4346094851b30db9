// Differential-oracle helper (fragment parsing): replicate the reference's
// createFragmentContext (build.ts:283-305 — canned context documents for
// frameset/html/head/body/title, `<tag></tag>` fragment otherwise) and run
// the vendored parse5 fragment parser, printing the normalized tree.
//
// stdin:  one base64(context + "\0" + html) per line
// stdout: one base64(normalized tree) per line
import { createInterface } from 'node:readline';
import { Parser } from '/root/reference/src/internal/vendor/parse5/parser/index.js';
import { defaultTreeAdapter } from '/root/reference/src/internal/vendor/parse5/tree-adapters/default.js';

const CONTEXT_DOCUMENT_HTML =
  '<!doctype html><html><head><title>x</title></head><body><table><tbody><tr><td></td></tr><caption></caption><colgroup></colgroup></table><frameset></frameset></body></html>';
const CONTEXT_DOCUMENT_FRAMESET =
  '<!doctype html><html><frameset></frameset></html>';

const HTML_NS = 'http://www.w3.org/1999/xhtml';
const SVG_NS = 'http://www.w3.org/2000/svg';
const MATHML_NS = 'http://www.w3.org/1998/Math/MathML';

function parseDoc(html) {
  return Parser.parse(html, { treeAdapter: defaultTreeAdapter });
}

function parseFragmentWith(context, html) {
  const parser = Parser.getFragmentParser(context, { treeAdapter: defaultTreeAdapter });
  parser.tokenizer.write(html, true);
  return parser.getFragment();
}

function findElementByTagName(node, tagName) {
  for (const child of node.childNodes ?? []) {
    if (child.tagName === tagName) return child;
    const nested = findElementByTagName(child, tagName);
    if (nested !== null) return nested;
  }
  return null;
}

function createFragmentContext(raw) {
  const tagName = raw.trim().toLowerCase();
  if (tagName.length === 0) return null;
  if (tagName === 'frameset') {
    return findElementByTagName(parseDoc(CONTEXT_DOCUMENT_FRAMESET), tagName);
  }
  if (tagName === 'html' || tagName === 'head' || tagName === 'body' || tagName === 'title') {
    return findElementByTagName(parseDoc(CONTEXT_DOCUMENT_HTML), tagName);
  }
  const contextFragment = parseFragmentWith(null, `<${tagName}></${tagName}>`);
  for (const child of contextFragment.childNodes ?? []) {
    if (child.tagName === tagName) return child;
  }
  return null;
}

function elementName(node) {
  const ns = node.namespaceURI;
  if (ns === HTML_NS) return node.tagName;
  if (ns === SVG_NS) return `svg ${node.tagName}`;
  if (ns === MATHML_NS) return `math ${node.tagName}`;
  return `${ns} ${node.tagName}`;
}

function attrName(a) {
  if (a.prefix !== undefined && a.prefix.length > 0) {
    // parse5's adjustTokenXMLAttrs rewrites `name` to the LOCAL part and
    // moves the qualifier into `prefix` (foreign-content.js:70-85,193-200),
    // so strip a leading "prefix:" only when it is actually present.
    const local = a.name.startsWith(`${a.prefix}:`)
      ? a.name.slice(a.prefix.length + 1)
      : a.name;
    return `${a.prefix} ${local}`;
  }
  return a.name;
}

function normalize(node, level, lines) {
  const indent = '  '.repeat(level);
  const name = node.nodeName;
  if (name === '#text') {
    lines.push(`| ${indent}"${node.value}"`);
  } else if (name === '#comment') {
    lines.push(`| ${indent}<!-- ${node.data} -->`);
  } else if (name === '#documentType') {
    lines.push(`| ${indent}<!DOCTYPE ${node.name}>`);
  } else if (node.tagName !== undefined) {
    lines.push(`| ${indent}<${elementName(node)}>`);
    for (const a of node.attrs ?? []) {
      lines.push(`| ${indent}  ${attrName(a)}="${a.value}"`);
    }
    for (const c of node.childNodes ?? []) normalize(c, level + 1, lines);
  }
}

const rl = createInterface({ input: process.stdin, terminal: false });
const out = [];
rl.on('line', (line) => {
  const payload = Buffer.from(line, 'base64').toString('utf8');
  const sep = payload.indexOf(' ');
  const context = payload.slice(0, sep);
  const html = payload.slice(sep + 1);
  let result;
  try {
    const frag = parseFragmentWith(createFragmentContext(context), html);
    const lines = [];
    for (const c of frag.childNodes ?? []) normalize(c, 0, lines);
    result = lines.length === 0 ? '(EMPTY)' : lines.join('\n');
  } catch (e) {
    result = `THREW: ${e.message}`;
  }
  out.push(Buffer.from(result, 'utf8').toString('base64'));
});
rl.on('close', () => { process.stdout.write(out.join('\n') + '\n'); });

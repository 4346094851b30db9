// Differential-oracle helper: parse each input with the REFERENCE's own
// vendored parse5 (plain JS, runnable without a TS toolchain) and print the
// tree in the same html5lib-style normalized format graft.core.Serializer
// .normalizeTree emits (element/attr naming per the reference's
// formatElementName/formatAttributeName, build.ts:129-152).
//
// stdin:  one base64(html) per line
// stdout: one base64(normalized tree) per line
import { createInterface } from 'node:readline';
import { Parser } from '/root/reference/src/internal/vendor/parse5/parser/index.js';
import { defaultTreeAdapter } from '/root/reference/src/internal/vendor/parse5/tree-adapters/default.js';

const HTML_NS = 'http://www.w3.org/1999/xhtml';
const SVG_NS = 'http://www.w3.org/2000/svg';
const MATHML_NS = 'http://www.w3.org/1998/Math/MathML';

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
    if ((node.publicId ?? '').length > 0 || (node.systemId ?? '').length > 0) {
      lines.push(`| ${indent}<!DOCTYPE ${node.name} "${node.publicId}" "${node.systemId}">`);
    } else {
      lines.push(`| ${indent}<!DOCTYPE ${node.name}>`);
    }
  } else if (node.tagName !== undefined) {
    lines.push(`| ${indent}<${elementName(node)}>`);
    for (const a of node.attrs ?? []) {
      lines.push(`| ${indent}  ${attrName(a)}="${a.value}"`);
    }
    // NOTE: template content intentionally not descended (matching the
    // Scala normalizer, which also keeps template content opaque)
    for (const c of node.childNodes ?? []) normalize(c, level + 1, lines);
  }
}

const rl = createInterface({ input: process.stdin, terminal: false });
const out = [];
rl.on('line', (line) => {
  const html = Buffer.from(line, 'base64').toString('utf8');
  let result;
  try {
    const doc = Parser.parse(html, { treeAdapter: defaultTreeAdapter });
    const lines = [];
    for (const c of doc.childNodes ?? []) normalize(c, 0, lines);
    result = lines.join('\n');
  } catch (e) {
    result = `THREW: ${e.message}`;
  }
  out.push(Buffer.from(result, 'utf8').toString('base64'));
});
rl.on('close', () => {
  process.stdout.write(out.join('\n') + '\n');
});

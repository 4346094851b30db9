// Differential-oracle helper for the EXTRACTION layer: run the reference's
// REAL public API (type-stripped by ts_strip.py into /tmp/refjs — see that
// script's header) and dump, per input document, a canonical JSON record of
// every extraction surface: visibleText under each option toggle,
// visibleTextTokens, visibleTextTokensWithProvenance, textContent, outline
// and chunk. This covers the layer the parse5-only tree oracle cannot reach
// (reference: src/public/mod.ts:1035-1500 extraction + :1616-1782 traversal).
//
// stdin:  one base64(html) per line
// stdout: one base64(JSON record) per line
import { createInterface } from 'node:readline';

const REFJS = process.env.REFJS ?? '/tmp/refjs';
const m = await import(`${REFJS}/public/mod.js`);
const tk = await import(`${REFJS}/internal/tokenizer/mod.js`);

// tokenize facade parity: tokens + errors under option combos
function tokRec(h, opts) {
  try {
    const r = tk.tokenize(h, opts);
    return [r.tokens.map((t) => {
      switch (t.type) {
        case 'StartTag': return ['S', t.name, Object.entries(t.attributes), t.selfClosing];
        case 'EndTag': return ['E', t.name];
        case 'Character': return ['C', t.data];
        case 'Comment': return ['M', t.data];
        case 'Doctype': return ['D', t.name, t.publicId, t.systemId, t.forceQuirks];
        default: return ['F'];
      }
    }), r.errors.map((e) => [e.code, e.index])];
  } catch (e) { return ['THREW', String(e && e.message)]; }
}
const TOK_COMBOS = [
  {},
  { initialState: 'RCDATA state', lastStartTag: 'textarea' },
  { initialState: 'RAWTEXT state', lastStartTag: 'style' },
  { initialState: 'Script data state', lastStartTag: 'script' },
  { initialState: 'PLAINTEXT state' },
  { initialState: 'CDATA section state' },
  { budgets: { maxTextBytes: 40, maxParseErrors: 2 } },
  { budgets: { maxTokenBytes: 60 } },
  { doubleEscaped: true },
  { xmlViolationMode: true },
];

function record(html) {
  const tree = m.parse(html);
  const rec = {
    vt_default: m.visibleText(tree),
    vt_keep_hidden: m.visibleText(tree, { skipHiddenSubtrees: false }),
    vt_no_controls: m.visibleText(tree, { includeControlValues: false }),
    vt_accname: m.visibleText(tree, { includeAccessibleNameFallback: true }),
    vt_no_trim: m.visibleText(tree, { trim: false }),
    tokens: m.visibleTextTokens(tree).map((t) => [t.kind, t.value]),
    prov: m.visibleTextTokensWithProvenance(tree).map((t) => [
      t.kind, t.value, t.sourceNodeId, t.sourceNodeKind, t.sourceRole,
    ]),
    text_content: m.textContent(tree),
    outline: m.outline(tree).entries.map((e) => [
      e.nodeId, e.depth, e.tagName, e.text,
    ]),
    chunks: m.chunk(tree).map((c) => [c.index, c.nodeId, c.nodes, c.content]),
    // small budgets stress the flush boundaries incl. the UTF-8 byte budget
    chunks_small: m
      .chunk(tree, { maxChars: 48, maxNodes: 5, maxBytes: 200 })
      .map((c) => [c.index, c.nodeId, c.nodes, c.content]),
    serialize: m.serialize(tree),
    // fragment-context extraction: the fragment parser feeds the same
    // extraction pipeline but with fabricated contexts
    frags: ['div', 'td', 'p'].map((ctx) => {
      const ft = m.parseFragment(html, ctx);
      return [
        m.visibleText(ft),
        m.visibleTextTokens(ft).map((t) => [t.kind, t.value]),
        m.serialize(ft),
      ];
    }),
  };
  // spans + parse-error parity: re-parse with captureSpans and dump every
  // node's (id, kind, tagName, spanProvenance, span) plus attribute spans,
  // and the error list (code, parseErrorId, span). depth checks the DFS.
  const st = m.parse(html, { captureSpans: true });
  const spans = [];
  m.walk(st, (node, depth) => {
    const s = node.span ?? null;
    const rec = [node.id, depth, node.kind,
      node.kind === 'element' ? node.tagName : '',
      node.spanProvenance, s ? s.start : null, s ? s.end : null];
    if (node.kind === 'element') {
      rec.push(node.attributes.map((a) => [
        a.name, a.value, a.span ? a.span.start : null, a.span ? a.span.end : null,
      ]));
    }
    spans.push(rec);
  });
  rec.spans = spans;
  rec.errors = st.errors.map((e) => [
    e.code, e.parseErrorId,
    e.span ? e.span.start : null, e.span ? e.span.end : null,
  ]);
  // fragment-parse span/error parity (td context exercises the table modes)
  const sf = m.parseFragment(html, 'td', { captureSpans: true });
  const fspans = [];
  m.walk(sf, (node, depth) => {
    const s = node.span ?? null;
    const r2 = [node.id, depth, node.kind,
      node.kind === 'element' ? node.tagName : '',
      node.spanProvenance, s ? s.start : null, s ? s.end : null];
    if (node.kind === 'element') {
      r2.push(node.attributes.map((a) => [
        a.name, a.value, a.span ? a.span.start : null, a.span ? a.span.end : null,
      ]));
    }
    fspans.push(r2);
  });
  rec.frag_spans = fspans;
  rec.frag_errors = sf.errors.map((e) => [
    e.code, e.parseErrorId,
    e.span ? e.span.start : null, e.span ? e.span.end : null,
  ]);
  // insertion-mode transition parity: the trace's transition events carry
  // parse5's currentToken context (last START/END tag token only)
  const tt = m.parse(html, { trace: true });
  rec.transitions = (tt.trace ?? [])
    .filter((e) => e.kind === 'insertionModeTransition')
    .map((e) => [e.fromMode, e.toMode, e.tokenContext.type,
      e.tokenContext.tagName, e.tokenContext.startOffset, e.tokenContext.endOffset]);
  // patch parity: a deterministic edit script derived from the tree (both
  // engines compute identical trees and node ids, so the same generator
  // yields the same edits). Overlap-heavy on purpose: planning failures
  // must match by error code too.
  const cand = [];
  m.walk(tree, (node) => {
    cand.push([node.id, node.kind,
      node.kind === 'element' ? node.attributes.map((a) => a.name) : []]);
  });
  const edits = [];
  cand.forEach(([id, kind, attrs], i) => {
    switch (i % 7) {
      case 0: if (kind === 'element') edits.push({ kind: 'setAttr', target: id, name: 'data-x', value: 'v&"\'<>' }); break;
      case 1: if (kind === 'text') edits.push({ kind: 'replaceText', target: id, value: 'R & T' }); break;
      case 2: if (kind === 'element' && attrs.length) edits.push({ kind: 'removeAttr', target: id, name: attrs[0] }); break;
      case 3: if (kind === 'element') edits.push({ kind: 'insertHtmlBefore', target: id, html: '<i>b</i>' }); break;
      case 4: if (kind === 'element') edits.push({ kind: 'insertHtmlAfter', target: id, html: '<i>a</i>' }); break;
      case 5: if (kind === 'element') edits.push({ kind: 'removeNode', target: id }); break;
      default: break;
    }
  });
  // budget-metrics parity: tight budgets over the same doc — either both
  // throw BudgetExceededError with identical (budget, limit, actual) or
  // both succeed with the same budget-ish error pushes
  try {
    const bt = m.parse(html, { budgets: { maxDepth: 6, maxNodes: 40,
      maxAttributesPerElement: 2, maxAttributeBytes: 40 } });
    rec.budget_probe = ['ok',
      bt.errors.map((e) => [e.parseErrorId, e.span ? e.span.start : null])];
  } catch (e) {
    rec.budget_probe = (e && e.payload)
      ? ['budget', e.payload.budget, e.payload.limit, e.payload.actual]
      : ['threw', String(e && e.message)];
  }
  rec.tok_facade = TOK_COMBOS.map((o) => tokRec(html, o));
  try {
    const plan = m.computePatch(html, edits);
    rec.patch = ['ok', plan.result, m.applyPatchPlan(html, plan) === plan.result];
  } catch (e) {
    rec.patch = ['err', e && e.payload ? e.payload.code : String(e && e.message),
      e && e.payload && e.payload.target !== undefined ? e.payload.target : null];
  }
  return rec;
}

const rl = createInterface({ input: process.stdin, crlfDelay: Infinity });
const out = [];
for await (const line of rl) {
  const b64 = line.trim();
  if (!b64) continue;
  const html = Buffer.from(b64, 'base64').toString('utf8');
  let rec;
  try {
    rec = record(html);
  } catch (e) {
    rec = { error: String(e && e.constructor ? e.constructor.name : e) };
  }
  out.push(Buffer.from(JSON.stringify(rec), 'utf8').toString('base64'));
}
process.stdout.write(out.join('\n') + '\n');

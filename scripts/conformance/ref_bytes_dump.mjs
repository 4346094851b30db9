// Differential-oracle helper for the BYTE DECODE layer: run the reference's
// real encoding sniff + decode (type-stripped by ts_strip.py into
// /tmp/refjs) over raw byte corpora and dump (decoded text, encoding,
// sniff source) — the surface parseBytes/parseStream build on
// (reference: src/internal/encoding/sniff.ts:271-307).
//
// stdin:  one JSON {"b": base64-bytes, "t": transportLabel|null} per line
// stdout: one base64(JSON [text, encoding, source]) per line
import { createInterface } from 'node:readline';

const REFJS = process.env.REFJS ?? '/tmp/refjs';
const m = await import(`${REFJS}/internal/encoding/mod.js`);

// KNOWN NODE QUIRK: node's TextDecoder('windows-1252') takes an internal
// latin1 fast path and decodes 0x80-0x9F as C1 controls instead of the
// WHATWG windows-1252 index (observable here: 0x80 -> U+0080, spec says
// U+20AC). The reference's intent is the spec TextDecoder, so repair the
// affected range through the WHATWG table (latin1 is injective, the
// reconstruction is exact).
const WIN1252_HI = [
  0x20ac, 0x0081, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021,
  0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008d, 0x017d, 0x008f,
  0x0090, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014,
  0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, 0x009d, 0x017e, 0x0178];
const nodeQuirk1252 =
  new TextDecoder('windows-1252').decode(new Uint8Array([0x80])) !== '€';
function repair1252(text) {
  if (!nodeQuirk1252) return text;
  let outp = '';
  for (const ch of text) {
    const cp = ch.codePointAt(0);
    outp += (cp >= 0x80 && cp <= 0x9f)
      ? String.fromCodePoint(WIN1252_HI[cp - 0x80]) : ch;
  }
  return outp;
}

const rl = createInterface({ input: process.stdin, crlfDelay: Infinity });
const out = [];
for await (const line of rl) {
  const t = line.trim();
  if (!t) continue;
  const req = JSON.parse(t);
  const bytes = new Uint8Array(Buffer.from(req.b, 'base64'));
  let rec;
  try {
    const d = m.decodeHtmlBytes(bytes,
      req.t ? { transportEncodingLabel: req.t } : {});
    const text = d.sniff.encoding === 'windows-1252' ? repair1252(d.text) : d.text;
    rec = [text, d.sniff.encoding, d.sniff.source];
  } catch (e) {
    rec = ['THREW', String(e && e.message), ''];
  }
  out.push(Buffer.from(JSON.stringify(rec), 'utf8').toString('base64'));
}
process.stdout.write(out.join('\n') + '\n');

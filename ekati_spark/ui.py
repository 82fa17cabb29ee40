"""Graph-explorer UI — the reference's Blazor explorer re-expressed as a
single self-contained HTML page served by :mod:`ekati_spark.server`.

Reference parity (`/root/reference/src/UI`):

- ``Pages/Query.razor`` — query editor with Run/Clear buttons, results
  rendered BOTH as a force-directed graph and as a paged attribute
  table (skip/take over nodes, one column per attribute key).
- ``Pages/Graph.razor`` — d3 force layout over the result nodes, with
  node-label / edge-label / pause-layout toggles (the commented-out
  checkbox block at Graph.razor:8-37 — we ship them working).
- ``Pages/Metrics.razor`` — name/value metric table fed by the
  GetMetrics RPC; here the ``/metrics`` + ``/stats`` JSON routes.

Spark-first deviation, deliberate: the reference is a Blazor-WASM app
with a d3 interop layer (``wwwroot``) speaking gRPC to the daemon. A
PySpark engine's daemon should stay dependency-free, so the explorer is
one static page (vanilla JS, inline SVG, zero external assets — works
offline) speaking the server's existing JSON routes. Edges are the
result rows whose ``ref`` column is set (the reference filters node
attributes to edge-valued ones the same way before handing them to d3,
Graph.razor:80-96 "filter to only attributes that are edges").

The page buffers at most ``take`` rows (default 500) — the daemon-side
cap on ``/query`` keeps the browser from pulling an unbounded result,
mirroring the reference's Skip/Take paging (Query.razor:52-55).
"""

from __future__ import annotations

# NOTE: kept as one constant so `GET /ui` is a single sendall and the
# page has no follow-up asset fetches. Curly braces below are literal
# (no str.format) — JS object syntax stays untouched.
EXPLORER_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>ekati explorer</title>
<style>
  body { margin: 0; font: 13px/1.4 system-ui, sans-serif; background: #1e1e1e; color: #ddd; }
  header { padding: 8px 12px; background: #2d2d30; display: flex; gap: 8px; align-items: center; }
  header h1 { font-size: 15px; margin: 0 12px 0 0; color: #9cdcfe; }
  button { background: #0e639c; color: #fff; border: 0; padding: 5px 14px; cursor: pointer; border-radius: 3px; }
  button:hover { background: #1177bb; }
  label { margin-left: 10px; user-select: none; }
  #wrap { display: flex; height: calc(100vh - 46px); }
  #left { width: 40%; display: flex; flex-direction: column; border-right: 1px solid #3c3c3c; }
  #q { flex: 0 0 130px; background: #252526; color: #d4d4d4; border: 0; padding: 10px;
       font: 13px/1.5 ui-monospace, monospace; resize: vertical; outline: none; }
  #tablebox { flex: 1; overflow: auto; padding: 8px; }
  #right { flex: 1; background: #000; position: relative; }
  svg { width: 100%; height: 100%; display: block; }
  table { border-collapse: collapse; width: 100%; }
  th, td { border: 1px solid #3c3c3c; padding: 3px 7px; text-align: left; white-space: nowrap; }
  th { background: #2d2d30; position: sticky; top: 0; }
  #pager { padding: 6px 0; }
  #status { color: #888; margin-left: auto; }
  circle { fill: #4fc1ff; stroke: #fff; stroke-width: 1; cursor: grab; }
  line { stroke: #666; stroke-width: 1.2; }
  text { fill: #ccc; font-size: 11px; pointer-events: none; }
  .err { color: #f48771; padding: 8px; }
  #metricsbox { padding: 8px; }
  h3 { color: #9cdcfe; font-size: 13px; margin: 10px 0 4px; }
</style>
</head>
<body>
<header>
  <h1>ekati explorer</h1>
  <button id="run">Run</button>
  <button id="clear">Clear</button>
  <label><input type="checkbox" id="nlab" checked> node labels</label>
  <label><input type="checkbox" id="elab"> edge labels</label>
  <label><input type="checkbox" id="pause"> pause layout</label>
  <span id="status"></span>
</header>
<div id="wrap">
  <div id="left">
    <textarea id="q" spellcheck="false">get "*" |> take 50</textarea>
    <div id="tablebox">
      <div id="pager">
        <button id="prev">&#8592;</button> <span id="page"></span> <button id="next">&#8594;</button>
      </div>
      <div id="tbl"></div>
      <div id="metricsbox">
        <h3>stats</h3><div id="stats"></div>
        <h3>metrics</h3><div id="metrics"></div>
      </div>
    </div>
  </div>
  <div id="right"><svg id="g"></svg></div>
</div>
<script>
"use strict";
const $ = (id) => document.getElementById(id);
let rows = [], nodes = [], links = [], skip = 0, animating = false;
const TAKE = 15, NS = "http://www.w3.org/2000/svg";

function status(t) { $("status").textContent = t; }

async function jpost(path, body) {
  const r = await fetch(path, { method: "POST", body: JSON.stringify(body) });
  const j = await r.json();
  if (!r.ok) throw new Error(j.error || r.status);
  return j;
}

// ---- result table: one row per node, one column per attribute key
// (Query.razor:52-75), skip/take paging over nodes ----
function renderTable() {
  const byNode = new Map();
  for (const r of rows) {
    if (!byNode.has(r.node_id)) byNode.set(r.node_id, {});
    const v = r.ref !== null ? ("^" + r.ref)
      : r.str !== null ? r.str : r.i64 !== null ? r.i64
      : r.dbl !== null ? r.dbl : r.bool;
    const cell = byNode.get(r.node_id);
    cell[r.key] = (r.key in cell) ? cell[r.key] + ", " + v : v;
  }
  const ids = [...byNode.keys()].sort();
  const pageIds = ids.slice(skip, skip + TAKE);
  const keys = [...new Set(pageIds.flatMap((i) => Object.keys(byNode.get(i))))].sort();
  let h = "<table><thead><tr><th>id</th>";
  for (const k of keys) h += "<th>" + esc(k) + "</th>";
  h += "</tr></thead><tbody>";
  for (const i of pageIds) {
    h += "<tr><td>" + esc(i) + "</td>";
    for (const k of keys) {
      const v = byNode.get(i)[k];
      h += "<td>" + (v === undefined ? "" : esc(String(v))) + "</td>";
    }
    h += "</tr>";
  }
  $("tbl").innerHTML = h + "</tbody></table>";
  $("page").textContent = ids.length ? (skip + 1) + "-" + Math.min(skip + TAKE, ids.length) + " of " + ids.length : "0";
}
function esc(s) { return String(s).replace(/[&<>"]/g, (c) => ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;"}[c])); }
$("prev").onclick = () => { skip = Math.max(0, skip - TAKE); renderTable(); };
$("next").onclick = () => { skip += TAKE; renderTable(); };

// ---- force layout (Graph.razor's d3 force sim, hand-rolled:
// repulsion + spring + centering, velocity Verlet w/ damping) ----
function buildGraph() {
  const idx = new Map();
  nodes = []; links = [];
  const add = (id) => {
    if (!idx.has(id)) {
      idx.set(id, nodes.length);
      nodes.push({ id, x: Math.cos(idx.size) * 120 + 400, y: Math.sin(idx.size) * 120 + 300, vx: 0, vy: 0 });
    }
    return idx.get(id);
  };
  for (const r of rows) {
    add(r.node_id);
    if (r.ref !== null) links.push({ s: add(r.node_id), t: add(r.ref), k: r.key });
  }
}

function tick() {
  if (!$("pause").checked) {
    const W = $("right").clientWidth || 800, H = $("right").clientHeight || 600;
    for (let i = 0; i < nodes.length; i++) {
      const a = nodes[i];
      for (let j = i + 1; j < nodes.length; j++) {
        const b = nodes[j];
        let dx = a.x - b.x, dy = a.y - b.y;
        const d2 = Math.max(dx * dx + dy * dy, 25);
        const f = 2200 / d2;
        const d = Math.sqrt(d2);
        dx /= d; dy /= d;
        a.vx += dx * f; a.vy += dy * f; b.vx -= dx * f; b.vy -= dy * f;
      }
      a.vx += (W / 2 - a.x) * 0.002; a.vy += (H / 2 - a.y) * 0.002;
    }
    for (const l of links) {
      const a = nodes[l.s], b = nodes[l.t];
      const dx = b.x - a.x, dy = b.y - a.y;
      const d = Math.max(Math.sqrt(dx * dx + dy * dy), 1);
      const f = (d - 80) * 0.01;
      a.vx += (dx / d) * f; a.vy += (dy / d) * f;
      b.vx -= (dx / d) * f; b.vy -= (dy / d) * f;
    }
    for (const n of nodes) {
      n.vx *= 0.85; n.vy *= 0.85; n.x += n.vx; n.y += n.vy;
    }
  }
  draw();
  if (nodes.length) { requestAnimationFrame(tick); } else { animating = false; }
}

function startAnim() {
  if (!animating) { animating = true; requestAnimationFrame(tick); }
}

function draw() {
  const svg = $("g");
  while (svg.firstChild) svg.removeChild(svg.firstChild);
  for (const l of links) {
    const a = nodes[l.s], b = nodes[l.t];
    const e = document.createElementNS(NS, "line");
    e.setAttribute("x1", a.x); e.setAttribute("y1", a.y);
    e.setAttribute("x2", b.x); e.setAttribute("y2", b.y);
    svg.appendChild(e);
    if ($("elab").checked) {
      const t = document.createElementNS(NS, "text");
      t.setAttribute("x", (a.x + b.x) / 2); t.setAttribute("y", (a.y + b.y) / 2);
      t.textContent = l.k; svg.appendChild(t);
    }
  }
  for (const n of nodes) {
    const c = document.createElementNS(NS, "circle");
    c.setAttribute("cx", n.x); c.setAttribute("cy", n.y); c.setAttribute("r", 7);
    svg.appendChild(c);
    if ($("nlab").checked) {
      const t = document.createElementNS(NS, "text");
      t.setAttribute("x", n.x + 9); t.setAttribute("y", n.y + 4);
      t.textContent = n.id; svg.appendChild(t);
    }
  }
}

async function run() {
  status("running\\u2026");
  try {
    const out = await jpost("/query", { q: $("q").value, limit: 500 });
    rows = out.rows || []; skip = 0;
    renderTable(); buildGraph();
    status(rows.length + " rows" + (rows.length === 500 ? " (capped at 500)" : ""));
    startAnim();
  } catch (e) {
    $("tbl").innerHTML = '<div class="err">' + esc(e.message) + "</div>";
    status("error");
  }
  refreshMetrics();
}
$("run").onclick = run;
$("clear").onclick = () => { rows = []; nodes = []; links = []; renderTable(); draw(); status(""); };

function kvTable(obj) {
  let h = "<table><tbody>";
  for (const [k, v] of Object.entries(obj)) h += "<tr><td>" + esc(k) + "</td><td>" + esc(String(v)) + "</td></tr>";
  return h + "</tbody></table>";
}

// Metrics.razor: Name/Value table off GetMetrics; /stats is GetStats.
async function refreshMetrics() {
  try {
    const s = await (await fetch("/stats")).json();
    $("stats").innerHTML = kvTable(s.stats || {});
    const m = await (await fetch("/metrics")).json();
    let h = "<table><thead><tr><th>name</th><th>value</th></tr></thead><tbody>";
    for (const e of (m.executors || [])) {
      for (const [k, v] of Object.entries(e)) h += "<tr><td>executor." + esc(k) + "</td><td>" + esc(String(v)) + "</td></tr>";
    }
    for (const st of (m.stages || []).slice(0, 20)) {
      h += "<tr><td>stage." + esc(String(st.stage_id ?? "")) + "</td><td>" + esc(JSON.stringify(st)) + "</td></tr>";
    }
    $("metrics").innerHTML = h + "</tbody></table>";
  } catch (e) { /* metrics pane is best-effort */ }
}
refreshMetrics();
</script>
</body>
</html>
"""

// Executes the built-in search UI's actual page script (fetched from a live
// server) under a minimal DOM shim, driving its real flows over real HTTP.
// Invoked by UiFlowSpec when a node runtime is present; BASE = server origin.
// Exits 0 and prints "UI HARNESS: ALL FLOWS OK" on success.
"use strict";
const BASE = process.env.GRAFT_UI_BASE;
if (!BASE) { console.error("GRAFT_UI_BASE not set"); process.exit(2); }

function el(id) {
  return {
    id, innerHTML: "", textContent: "", value: "", className: "", style: {},
    children: [], listeners: {},
    addEventListener(ev, fn) { this.listeners[ev] = fn; },
    appendChild(c) { this.children.push(c); },
    querySelector() { return { set onclick(f) {} }; },
    querySelectorAll() { return []; },
    contains() { return false; },
  };
}
const ids = {};
["q","mode","k","lang","source","tenant","apikey","sugg","dym","stat","res","health","f"]
  .forEach(i => ids[i] = el(i));
ids.mode.value = "q"; ids.k.value = "10";
if (process.env.GRAFT_UI_APIKEY) ids.apikey.value = process.env.GRAFT_UI_APIKEY;
if (process.env.GRAFT_UI_TENANT) ids.tenant.value = process.env.GRAFT_UI_TENANT;
const FLOWS = process.env.GRAFT_UI_FLOWS || "all";
global.document = {
  getElementById: id => ids[id],
  createElement: () => {
    let txt = "";
    return { set textContent(v) { txt = v; },
             get innerHTML() { return txt.replace(/&/g,"&amp;").replace(/</g,"&lt;").replace(/>/g,"&gt;"); },
             set innerHTML(v) {}, set onclick(f) {} };
  },
  addEventListener: () => {},
};
const realFetch = global.fetch;
// the page uses RELATIVE urls (mount-agnostic); resolve against BASE
global.fetch = (url, opts) =>
  realFetch(BASE + (url.startsWith("/") ? url : "/" + url), opts);
global.window = global;

(async () => {
  const html = await (await realFetch(BASE + "/")).text();
  const m = /<script>([\s\S]*?)<\/script>/.exec(html);
  if (!m) throw new Error("no <script> in served page");
  eval("var performance={now:function(){return Date.now()}};" + m[1] +
       "\n;global.__run = run; global.__hl = highlight;");

  // highlight unit cases (adversarial: term == tag/entity names)
  const hl = global.__hl;
  if (hl("alpha has a mark here", ["alpha","mark"]) !==
      "<mark>alpha</mark> has a <mark>mark</mark> here") throw new Error("highlight mark case");
  if (hl("a & b amp c", ["amp"]) !== "a &amp; b <mark>amp</mark> c") throw new Error("highlight amp case");
  if (hl("x < y", ["z"]) !== "x &lt; y") throw new Error("highlight escape case");

  // search flow (rendered stat + hits + <mark> highlighting)
  ids.q.value = "alpha bravo";
  global.__run();
  await new Promise(r => setTimeout(r, 2500));
  if (!/result/.test(ids.stat.textContent)) throw new Error("stat not set: " + ids.stat.textContent);
  if (!/doc \d+/.test(ids.res.innerHTML)) throw new Error("no hits rendered");
  if (!/<mark>/.test(ids.res.innerHTML)) throw new Error("no highlighting");
  console.log("search flow OK:", ids.stat.textContent);

  if (FLOWS === "search") { console.log("UI HARNESS: ALL FLOWS OK"); return; }
  // suggest flow (debounced input listener the page registered)
  ids.q.value = "alp";
  ids.q.listeners["input"]();
  await new Promise(r => setTimeout(r, 1500));
  if (ids.sugg.children.length < 1) throw new Error("no suggestions rendered");
  console.log("suggest flow OK:", ids.sugg.children.length, "suggestions");

  // did-you-mean flow (misspelling one edit from a vocab term)
  ids.q.value = "alphz";
  global.__run();
  await new Promise(r => setTimeout(r, 2500));
  if (ids.dym.style.display !== "block") throw new Error("did-you-mean not shown");
  console.log("did-you-mean flow OK");

  // wildcard mode
  ids.mode.value = "wildcard"; ids.q.value = "al*a";
  global.__run();
  await new Promise(r => setTimeout(r, 2500));
  if (!/result/.test(ids.stat.textContent)) throw new Error("wildcard stat: " + ids.stat.textContent);
  console.log("wildcard flow OK:", ids.stat.textContent);

  console.log("UI HARNESS: ALL FLOWS OK");
})().catch(e => { console.error("UI HARNESS FAIL:", e.message); process.exit(1); });

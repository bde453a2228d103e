// Shared helpers for the live demo apps (semseg, classification, comparison).
// Each app talks to the saev_tpu.web backend:
//   POST /api/<app>/<endpoint>  {"data": [...]}  ->  {"data": [result]}
// mirroring the Gradio API surface the reference's Elm apps call
// (reference src/web/src/Gradio.elm + {Semseg,Classification,Comparison}.elm).

export async function api(app, endpoint, args) {
  const resp = await fetch(`/api/${app}/${endpoint}`, {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ data: args }),
  });
  const body = await resp.json();
  if (!resp.ok) throw new Error(body.error || `${endpoint}: HTTP ${resp.status}`);
  return body.data[0];
}

// Wrap an async fetcher so only the LATEST call's result lands: slider drags
// fire many concurrent POSTs over separate connections, and a slow earlier
// response must not overwrite a newer one (returns null for superseded calls).
export function sequenced(fn) {
  let seq = 0;
  return async (...args) => {
    const mine = ++seq;
    const out = await fn(...args);
    return mine === seq ? out : null;
  };
}

export function el(tag, attrs = {}, ...children) {
  const node = document.createElement(tag);
  for (const [k, v] of Object.entries(attrs)) {
    if (k === "class") node.className = v;
    else if (k.startsWith("on")) node.addEventListener(k.slice(2), v);
    else node.setAttribute(k, v);
  }
  for (const c of children) {
    node.append(c instanceof Node ? c : document.createTextNode(String(c)));
  }
  return node;
}

// A selectable patch grid overlaid on an image (the Elm apps' hover/click
// patch UI, Semseg.elm HoverPatch/ToggleSelectedPatch). Calls
// onchange(selectedSet) whenever the selection changes.
export function patchGrid(imgUrl, gridH, gridW, onchange, displayPx = 256) {
  const selected = new Set();
  const wrap = el("div", {
    class: "patch-grid",
    style:
      `position:relative;width:${displayPx}px;height:${displayPx}px;` +
      "display:inline-block",
  });
  const img = el("img", {
    src: imgUrl,
    style: "position:absolute;inset:0;width:100%;height:100%",
  });
  const grid = el("div", {
    style:
      "position:absolute;inset:0;display:grid;" +
      `grid-template-columns:repeat(${gridW},1fr);` +
      `grid-template-rows:repeat(${gridH},1fr)`,
  });
  for (let p = 0; p < gridH * gridW; p++) {
    const cell = el("div", {
      class: "patch-cell",
      "data-patch": p,
      onclick: () => {
        if (selected.has(p)) selected.delete(p);
        else selected.add(p);
        cell.classList.toggle("selected");
        onchange(selected);
      },
    });
    grid.append(cell);
  }
  wrap.append(img, grid);
  wrap.clearSelection = () => {
    selected.clear();
    grid.querySelectorAll(".selected").forEach((c) => c.classList.remove("selected"));
  };
  return wrap;
}

// One latent's control row: a -10..10 slider (Semseg.elm:1036-1038) plus the
// gallery of top-activating examples with highlight toggles.
export function latentRow(latent, onSlide) {
  const value = el("span", { class: "slider-value" }, "0");
  const slider = el("input", {
    type: "range", min: -10, max: 10, step: 0.1, value: 0,
    oninput: (ev) => {
      value.textContent = ev.target.value;
      onSlide(latent.latent, parseFloat(ev.target.value));
    },
  });
  const gallery = el("div", { class: "gallery" });
  for (const ex of latent.examples) {
    const img = el("img", {
      src: ex.highlighted_url, title: `example ${ex.example} · ${ex.value.toFixed(2)}`,
      onclick: (ev) => {
        // ToggleHighlights: flip between the raw and highlighted rendering.
        ev.target.src =
          ev.target.src === ex.highlighted_url ? ex.orig_url : ex.highlighted_url;
      },
    });
    gallery.append(img);
  }
  return el(
    "div", { class: "latent-row" },
    el("div", { class: "latent-head" }, el("b", {}, `latent #${latent.latent}`), slider, value),
    gallery,
  );
}

export function probBars(probs, logits) {
  const wrap = el("div", { class: "prob-bars" });
  const entries = Object.entries(probs).sort((a, b) => b[1] - a[1]);
  for (const [cls, p] of entries) {
    wrap.append(
      el(
        "div", { class: "prob-row" },
        el("span", { class: "prob-label" }, `class ${cls}`),
        el("div", { class: "prob-track" },
          el("div", { class: "prob-fill", style: `width:${(p * 100).toFixed(1)}%` })),
        el("span", { class: "prob-pct" },
          `${(p * 100).toFixed(1)}%` + (logits ? ` (logit ${logits[cls].toFixed(3)})` : "")),
      ),
    );
  }
  return wrap;
}

export const baseCss = `
  body { font-family: system-ui, sans-serif; margin: 1.5rem; color: #1a1a2e; }
  h1 { font-size: 1.3rem; } h2 { font-size: 1.05rem; margin: 1rem 0 .4rem; }
  button { margin: 0 .25rem; padding: .3rem .7rem; cursor: pointer; }
  input[type=number] { width: 5rem; }
  .row { display: flex; gap: 1.5rem; flex-wrap: wrap; align-items: flex-start; }
  .panel { border: 1px solid #ddd; border-radius: 6px; padding: .8rem; }
  .panel img { image-rendering: pixelated; }
  .patch-cell { border: 1px solid transparent; cursor: crosshair; }
  .patch-cell:hover { background: rgba(255,255,255,.35); }
  .patch-cell.selected { border-color: #ff3b30; background: rgba(255,59,48,.25); }
  .latent-row { border-top: 1px solid #eee; padding: .5rem 0; }
  .latent-head { display: flex; align-items: center; gap: .6rem; }
  .gallery img { width: 96px; height: 96px; margin: .2rem; image-rendering: pixelated; cursor: pointer; }
  .prob-row { display: flex; align-items: center; gap: .5rem; margin: .2rem 0; }
  .prob-label { width: 5.5rem; } .prob-pct { font-variant-numeric: tabular-nums; }
  .prob-track { width: 220px; height: 12px; background: #eee; border-radius: 6px; }
  .prob-fill { height: 100%; background: #4459e8; border-radius: 6px; }
  .err { color: #b00020; white-space: pre-wrap; }
  .muted { color: #777; font-size: .85rem; }
`;

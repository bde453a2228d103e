// Live classification probing app (reference src/web/src/Classification.elm):
// example picker (SetExample/GetRandomExample), class probabilities
// (GotOriginalPredictions), patch selection -> SAE latents with galleries,
// sliders -> modified predictions (GotModifiedPredictions), and per-class
// random examples (ExamineClass/GotClassExample). Backend:
// saev_tpu/web/backend.py ClassificationApp.
import { api, baseCss, el, latentRow, patchGrid, probBars, sequenced } from "../lib.js";

const style = document.createElement("style");
style.textContent = baseCss;
document.head.append(style);

const state = { i: 0, meta: null, sliders: {}, seed: 0 };
const app = document.getElementById("app");

function panel(title, ...children) {
  return el("div", { class: "panel" }, el("h2", {}, title), ...children);
}

function showErr(err) {
  app.prepend(el("div", { class: "err" }, String(err)));
}

// Sequenced: only the latest drag's response lands (see semseg/app.js).
const fetchModified = sequenced((mods) =>
  api("classification", "get-modified", [state.i, mods]));

async function refreshModified(mods) {
  const out = await fetchModified(mods);
  if (out === null) return; // superseded by a newer drag
  document.getElementById("mod-preds").replaceChildren(
    probBars(out.probs, out.logits));
}

function onSlide(latent, value) {
  // Touched sliders stay in the set even at 0: v=0 means ablation.
  state.sliders[latent] = value;
  refreshModified(state.sliders).catch(showErr);
}

async function onPatches(selected) {
  const latentsDiv = document.getElementById("latents");
  latentsDiv.replaceChildren(el("span", { class: "muted" }, "fetching latents…"));
  const latents = await api("classification", "get-sae-latents", [
    state.i, [...selected],
  ]);
  state.sliders = {};
  latentsDiv.replaceChildren(...latents.map((l) => latentRow(l, onSlide)));
  if (!latents.length) {
    latentsDiv.replaceChildren(
      el("span", { class: "muted" }, "no latent fires on those patches"));
  }
  await refreshModified({});
}

async function setExample(i) {
  state.i = ((i % state.meta.n_examples) + state.meta.n_examples) % state.meta.n_examples;
  state.sliders = {};
  document.getElementById("ex-input").value = state.i;
  const [img, preds] = await Promise.all([
    api("classification", "get-img", [state.i]),
    api("classification", "get-preds", [state.i]),
  ]);
  const grid = patchGrid(
    img.orig_url, state.meta.grid_h, state.meta.grid_w,
    (sel) => onPatches(sel).catch(showErr),
  );
  document.getElementById("input-grid").replaceChildren(grid);
  document.getElementById("target").textContent = `true class: ${img.target}`;
  document.getElementById("orig-preds").replaceChildren(
    probBars(preds.probs, preds.logits));
  document.getElementById("mod-preds").replaceChildren(
    probBars(preds.probs, preds.logits));
  document.getElementById("latents").replaceChildren(
    el("span", { class: "muted" }, "click patches on the input image"));
}

async function examineClass(cls) {
  state.seed += 1;
  const out = await api("classification", "get-random-class-img", [cls, state.seed]);
  await setExample(out.index);
}

async function main() {
  state.meta = await api("classification", "meta", []);
  const classBtns = state.meta.classes.map((c) =>
    el("button", { onclick: () => examineClass(c).catch(showErr) }, `class ${c}`));
  const controls = el(
    "div", {},
    el("label", {}, "example "),
    el("input", {
      id: "ex-input", type: "number", min: 0, max: state.meta.n_examples - 1,
      value: 0,
      onchange: (ev) => setExample(parseInt(ev.target.value, 10) || 0).catch(showErr),
    }),
    el("button", {
      onclick: () =>
        setExample(Math.floor(Math.random() * state.meta.n_examples)).catch(showErr),
    }, "random"),
    el("span", { class: "muted" }, " examine: "),
    ...classBtns,
    el("span", { class: "muted" },
      ` · ${state.meta.n_examples} examples · ${state.meta.d_sae} latents`),
  );
  app.replaceChildren(
    controls,
    el("div", { class: "row" },
      panel("Input (click patches)",
        el("div", { id: "input-grid" }),
        el("div", { id: "target", class: "muted" }, "")),
      panel("Predictions", el("div", { id: "orig-preds" })),
      panel("Modified predictions", el("div", { id: "mod-preds" })),
    ),
    panel("SAE latents", el("div", { id: "latents" })),
  );
  await setExample(0);
}

main().catch(showErr);

// Live semantic-segmentation probing app (reference src/web/src/Semseg.elm):
// example picker (SetExample/GetRandomExample), true seg + predicted seg,
// patch selection (ToggleSelectedPatch) -> SAE latents (GotSaeLatents) with
// top-example galleries + highlight toggles, sliders (SetSlider) -> modified
// predictions (GotModPreds). Backend: saev_tpu/web/backend.py SemsegApp.
import { api, baseCss, el, latentRow, patchGrid, sequenced } from "../lib.js";

const style = document.createElement("style");
style.textContent = baseCss;
document.head.append(style);

const state = { i: 0, meta: null, sliders: {}, selected: new Set() };
const app = document.getElementById("app");

function panel(title, ...children) {
  return el("div", { class: "panel" }, el("h2", {}, title), ...children);
}

// Sequenced: only the latest drag's response lands (out-of-order responses
// from concurrent POSTs must not leave a stale prediction on screen).
const fetchModified = sequenced((mods) =>
  api("semseg", "get-mod-preds", [state.i, mods]));

async function refreshModified(mods) {
  const out = await fetchModified(mods);
  if (out === null) return; // superseded by a newer drag
  document.getElementById("mod-seg").src = out.seg_url;
  document.getElementById("mod-classes").textContent =
    "classes: " + out.classes.join(", ");
}

function onSlide(latent, value) {
  // A touched slider stays in the intervention set even at 0: the backend
  // semantics are "set latent to value v", so v=0 is ablation, not reset.
  state.sliders[latent] = value;
  refreshModified(state.sliders).catch(showErr);
}

async function onPatches(selected) {
  state.selected = selected;
  const latentsDiv = document.getElementById("latents");
  latentsDiv.replaceChildren(el("span", { class: "muted" }, "fetching latents…"));
  const latents = await api("semseg", "get-sae-latents", [
    state.i, [...selected],
  ]);
  state.sliders = {};
  latentsDiv.replaceChildren(
    ...latents.map((l) => latentRow(l, onSlide)),
  );
  if (!latents.length) {
    latentsDiv.replaceChildren(
      el("span", { class: "muted" }, "no latent fires on those patches"));
  }
  await refreshModified({});
}

function showErr(err) {
  app.prepend(el("div", { class: "err" }, String(err)));
}

async function setExample(i) {
  state.i = ((i % state.meta.n_examples) + state.meta.n_examples) % state.meta.n_examples;
  state.sliders = {};
  document.getElementById("ex-input").value = state.i;
  const [img, preds] = await Promise.all([
    api("semseg", "get-img", [state.i]),
    api("semseg", "get-orig-preds", [state.i]),
  ]);
  const grid = patchGrid(
    img.orig_url, state.meta.grid_h, state.meta.grid_w,
    (sel) => onPatches(sel).catch(showErr),
  );
  document.getElementById("input-grid").replaceChildren(grid);
  document.getElementById("true-seg").src = img.seg_url;
  document.getElementById("true-classes").textContent =
    "classes: " + img.classes.join(", ");
  document.getElementById("pred-seg").src = preds.seg_url;
  document.getElementById("pred-classes").textContent =
    "classes: " + preds.classes.join(", ");
  document.getElementById("mod-seg").src = preds.seg_url;
  document.getElementById("mod-classes").textContent =
    "classes: " + preds.classes.join(", ");
  document.getElementById("latents").replaceChildren(
    el("span", { class: "muted" }, "click patches on the input image"));
}

async function main() {
  state.meta = await api("semseg", "meta", []);
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
    el("span", { class: "muted" },
      ` · ${state.meta.n_examples} examples · grid ` +
      `${state.meta.grid_h}×${state.meta.grid_w} · ${state.meta.d_sae} latents`),
  );
  const seg = (id, labelId) => el("div", {},
    el("img", { id, style: "width:256px;height:256px" }),
    el("div", { id: labelId, class: "muted" }, ""));
  app.replaceChildren(
    controls,
    el("div", { class: "row" },
      panel("Input (click patches)", el("div", { id: "input-grid" })),
      panel("True segmentation", seg("true-seg", "true-classes")),
      panel("Predicted", seg("pred-seg", "pred-classes")),
      panel("Modified", seg("mod-seg", "mod-classes")),
    ),
    panel("SAE latents", el("div", { id: "latents" })),
  );
  await setExample(0);
}

main().catch(showErr);

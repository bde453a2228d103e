// Live model-comparison app (reference src/web/src/Comparison.elm): one
// example through N models side by side, each with its top latents, client-
// rendered patch-activation heatmaps (plasma, like viz.add_highlights) and
// top-example galleries. Backend: saev_tpu/web/backend.py ComparisonApp.
import { api, baseCss, el } from "../lib.js";

const style = document.createElement("style");
style.textContent = baseCss;
document.head.append(style);

const state = { i: 0, meta: null };
const app = document.getElementById("app");

// Plasma 5-stop gradient (matches viz.py's matplotlib plasma).
const STOPS = [
  [13, 8, 135], [126, 3, 168], [204, 71, 120], [248, 149, 64], [240, 249, 33],
];
function plasma(t) {
  const x = Math.min(Math.max(t, 0), 1) * (STOPS.length - 1);
  const i = Math.min(Math.floor(x), STOPS.length - 2);
  const f = x - i;
  return STOPS[i].map((c, j) => Math.round(c + f * (STOPS[i + 1][j] - c)));
}

function showErr(err) {
  app.prepend(el("div", { class: "err" }, String(err)));
}

// Draw the input image with a per-patch activation overlay onto a canvas.
function heatmap(imgUrl, acts, gridH, gridW, displayPx = 224) {
  const canvas = el("canvas", { width: displayPx, height: displayPx });
  const ctx = canvas.getContext("2d");
  const img = new Image();
  img.onload = () => {
    ctx.drawImage(img, 0, 0, displayPx, displayPx);
    const upper = Math.max(...acts, 1e-9);
    const ph = displayPx / gridH, pw = displayPx / gridW;
    for (let p = 0; p < acts.length; p++) {
      const t = acts[p] / upper;
      if (t <= 0) continue;
      const [r, g, b] = plasma(t);
      ctx.fillStyle = `rgba(${r},${g},${b},${(0.8 * t).toFixed(3)})`;
      ctx.fillRect((p % gridW) * pw, Math.floor(p / gridW) * ph, pw, ph);
    }
  };
  img.src = imgUrl;
  return canvas;
}

async function setExample(i) {
  state.i = ((i % state.meta.n_examples) + state.meta.n_examples) % state.meta.n_examples;
  document.getElementById("ex-input").value = state.i;
  const models = document.getElementById("models");
  models.replaceChildren(el("span", { class: "muted" }, "fetching…"));
  const [img, out] = await Promise.all([
    api("comparison", "get-image", [state.i]),
    api("comparison", "get-sae-activations", [state.i, null]),
  ]);
  models.replaceChildren(
    ...out.map((model) =>
      el("div", { class: "panel" },
        el("h2", {}, `run ${model.model}`),
        ...model.latents.map((entry) =>
          el("div", { class: "latent-row" },
            el("div", { class: "latent-head" },
              el("b", {}, `latent #${entry.latent}`),
              el("span", { class: "muted" },
                ` max ${Math.max(...entry.activations).toFixed(3)}`)),
            el("div", { class: "row" },
              heatmap(img.orig_url, entry.activations, model.grid_h, model.grid_w),
              el("div", { class: "gallery" },
                ...entry.examples.map((ex) =>
                  el("img", {
                    src: ex.highlighted_url,
                    title: `example ${ex.example} · ${ex.value.toFixed(2)}`,
                    onclick: (ev) => {
                      ev.target.src = ev.target.src === ex.highlighted_url
                        ? ex.orig_url : ex.highlighted_url;
                    },
                  }))),
            ))),
      )),
  );
}

async function main() {
  state.meta = await api("comparison", "meta", []);
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
      ` · ${state.meta.n_examples} examples · ${state.meta.models.length} model(s)`),
  );
  app.replaceChildren(controls, el("div", { id: "models", class: "row" }));
  await setExample(0);
}

main().catch(showErr);

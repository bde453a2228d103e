// saev-tpu classification intervention demo — static equivalent of the
// reference's Elm+Gradio Classification app (reference
// src/web/src/Classification.elm: select patches -> see SAE latents -> move
// sliders -> compare original vs modified class predictions). Everything is
// precomputed or computed client-side from demo.json
// (scripts/export_demo.py classification): the linear head (W, b) and the SAE
// decoder rows of the exported latents make the intervention math
//   logits = W @ (x_pool + sum_i dv_i * (n_sel / n_patches) * W_dec[i]) + b
// a few dot products in JS. No backend required.

const state = {
  d: null,
  exampleIdx: 0,
  selected: new Set(),
  sliders: new Map(), // latent -> value
};

const STOPS = [
  [13, 8, 135], [126, 3, 168], [204, 71, 120], [248, 149, 64], [240, 249, 33],
];
function plasma(t) {
  const x = Math.min(Math.max(t, 0), 1) * (STOPS.length - 1);
  const i = Math.min(Math.floor(x), STOPS.length - 2);
  const f = x - i;
  return STOPS[i].map((c, j) => Math.round(c + f * (STOPS[i + 1][j] - c)));
}

function softmax(logits) {
  const m = Math.max(...logits);
  const e = logits.map((v) => Math.exp(v - m));
  const s = e.reduce((a, b) => a + b, 0);
  return e.map((v) => v / s);
}

function logits(xVec) {
  const { head_w, head_b } = state.d;
  return head_w.map((row, j) => {
    let acc = head_b[j];
    for (let k = 0; k < row.length; k++) acc += row[k] * xVec[k];
    return acc;
  });
}

// Latents ranked by mean activation over the selected patches.
function selectionLatents() {
  const d = state.d;
  const acts = d.activations; // {latent: [img][patch]}
  const out = [];
  for (const latent of d.latents) {
    const a = acts[String(latent)][state.exampleIdx];
    let sum = 0;
    for (const p of state.selected) sum += a[p];
    if (sum > 0) out.push([latent, sum / state.selected.size]);
  }
  out.sort((x, y) => y[1] - x[1]);
  return out.slice(0, 8);
}

function modifiedX() {
  const d = state.d;
  const x = d.x_pool[state.exampleIdx].slice();
  const frac = state.selected.size / (d.grid_h * d.grid_w);
  for (const [latent, value] of state.sliders) {
    const a = d.activations[String(latent)][state.exampleIdx];
    let orig = 0;
    for (const p of state.selected) orig += a[p];
    orig = state.selected.size ? orig / state.selected.size : 0;
    const dv = (value - orig) * frac;
    const row = d.w_dec[String(latent)];
    for (let k = 0; k < x.length; k++) x[k] += dv * row[k];
  }
  return x;
}

function renderCanvas() {
  const d = state.d;
  const canvas = document.getElementById("canvas");
  const w = d.grid_w * d.patch_size, h = d.grid_h * d.patch_size;
  const scale = Math.max(1, Math.floor(420 / Math.max(w, h)));
  canvas.width = w; canvas.height = h;
  canvas.style.width = `${w * scale}px`;
  canvas.style.height = `${h * scale}px`;
  const ctx = canvas.getContext("2d");
  const image = new Image();
  image.onload = () => {
    ctx.drawImage(image, 0, 0, w, h);
    // Heatmap of slider latents.
    const acts = new Float32Array(d.grid_h * d.grid_w);
    let upper = 1e-9;
    for (const [latent] of state.sliders) {
      const a = d.activations[String(latent)][state.exampleIdx];
      for (let p = 0; p < acts.length; p++) {
        acts[p] = Math.max(acts[p], a[p]);
        upper = Math.max(upper, a[p]);
      }
    }
    for (let p = 0; p < acts.length; p++) {
      const t = acts[p] / upper;
      if (t <= 0) continue;
      const [r, g, b] = plasma(t);
      ctx.fillStyle = `rgba(${r},${g},${b},${0.6 * t})`;
      ctx.fillRect((p % d.grid_w) * d.patch_size,
        Math.floor(p / d.grid_w) * d.patch_size, d.patch_size, d.patch_size);
    }
    // Selection outlines.
    ctx.strokeStyle = "#0a9396";
    ctx.lineWidth = 2;
    for (const p of state.selected) {
      ctx.strokeRect((p % d.grid_w) * d.patch_size + 1,
        Math.floor(p / d.grid_w) * d.patch_size + 1,
        d.patch_size - 2, d.patch_size - 2);
    }
  };
  image.src = d.images[state.exampleIdx];

  canvas.onclick = (ev) => {
    const rect = canvas.getBoundingClientRect();
    const px = Math.floor(((ev.clientX - rect.left) / rect.width) * d.grid_w);
    const py = Math.floor(((ev.clientY - rect.top) / rect.height) * d.grid_h);
    const p = py * d.grid_w + px;
    if (state.selected.has(p)) state.selected.delete(p);
    else state.selected.add(p);
    state.sliders.clear();
    render();
  };
}

function renderLatents() {
  const div = document.getElementById("latents");
  div.innerHTML = "";
  if (!state.selected.size) {
    div.innerHTML = '<p class="hint">Select patches first.</p>';
    return;
  }
  for (const [latent, mean] of selectionLatents()) {
    if (!state.sliders.has(latent)) state.sliders.set(latent, mean);
    const row = document.createElement("div");
    row.className = "latent";
    const label = document.createElement("label");
    const name = document.createElement("span");
    name.textContent = `#${latent}`;
    const slider = document.createElement("input");
    slider.type = "range";
    slider.min = "0";
    slider.max = String(Math.max(mean * 4, 1e-3));
    slider.step = String(Math.max(mean / 25, 1e-4));
    slider.value = String(state.sliders.get(latent));
    const val = document.createElement("span");
    val.textContent = Number(state.sliders.get(latent)).toFixed(3);
    slider.oninput = () => {
      state.sliders.set(latent, Number(slider.value));
      val.textContent = Number(slider.value).toFixed(3);
      renderBars();
      renderCanvas();
    };
    label.append(name, slider, val);
    row.appendChild(label);
    div.appendChild(row);
  }
}

function renderBars() {
  const d = state.d;
  const orig = softmax(logits(d.x_pool[state.exampleIdx]));
  const mod = softmax(logits(modifiedX()));
  const order = orig.map((p, j) => [Math.max(p, mod[j]), j])
    .sort((a, b) => b[0] - a[0]).slice(0, 8).map(([, j]) => j);
  const bars = document.getElementById("bars");
  bars.innerHTML = "";
  for (const j of order) {
    const row = document.createElement("div");
    row.className = "bar-row";
    const name = document.createElement("span");
    name.textContent = d.class_names[j];
    const o = document.createElement("div");
    o.className = "bar orig";
    o.style.width = `${(orig[j] * 100).toFixed(1)}%`;
    o.title = `original ${(orig[j] * 100).toFixed(1)}%`;
    const m = document.createElement("div");
    m.className = "bar mod";
    m.style.width = `${(mod[j] * 100).toFixed(1)}%`;
    m.title = `modified ${(mod[j] * 100).toFixed(1)}%`;
    row.append(name, o, m);
    bars.appendChild(row);
  }
}

function render() {
  renderCanvas();
  renderLatents();
  renderBars();
}

async function main() {
  const resp = await fetch("demo.json");
  state.d = await resp.json();
  const d = state.d;
  document.getElementById("meta").textContent =
    `${d.images.length} images · ${d.latents.length} latents · ` +
    `${d.class_names.length} classes · run ${d.run_id}`;
  const ex = document.getElementById("examples");
  d.images.forEach((_, i) => {
    const btn = document.createElement("button");
    btn.textContent = String(i);
    if (i === 0) btn.classList.add("active");
    btn.onclick = () => {
      state.exampleIdx = i;
      state.selected.clear();
      state.sliders.clear();
      ex.querySelectorAll("button").forEach((b) => b.classList.remove("active"));
      btn.classList.add("active");
      render();
    };
    ex.appendChild(btn);
  });
  document.getElementById("reset").onclick = () => {
    state.selected.clear();
    state.sliders.clear();
    render();
  };
  render();
}

main();

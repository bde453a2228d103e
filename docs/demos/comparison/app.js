// saev-tpu model comparison demo — static equivalent of the reference's
// Elm+Gradio Comparison app (reference src/web/src/Comparison.elm: run the
// same image through multiple frozen ViTs and compare which SAE latents fire
// where; focus/blur a latent to see its patch heatmap). Data is precomputed
// into demo.json by `scripts/export_demo.py comparison`, one block per
// (model, run) pair over a shared image set; each model keeps its own patch
// grid. No backend required.

const state = { d: null, exampleIdx: 0, focus: new Map(), pinned: new Map() };

const STOPS = [
  [13, 8, 135], [126, 3, 168], [204, 71, 120], [248, 149, 64], [240, 249, 33],
];
function plasma(t) {
  const x = Math.min(Math.max(t, 0), 1) * (STOPS.length - 1);
  const i = Math.min(Math.floor(x), STOPS.length - 2);
  const f = x - i;
  return STOPS[i].map((c, j) => Math.round(c + f * (STOPS[i + 1][j] - c)));
}

// Latents of model m ranked by total activation on the current image.
function topLatents(model) {
  const out = [];
  for (const latent of model.latents) {
    const a = model.activations[String(latent)][state.exampleIdx];
    const total = a.reduce((s, v) => s + v, 0);
    if (total > 0) out.push([latent, total]);
  }
  out.sort((x, y) => y[1] - x[1]);
  return out.slice(0, 12);
}

function drawModel(model, mi) {
  const canvas = document.getElementById(`canvas-${mi}`);
  const w = model.grid_w * model.patch_size, h = model.grid_h * model.patch_size;
  canvas.width = w; canvas.height = h;
  const ctx = canvas.getContext("2d");
  const image = new Image();
  image.onload = () => {
    ctx.drawImage(image, 0, 0, w, h);
    const latent = state.focus.get(mi) ?? state.pinned.get(mi);
    if (latent === undefined) return;
    const a = model.activations[String(latent)][state.exampleIdx];
    const upper = Math.max(1e-9, ...a);
    for (let p = 0; p < a.length; p++) {
      const t = a[p] / upper;
      if (t <= 0) continue;
      const [r, g, b] = plasma(t);
      ctx.fillStyle = `rgba(${r},${g},${b},${0.85 * t})`;
      ctx.fillRect((p % model.grid_w) * model.patch_size,
        Math.floor(p / model.grid_w) * model.patch_size,
        model.patch_size, model.patch_size);
    }
  };
  // Prefer the model's own resized image (resize semantics differ across
  // families, e.g. SigLIP squash vs shortest-edge crop); fall back to the
  // shared images for older demo.json bundles.
  const imgs = model.images ?? state.d.images;
  image.src = imgs[state.exampleIdx];
}

function renderColumns() {
  const d = state.d;
  const cols = document.getElementById("columns");
  cols.innerHTML = "";
  d.models.forEach((model, mi) => {
    const col = document.createElement("div");
    col.className = "model-col";
    const h2 = document.createElement("h2");
    h2.textContent = `${model.family}`;
    const sub = document.createElement("p");
    sub.className = "sub";
    sub.textContent = `${model.ckpt} · run ${model.run_id} · grid ` +
      `${model.grid_h}×${model.grid_w}`;
    const canvas = document.createElement("canvas");
    canvas.id = `canvas-${mi}`;
    col.append(h2, sub, canvas);
    for (const [latent, total] of topLatents(model)) {
      const row = document.createElement("div");
      row.className = "latent-row";
      if (state.pinned.get(mi) === latent) row.classList.add("focused");
      const name = document.createElement("span");
      name.textContent = `#${latent}`;
      const freq = document.createElement("span");
      freq.className = "freq";
      freq.textContent = total.toFixed(2);
      row.append(name, freq);
      row.onmouseenter = () => { state.focus.set(mi, latent); drawModel(model, mi); };
      row.onmouseleave = () => { state.focus.delete(mi); drawModel(model, mi); };
      row.onclick = () => {
        if (state.pinned.get(mi) === latent) state.pinned.delete(mi);
        else state.pinned.set(mi, latent);
        renderColumns();
      };
      col.appendChild(row);
    }
    cols.appendChild(col);
    drawModel(model, mi);
  });
}

async function main() {
  const resp = await fetch("demo.json");
  state.d = await resp.json();
  const d = state.d;
  document.getElementById("meta").textContent =
    `${d.images.length} images · ${d.models.length} models (` +
    d.models.map((m) => m.family).join(", ") + ")";
  const ex = document.getElementById("examples");
  d.images.forEach((_, i) => {
    const btn = document.createElement("button");
    btn.textContent = String(i);
    if (i === 0) btn.classList.add("active");
    btn.onclick = () => {
      state.exampleIdx = i;
      state.focus.clear();
      state.pinned.clear();
      ex.querySelectorAll("button").forEach((b) => b.classList.remove("active"));
      btn.classList.add("active");
      renderColumns();
    };
    ex.appendChild(btn);
  });
  renderColumns();
}

main();

// saev-tpu latent explorer — static equivalent of the reference's Elm+Gradio
// demos (reference src/web/src/Semseg.elm): loads a precomputed demo.json
// (scripts/export_demo.py) and overlays per-latent patch activations on each
// image as the user toggles latents. No backend required.

const state = { data: null, active: new Set(), scale: 8 };

// Plasma-ish 5-stop gradient (viz.py uses matplotlib plasma).
const STOPS = [
  [13, 8, 135], [126, 3, 168], [204, 71, 120], [248, 149, 64], [240, 249, 33],
];
function plasma(t) {
  const x = Math.min(Math.max(t, 0), 1) * (STOPS.length - 1);
  const i = Math.min(Math.floor(x), STOPS.length - 2);
  const f = x - i;
  return STOPS[i].map((c, j) => Math.round(c + f * (STOPS[i + 1][j] - c)));
}

async function main() {
  const resp = await fetch("demo.json");
  state.data = await resp.json();
  const d = state.data;
  document.getElementById("meta").textContent =
    `${d.images.length} images · ${d.latents.length} latents · run ${d.run_id}` +
    ` · grid ${d.grid_h}×${d.grid_w}, patch ${d.patch_size}px`;

  const latentsDiv = document.getElementById("latents");
  for (const latent of d.latents) {
    const btn = document.createElement("button");
    btn.textContent = `#${latent}`;
    btn.onclick = () => {
      if (state.active.has(latent)) state.active.delete(latent);
      else state.active.add(latent);
      btn.classList.toggle("active");
      render();
    };
    latentsDiv.appendChild(btn);
  }
  render();
}

function render() {
  const d = state.data;
  const grid = document.getElementById("grid");
  grid.innerHTML = "";
  d.images.forEach((img, n) => {
    const cell = document.createElement("div");
    cell.className = "cell";
    const canvas = document.createElement("canvas");
    const w = d.grid_w * d.patch_size, h = d.grid_h * d.patch_size;
    canvas.width = w; canvas.height = h;
    canvas.style.width = `${w * state.scale}px`;
    canvas.style.height = `${h * state.scale}px`;
    const ctx = canvas.getContext("2d");
    const image = new Image();
    image.onload = () => {
      ctx.drawImage(image, 0, 0, w, h);
      // Combine active latents by max activation per patch.
      const acts = new Float32Array(d.grid_h * d.grid_w);
      let upper = 1e-9;
      for (const latent of state.active) {
        const a = d.activations[String(latent)][n];
        for (let p = 0; p < acts.length; p++) {
          acts[p] = Math.max(acts[p], a[p]);
          upper = Math.max(upper, a[p]);
        }
      }
      if (state.active.size) {
        for (let p = 0; p < acts.length; p++) {
          const t = acts[p] / upper;
          if (t <= 0) continue;
          const [r, g, b] = plasma(t);
          ctx.fillStyle = `rgba(${r},${g},${b},${0.9 * t})`;
          const px = (p % d.grid_w) * d.patch_size;
          const py = Math.floor(p / d.grid_w) * d.patch_size;
          ctx.fillRect(px, py, d.patch_size, d.patch_size);
        }
      }
    };
    image.src = img;
    const idx = document.createElement("span");
    idx.className = "idx";
    idx.textContent = String(n);
    cell.appendChild(canvas);
    cell.appendChild(idx);
    grid.appendChild(cell);
  });
}

main();

"""Sweep-axis benchmark: the multi-SAE train step at n_sae ∈ {1, 2, 4, 8}.

The reference's signature feature is N SAEs amortizing one shared batch
(reference framework/train.py:339-343, a Python loop). Ours is a chunked
vmap over the stacked sweep axis (framework/train._sweep_map). This script:

1. compiles the full train step for each sweep size and VERIFIES the Pallas
   kernels lowered inside the sweep machinery (counts `tpu_custom_call` sites
   in the compiled HLO — the fused Matryoshka fwd/dgrad/wgrad + the two kth
   kernels must appear; a silent XLA fallback would show zero);
2. times the steps and reports ms/step, aggregate SAE-patches/s, and the
   per-SAE cost ratio vs the single-SAE step (target ≤ ~1.2×).

Writes docs/bench_sweep.json and prints a markdown table for
docs/performance.md. Run on the live TPU: python scripts/bench_sweep.py
"""

import json
import pathlib
import re
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench


def run(n_sae: int, sweep_vmap_width: int = 1) -> dict:
    import jax

    from saev_tpu.framework import train as train_mod

    sae_cfg, obj_cfg, ts, hp, xs, prefixes = bench.build_state(n_sae)
    step_fn = train_mod.make_train_step(
        sae_cfg, obj_cfg, n_steps=6000, optim="adam",
        sweep_vmap_width=sweep_vmap_width,
    )

    t0 = time.time()
    compiled = step_fn.lower(ts, xs[0], prefixes, hp).compile()
    compile_s = time.time() - t0
    hlo = compiled.as_text()
    n_mosaic = len(re.findall(r'custom_call_target="tpu_custom_call"', hlo))
    if jax.default_backend() == "tpu" and n_mosaic == 0:
        # The whole point of the verification is catching a silent XLA
        # fallback; a zero count on the TPU backend is a failure, not a row.
        raise AssertionError(
            f"n_sae={n_sae}: no tpu_custom_call sites in the compiled HLO — "
            "the Pallas kernels did not lower inside the sweep"
        )

    for _ in range(3):
        ts, stats = compiled(ts, xs[0], prefixes, hp)
    jax.block_until_ready(ts.params)
    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        ts, stats = compiled(ts, xs[i % len(xs)], prefixes, hp)
    jax.block_until_ready(ts.params)
    ms = (time.perf_counter() - t0) / n_iters * 1e3

    return {
        "n_sae": n_sae,
        "sweep_vmap_width": sweep_vmap_width,
        "ms_per_step": round(ms, 1),
        "sae_patches_per_s": round(bench.BATCH * n_sae / (ms / 1e3), 0),
        "mosaic_custom_calls": n_mosaic,
        "compile_s": round(compile_s, 1),
    }


def main():
    import jax

    assert jax.default_backend() == "tpu", "run on the live TPU"
    rows = []
    for n in (1, 2, 4, 8):
        row = run(n)
        base = rows[0]["ms_per_step"] if rows else row["ms_per_step"]
        row["per_sae_vs_single"] = round(row["ms_per_step"] / row["n_sae"] / base, 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = pathlib.Path(__file__).resolve().parent.parent / "docs" / "bench_sweep.json"
    out.write_text(json.dumps({"rows": rows}, indent=2))

    print("\n| n_sae | ms/step | SAE-patches/s | per-SAE vs single | Mosaic kernels |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_sae']} | {r['ms_per_step']} | {r['sae_patches_per_s']:.0f} "
            f"| {r['per_sae_vs_single']}x | {r['mosaic_custom_calls']} |"
        )


if __name__ == "__main__":
    main()

"""Round-5 production-step profiler: op-level device times of the EXACT step
bench.py times (subspace-AuxK rung, 5% dead, production shapes), via
jax.profiler traces (scripts/kprof.py — wall clocks on the dev tunnel lie).

Usage: python scripts/profile_step4.py [n_iters]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax

import kprof
from kprof import device_profile


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import bench
    from saev_tpu.framework import train as train_mod
    from saev_tpu.nn import objectives as obj_mod

    sae_cfg, obj_cfg, ts, hp, xs, prefixes = bench.build_state(1)
    cap = obj_mod.subspace_cap_ladder(bench.D_SAE, sae_cfg.activation.aux.k_aux)[0]
    step_fn = train_mod.make_train_step(
        sae_cfg, obj_cfg, n_steps=6000, optim="adam", aux_subspace_cap=cap,
    )

    state = {"ts": ts, "i": 0}

    def one(_c, *args):
        state["ts"], stats = step_fn(state["ts"], xs[state["i"] % len(xs)], prefixes, hp)
        state["i"] += 1
        return stats["loss"]

    rows = device_profile(one, (), n=n, warmup=3)
    total = sum(ms for name, ms, _ in rows if not name.startswith("jit_"))
    print(f"backend: {jax.default_backend()}  step total (non-jit rows): {total:.2f} ms")
    for name, ms, cnt in rows:
        if ms < 0.05:
            continue
        print(f"{ms:8.3f} ms x{cnt:2d}  {name[:100]}")
        if ms >= 0.5 and name in kprof.LONG_NAMES:
            print(f"              {kprof.LONG_NAMES[name][:240]}")


if __name__ == "__main__":
    main()

"""Profiler-based kernel microbench: the only trustworthy timing on the dev
tunnel (NOTES.md "Microbench traps": wall clocks lie nondeterministically —
identical dispatches memoize, block_until_ready acks early). This harness runs
a chained-dispatch loop under `jax.profiler.trace` and reports per-HLO DEVICE
times parsed from the trace (events carrying `device_duration_ps`).

Library usage:
    from scripts.kprof import device_profile
    rows = device_profile(fn, args, n=10)   # [(op_name, total_ms/n, calls), ...]

CLI: python scripts/kprof.py  — profiles the three Matryoshka grouped kernels
at block_rows in {256, 512, 1024} plus the kth kernel (control), answering the
round-3/4 open question: does the bm>=256 double-buffering cliff survive the
raised scoped-VMEM limit?
"""

import collections
import functools
import gzip
import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


LONG_NAMES: dict[str, str] = {}  # op name -> long_name from the last parse


def _parse_trace(tracedir: str) -> dict[str, tuple[float, int]]:
    """name -> (total device ms, event count) from the newest trace under
    tracedir. Side effect: LONG_NAMES maps op names to their HLO long_name."""
    runs = sorted(pathlib.Path(tracedir).glob("plugins/profile/*"))
    assert runs, f"no profile under {tracedir}"
    out: dict[str, list] = collections.defaultdict(lambda: [0.0, 0])
    for tj in sorted(runs[-1].glob("*.trace.json.gz")):
        with gzip.open(tj, "rt") as f:
            trace = json.load(f)
        for ev in trace.get("traceEvents", []):
            args = ev.get("args") or {}
            if "device_duration_ps" not in args:
                continue
            name = ev.get("name", "?")
            out[name][0] += float(args["device_duration_ps"]) / 1e9
            out[name][1] += 1
            ln = args.get("long_name")
            if ln:
                LONG_NAMES[name] = ln
    return {k: (v[0], v[1]) for k, v in out.items()}


def device_profile(fn, args, n: int = 10, warmup: int = 3):
    """Run `fn(carry, *args) -> new_carry` chained n times under the profiler;
    return [(op_name, device_ms_per_iter, calls_per_iter)] sorted by time.
    fn must thread the scalar carry into its computation (defeats dispatch
    memoization) and return a scalar-reducible output."""
    c = jnp.float32(0.0)
    for _ in range(warmup):
        c = fn(c, *args)
    jax.block_until_ready(c)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(n):
                c = fn(c, *args)
            jax.block_until_ready(c)
        rows = _parse_trace(td)
    out = [(k, ms / n, cnt // n if cnt >= n else cnt) for k, (ms, cnt) in rows.items()]
    out.sort(key=lambda r: -r[1])
    return out


def total_device_ms(rows, include=lambda name: True) -> float:
    return sum(ms for name, ms, _ in rows if include(name))


def main():
    from saev_tpu.ops import pallas_matryoshka as pk
    from saev_tpu.ops import pallas_topk

    B, S, D, G, J = 16384, 16384, 1024, 1024, 10
    rng = np.random.default_rng(0)
    f = rng.normal(size=(B, S)).astype(np.float32)
    f[f < 1.5] = 0.0
    f = jnp.asarray(f, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32) * 0.02, jnp.bfloat16)
    prefixes = np.sort(rng.choice(np.arange(1, S), size=J, replace=False))
    m = jnp.asarray(prefixes // G, jnp.int32)
    r = jnp.asarray(prefixes - (prefixes // G) * G, jnp.int32)
    da = jnp.asarray(rng.normal(size=(B, S // G, D)).astype(np.float32), jnp.bfloat16)
    e = jnp.asarray(rng.normal(size=(J, B, D)).astype(np.float32), jnp.bfloat16)
    scale = jnp.float32(0.37)
    xk = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))

    @jax.jit
    def kth_step(c, h):
        hp = h * (1 + 1e-12 * c)
        return pallas_topk.exact_kth_value_pallas(hp, 32).ravel()[0]

    rows = device_profile(kth_step, (xk,))
    kms = total_device_ms(rows, lambda nm: "custom" in nm or "fusion" in nm)
    print(f"control kth (expect ~6.4 ms): {kms:6.2f} ms device total")
    for name, ms, cnt in rows[:3]:
        print(f"    {ms:7.3f} ms x{cnt}  {name[:70]}")

    for bm in (256, 512, 1024):
        for name, fn, args in (
            ("base", pk.grouped_prefix_base, (f, w, m, r)),
            ("dgrad", pk.grouped_matmul_dgrad, (w, e, m, r, scale)),
            ("wgrad", pk.grouped_matmul_wgrad, (f, da, e, m, r, scale)),
        ):
            kw = {"block_rows": bm}

            @jax.jit
            def step(c, *a, _fn=fn, _kw=kw):
                a = (a[0] * (1 + jnp.asarray(1e-12 * c, a[0].dtype)),) + a[1:]
                out = _fn(*a, **_kw)
                first = jax.tree.leaves(out)[0]
                return first.reshape(-1)[0].astype(jnp.float32)

            try:
                rows = device_profile(step, args)
            except Exception as exc:
                print(f"{name:6s} bm={bm:5d}: FAIL {str(exc)[:90]}")
                continue
            ms = total_device_ms(
                rows, lambda nm: "custom" in nm or "tpu" in nm.lower()
            )
            top = rows[0]
            print(
                f"{name:6s} bm={bm:5d}: {ms:7.2f} ms kernel "
                f"(top: {top[1]:.2f} ms {top[0][:46]})"
            )


if __name__ == "__main__":
    main()

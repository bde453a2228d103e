"""Microbench: Matryoshka kernel row-tile size vs the scoped-VMEM limit.

Round 3 measured bm=512 as 2x WORSE than bm=256 on all three grouped
kernels and concluded the W-re-read-halving idea was dead — but the scoped
VMEM limit was left at Mosaic's 16 MB default the whole time (v5e has
128 MB physical VMEM). This times the three kernels at bm in {256, 512,
1024, 2048} with vmem_limit_bytes raised to 100 MB, checking numerics vs
the bm=256 production output. W re-read traffic in the base/dgrad kernels
scales as (B/bm) * W, so bm=1024 cuts ~1.6 GB (~2.3 ms) per kernel.

Usage: python scripts/proto_vmem_tiles.py
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, S, D, G, J = 16384, 16384, 1024, 1024, 10


def main():
    from saev_tpu.ops import pallas_matryoshka as pk

    rng = np.random.default_rng(0)
    # Sparse-ish f like a TopK code (mostly zeros), bf16.
    f = rng.normal(size=(B, S)).astype(np.float32)
    f[f < 1.5] = 0.0
    f = jnp.asarray(f, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32) * 0.02, jnp.bfloat16)
    prefixes = np.sort(rng.choice(np.arange(1, S), size=J, replace=False))
    m = jnp.asarray(prefixes // G, jnp.int32)
    r = jnp.asarray(prefixes - (prefixes // G) * G, jnp.int32)
    # Batch-major (B, G, D) — the post-c76251a kernel layout.
    da = jnp.asarray(rng.normal(size=(B, S // G, D)).astype(np.float32), jnp.bfloat16)
    e = jnp.asarray(rng.normal(size=(J, B, D)).astype(np.float32), jnp.bfloat16)
    scale = jnp.float32(0.37)

    def timed(fn, *args, n=30, perturb=0, **kw):
        """Salted re-dispatch harness. The axon terminal memoizes EXECUTE
        calls by (program, input buffers) fingerprint — across processes —
        so any repeated identical dispatch times as ~0.02 ms. Feeding a
        fresh host scalar into every call (used only in a one-element side
        output, so the kernel itself is untouched) defeats the cache while
        adding nothing measurable to the program."""
        del perturb

        @jax.jit
        def salted(s, *a):
            out = fn(*a, **kw)
            first = jax.tree.leaves(out)[0]
            return out, first.reshape(-1)[0].astype(jnp.float32) + s

        rs = np.random.default_rng(time.time_ns() % (1 << 32))
        out = salted(jnp.float32(rs.normal()), *args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = salted(jnp.float32(rs.normal()), *args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3, out[0]

    ms0, _ = timed(lambda a, *rest: a * jnp.bfloat16(1.0), f, w, perturb=0)
    print(f"null chain (perturb f + copy): {ms0:7.2f} ms", flush=True)

    # Harness control: the production kth kernel measures 7.9 ms under the
    # plain re-dispatch loop (scripts/proto_kth_ops.py). If the chained
    # harness disagrees wildly, distrust everything below.
    from saev_tpu.ops import pallas_topk

    xk = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, S)).astype(np.float32)
    )
    msk, _ = timed(
        lambda a: pallas_topk.exact_kth_value_pallas(a, 32), xk, perturb=0
    )
    print(f"control: kth kernel (expect ~8 ms): {msk:7.2f} ms", flush=True)

    ref = {}
    for bm in (256, 512, 1024):
        for name, fn, args, pi in (
            ("base", pk.grouped_prefix_base, (f, w, m, r), 0),
            ("dgrad", pk.grouped_matmul_dgrad, (w, e, m, r, scale), 0),
            ("wgrad", pk.grouped_matmul_wgrad, (f, da, e, m, r, scale), 0),
        ):
            try:
                ms, out = timed(fn, *args, perturb=pi, block_rows=bm)
            except Exception as exc:
                import re

                mm = re.search(r"(Mosaic failed[^\"]*|Ran out of memory[^.]*)", str(exc))
                msg = mm.group(0)[:80] if mm else str(exc)[:80]
                print(f"{name:6s} bm={bm:5d}: FAIL {msg}")
                continue
            if bm == 256:
                ref[name] = out
                tag = "(ref)"
            else:
                # Diff on device; only scalars cross the tunnel.
                diffs = jax.jit(
                    lambda a, b: [
                        (
                            jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))),
                            jnp.max(jnp.abs(y.astype(jnp.float32))),
                        )
                        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
                    ]
                )(out, ref[name])
                d = max(float(x) for x, _ in diffs)
                scale_ = max(float(y) for _, y in diffs)
                tag = f"maxdiff {d:.3e} (rel {d / (scale_ + 1e-9):.1e})"
            print(f"{name:6s} bm={bm:5d}: {ms:7.2f} ms  {tag}")


if __name__ == "__main__":
    main()

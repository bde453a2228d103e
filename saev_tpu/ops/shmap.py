"""Trace-time SPMD context for the Pallas dispatch layer.

GSPMD has no partitioning rule for `tpu_custom_call`: a Pallas kernel inside
a jit whose operands are batch-sharded over a device mesh is either
replicated (every chip redundantly computes the global batch, defeating data
parallelism and blowing HBM) or rejected outright. The fix is manual SPMD —
`jax.shard_map` regions around each kernel call, inside which the kernel sees
only its shard's rows and XLA collectives handle the few cross-shard
reductions (the scaling-book recipe: pick a mesh, make the sharding explicit
where the compiler can't infer it).

This module carries the *declaration* from the training loop (which knows the
mesh and how batches are sharded) down to the kernel dispatch sites in
`ops/topk.py` and `ops/matryoshka.py`, which are reached through `vmap`/
`custom_vjp` layers that a mesh argument would otherwise have to thread
through every signature. The context is read at TRACE time (the sites run
inside `jax.jit`), so the wrapper pattern mirrors `topk.FORCE_LAX`: activate
around the jitted call, not per-op.

All wrapped kernels are row-parallel over the batch dimension (kth bisection,
TopK stats epilogue, grouped prefix decode, dgrad); the single cross-shard
reduction is the weight gradient (`grouped_matmul_wgrad`), psum'd over the
batch axes inside its region. The feature (d_sae) axis is NOT handled here —
an exact k-th over a latent-sharded row needs a distributed combine the
bisection kernel cannot express (see docs/performance.md); feature-parallel
steps keep the pure-XLA trace.
"""

import contextlib
import threading

import jax
from jax.sharding import Mesh, PartitionSpec

_tls = threading.local()

INTERPRET = False
"""Test hook: force the Pallas dispatch paths on non-TPU backends with
interpret-mode kernels, so shard_map wiring is exercised on a CPU mesh."""


def current() -> "tuple[Mesh, tuple[str, ...]] | None":
    """The active (mesh, batch_axes) declaration, or None."""
    return getattr(_tls, "ctx", None)


@contextlib.contextmanager
def batch_sharded(mesh: Mesh, axes: tuple[str, ...] = ("data",)):
    """Declare, for code traced within, that kernel batch dimensions are
    sharded over `axes` of `mesh`. No-op declaration when the axes' total
    extent is 1 (dispatch sites skip the shard_map)."""
    prev = getattr(_tls, "ctx", None)
    _tls.ctx = (mesh, tuple(axes))
    try:
        yield
    finally:
        _tls.ctx = prev


def n_shards() -> int:
    ctx = current()
    if ctx is None:
        return 1
    mesh, axes = ctx
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return n


def batch_spec(ndim: int, batch_dim: int = 0) -> PartitionSpec:
    """PartitionSpec sharding `batch_dim` over the declared axes."""
    _, axes = current()
    spec = [None] * ndim
    spec[batch_dim] = axes if len(axes) > 1 else axes[0]
    return PartitionSpec(*spec)


def replicated(ndim: int) -> PartitionSpec:
    return PartitionSpec(*([None] * ndim))


def shard_rows(fn, in_batch_dims, out_batch_dims, *, psum_outs=()):
    """shard_map `fn` over the declared batch axes.

    `in_batch_dims` / `out_batch_dims`: per-argument batch-dimension index,
    or None for a replicated operand/output. Outputs listed in `psum_outs`
    (by position) are partial sums — they are psum'd over the batch axes
    inside the region and emitted replicated. Returns `fn` unchanged when no
    context is active or the axes' extent is 1.
    """
    ctx = current()
    if ctx is None or n_shards() == 1:
        return fn
    mesh, axes = ctx
    axis_names = axes if len(axes) > 1 else axes[0]

    def wrapped(*args):
        in_specs = tuple(
            batch_spec(a.ndim, d) if d is not None else replicated(a.ndim)
            for a, d in zip(args, in_batch_dims)
        )

        def _is_multi(outs):
            # One predicate for both normalizations: a list return (e.g. raw
            # pallas_call with a list out_shape) must be multi-output in BOTH
            # local() and out_specs_of(), or shard_map's out_specs pytree
            # mismatches (and psum_outs would hit the wrong element).
            return isinstance(outs, (tuple, list))

        def local(*largs):
            outs = fn(*largs)
            single = not _is_multi(outs)
            outs = (outs,) if single else tuple(outs)
            outs = tuple(
                jax.lax.psum(o, axis_names) if i in psum_outs else o
                for i, o in enumerate(outs)
            )
            return outs[0] if single else outs

        def out_specs_of(outs):
            single = not _is_multi(outs)
            outs = (outs,) if single else tuple(outs)
            specs = tuple(
                batch_spec(o.ndim, d) if d is not None else replicated(o.ndim)
                for o, d in zip(outs, out_batch_dims)
            )
            return specs[0] if single else specs

        # Shape-only trace to build out_specs (cheap: abstract eval).
        abstract = jax.eval_shape(fn, *args)
        return jax.shard_map(
            local, mesh=mesh, in_specs=in_specs,
            out_specs=out_specs_of(abstract), check_vma=False,
        )(*args)

    return wrapped

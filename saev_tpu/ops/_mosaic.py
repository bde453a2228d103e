"""Shared Mosaic compilation knobs for the Pallas kernels in this package."""

# Mosaic's default scoped-VMEM limit is 16 MB; v5e has 128 MB physical VMEM.
# Row tiles beyond the sizes tuned under the default limit (512-row kth
# tiles, >=512-row grouped-matmul tiles) need the limit raised; 100 MB
# leaves headroom for the compiler's own scoped use while never rejecting
# our largest tile. One constant so a retune (e.g. for a TPU generation
# with different VMEM) applies to every kernel family at once.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def vmem_params(tile_rows: int, threshold: int, interpret: bool = False):
    """CompilerParams raising the scoped-VMEM limit when `tile_rows` exceeds
    `threshold` (the largest tile the 16 MB default accommodates for that
    kernel family); None otherwise (and always under the interpreter)."""
    if interpret or tile_rows <= threshold:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)

"""Interactive exploration tools (L7).

The reference ships marimo notebooks (reference src/saev/interactive/
{features,metrics,shards}.py); marimo is not available in this image, so these
modules generate equivalent static HTML/PNG reports from the same artifacts and
are importable as plain libraries for notebook use.
"""

"""Runtime shape/type guards at public API boundaries.

The reference decorates nearly every function with beartype + jaxtyping
(`Float[Tensor, "batch d_model"]`; reference src/saev/nn/modeling.py:15,23,
src/saev/data/shuffled.py:23) so malformed shapes fail with a named error
instead of a cryptic framework error. beartype is not installable here, so
this module provides the equivalent two-layer guard:

- `check(...)`: explicit named shape assertions used at the hot public
  entry points (`nn.modeling.encode/decode`, loader construction, train
  config↔shards consistency). These run at *trace time* under jit — zero
  runtime cost on TPU — and raise `GuardError` with the offending dimension
  named.
- `typed`: a decorator applying jaxtyping annotations via typeguard when
  both are importable (jaxtyping ships in this image; typeguard usually
  does), else a no-op. Disable globally with SAEV_NO_TYPECHECK=1.
"""

import functools
import os


class GuardError(ValueError):
    """A public-API argument had the wrong shape/dtype; message names the
    argument and the expected vs actual dimension."""


def check(name: str, x, *, ndim: int | None = None, last_dim: int | None = None,
          axis0: int | None = None, what: str = "") -> None:
    """Assert basic shape facts about an array-like, raising GuardError.

    Works on numpy arrays, jax arrays, and jit tracers (shape is static).
    """
    shape = getattr(x, "shape", None)
    if shape is None:
        raise GuardError(f"{name}: expected an array, got {type(x).__name__}")
    if ndim is not None and len(shape) != ndim:
        raise GuardError(
            f"{name}: expected {ndim} dimensions{_ctx(what)}, got shape {tuple(shape)}"
        )
    if last_dim is not None and (len(shape) == 0 or shape[-1] != last_dim):
        raise GuardError(
            f"{name}: expected trailing dimension {last_dim}{_ctx(what)}, "
            f"got shape {tuple(shape)}"
        )
    if axis0 is not None and (len(shape) == 0 or shape[0] != axis0):
        raise GuardError(
            f"{name}: expected leading dimension {axis0}{_ctx(what)}, "
            f"got shape {tuple(shape)}"
        )


def _ctx(what: str) -> str:
    return f" ({what})" if what else ""


def positive(name: str, value, *, what: str = "") -> None:
    """Assert a config scalar is a positive integer, raising GuardError."""
    if not isinstance(value, int) or isinstance(value, bool) or value < 1:
        raise GuardError(
            f"{name}: expected a positive integer{_ctx(what)}, got {value!r}"
        )


def fraction(name: str, value, *, what: str = "") -> None:
    """Assert a config scalar lies in [0, 1], raising GuardError."""
    if isinstance(value, bool):
        # float(True) == 1.0 would pass the range check; match positive().
        ok = False
    else:
        try:
            ok = 0.0 <= float(value) <= 1.0
        except (TypeError, ValueError):
            ok = False
    if not ok:
        raise GuardError(f"{name}: expected a value in [0, 1]{_ctx(what)}, got {value!r}")


def _make_typed():
    if os.environ.get("SAEV_NO_TYPECHECK") == "1":
        return lambda fn: fn
    try:
        import jaxtyping
        import typeguard
    except ImportError:
        return lambda fn: fn

    # typeguard 2.x raises plain TypeError, which jaxtyping re-wraps into its
    # own TypeCheckError; typeguard >= 4 has a TypeCheckError of its own.
    check_errors = (jaxtyping.TypeCheckError,) + (
        (typeguard.TypeCheckError,) if hasattr(typeguard, "TypeCheckError") else ()
    )

    def typed(fn):
        checked = jaxtyping.jaxtyped(typechecker=typeguard.typechecked)(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return checked(*args, **kwargs)
            except check_errors as err:
                raise GuardError(f"{fn.__qualname__}: {err}") from err

        return wrapper

    return typed


typed = _make_typed()

"""Test-only stand-in for `tyro` (CLI library) so the read-only reference
package imports for parity tests. Only `tyro.conf.Suppress[T]` is used by the
reference's nn module (as a type annotation), which must simply subscript."""

from . import conf  # noqa: F401

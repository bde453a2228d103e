"""Test-only stand-in for `beartype` so the READ-ONLY reference package at
/root/reference can be imported for live parity tests (tests/test_reference_parity.py).

The real beartype is a runtime type checker; parity tests don't need the
checking, only importability, so the decorator is the identity.
"""


def beartype(obj=None, **kwargs):
    if obj is None:
        return lambda o: o
    return obj
